"""Visualization export + CLIP tokenizer tests (CPU-only paths)."""

import numpy as np
import pytest

from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer, bytes_to_unicode
from livelyspeaker_tpu.utils.visualize import export_beat_bvh, render_ted_clip
from tests.test_beat_pipeline import SIMPLE_BVH


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    out = tok(['A person is talking: "hello world"', "short"])
    assert out.shape == (2, 77)
    assert out[0, 0] == 49406  # SOT
    assert 49407 in out[0]  # EOT present
    # deterministic
    np.testing.assert_array_equal(out, tok(['A person is talking: "hello world"', "short"]))


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_render_ted_clip_gif(tmp_path, rng_np):
    motion = rng_np.normal(size=(8, 27)).astype(np.float32) * 0.1
    out = render_ted_clip(motion, str(tmp_path / "clip.mp4"), title="test")
    # no ffmpeg in this environment -> falls back to GIF
    assert out.endswith(".gif") or out.endswith(".mp4")
    import os

    assert os.path.getsize(out) > 1000


def test_export_beat_bvh(tmp_path, rng_np):
    tpl = tmp_path / "template.bvh"
    tpl.write_text(SIMPLE_BVH)
    euler = rng_np.uniform(-30, 30, size=(5, 6)).astype(np.float32)
    out = export_beat_bvh(
        euler, str(tpl), str(tmp_path / "out.bvh"), joints=["Spine", "Neck"]
    )
    from livelyspeaker_tpu.data.bvh import parse_bvh

    b = parse_bvh(out)
    assert b.frames.shape == (5, 12)
    np.testing.assert_allclose(
        b.joint_channels("Spine")[:, :3], euler[:, :3], atol=1e-4
    )
    assert b.fps == pytest.approx(15.0, rel=1e-5)


def test_clip_bpe_tokenizer_with_synthetic_merges(tmp_path):
    """Exercise the full BPE path (merge ranking, byte encoding, sot/eot
    framing, truncation) with a small synthetic merges file."""
    from livelyspeaker_tpu.data.clip_tokenizer import CLIPTokenizer

    merges = "\n".join(
        ["#version: 0.2",
         "h e", "l l", "he ll", "hell o</w>", "w o", "r l",
         "wo rl", "worl d</w>"]
    )
    p = tmp_path / "mini_bpe.txt"
    p.write_text(merges + "\n")
    tok = CLIPTokenizer(str(p))

    ids = tok(["hello world", "HELLO   world!"])
    assert ids.shape == (2, 77) and ids.dtype == np.int32
    # sot first, eot present, zero padding after
    assert ids[0, 0] == tok.sot
    eot_pos = int(np.where(ids[0] == tok.eot)[0][0])
    assert (ids[0, eot_pos + 1:] == 0).all()
    # 'hello' merges all the way to one token; spelled-out chars would be 5
    hello_ids = tok.encode("hello")
    assert len(hello_ids) == 1
    assert tok.decoder[hello_ids[0]] == "hello</w>"
    # case/whitespace normalisation: both rows share the same leading tokens
    assert list(ids[0][:3]) == list(ids[1][:3])
    # truncation: very long input ends with eot at the last slot
    long_ids = tok(["hello " * 200])
    assert long_ids[0, -1] == tok.eot
