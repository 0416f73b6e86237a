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
