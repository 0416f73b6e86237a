"""Tests for the long-tail components: calc_bpd_loop, EMA, YAML config,
BVH FK, AverageMeter, motion augmentation utils."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.diffusion import (
    DiffusionSchedule,
    calc_bpd_loop,
    ema_update,
)
from livelyspeaker_tpu.data.bvh import bvh_world_positions, parse_bvh
from livelyspeaker_tpu.data.ted import motion_fft_lowpass, motion_random_resample
from livelyspeaker_tpu.utils import AverageMeter
from livelyspeaker_tpu.utils.config import train_args
from tests.test_beat_pipeline import SIMPLE_BVH


def test_calc_bpd_loop_perfect_model():
    sched = DiffusionSchedule.create(steps=10)
    x0 = jnp.full((2, 3, 2, 4), 0.1)

    def denoise_fn(x_t, t, rng):
        return jnp.broadcast_to(x0, x_t.shape)

    out = calc_bpd_loop(denoise_fn, sched, x0, jax.random.PRNGKey(0))
    assert out["total_bpd"].shape == (2,)
    assert out["vb"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    # perfect x0 prediction -> zero pred MSE at every step
    np.testing.assert_allclose(np.asarray(out["mse"]), 0.0, atol=1e-6)


def test_ema_update():
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_yaml_config_layer(tmp_path):
    cfg = tmp_path / "exp.yaml"
    cfg.write_text("latent_dim: 128\nlayers: 3\nnot_a_flag: 7\n")
    args = train_args(["-c", str(cfg), "--layers", "5"])
    assert args.latent_dim == 128  # from yaml
    assert args.layers == 5  # CLI overrides yaml
    assert not hasattr(args, "not_a_flag")


def test_bvh_world_positions():
    b = parse_bvh(SIMPLE_BVH)
    pos = bvh_world_positions(b)
    # 4 frames, 4 joints (Hips, Spine, Neck, EndSite)
    assert pos.shape == (4, 4, 3)
    # root at origin (zero position channels)
    np.testing.assert_allclose(pos[:, 0], 0.0, atol=1e-9)
    # bone lengths preserved under rotation: |Neck - Spine| == 12
    d = np.linalg.norm(pos[:, 2] - pos[:, 1], axis=-1)
    np.testing.assert_allclose(d, 12.0, rtol=1e-6)


def test_average_meter():
    m = AverageMeter("x")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0


def test_motion_fft_lowpass(rng_np):
    x = rng_np.normal(size=(34, 27)).astype(np.float32)
    y = motion_fft_lowpass(x, keep=2)
    assert y.shape == x.shape
    # result has only DC + 1 frequency -> second difference of a sinusoid
    # has much lower energy than the original noise
    assert np.var(np.diff(y, axis=0)) < np.var(np.diff(x, axis=0))


def test_motion_random_resample(rng_np):
    x = rng_np.normal(size=(34, 27)).astype(np.float32)
    y = motion_random_resample(x, np.random.default_rng(0))
    assert y.shape == x.shape
    assert not np.allclose(y, x)


def test_gesture_autoencoder_shapes(rng_np):
    import jax

    from livelyspeaker_tpu.models.embedding_net import GestureAutoencoder

    model = GestureAutoencoder(pose_dim=27, n_frames=34, base=32)
    poses = jnp.asarray(rng_np.normal(size=(3, 34, 27)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), poses, train=True)
    (feat, recon), updates = model.apply(
        variables, poses, train=True, mutable=["batch_stats"]
    )
    assert feat.shape == (3, 32)
    assert recon.shape == (3, 34, 27)
    # eval mode with running stats
    feat2 = model.apply(
        {"params": variables["params"],
         "batch_stats": updates["batch_stats"]},
        poses,
        method=model.embed,
    )
    assert feat2.shape == (3, 32)


def test_pose_decoder_variants(rng_np):
    import jax

    from livelyspeaker_tpu.models.embedding_net import (
        PoseDecoderFC,
        PoseDecoderGRU,
    )

    latent = jnp.asarray(rng_np.normal(size=(2, 32)).astype(np.float32))
    pre = jnp.asarray(rng_np.normal(size=(2, 4, 27)).astype(np.float32))

    fc = PoseDecoderFC(use_pre_poses=True)
    vs = fc.init(jax.random.PRNGKey(0), latent, pre, train=True)
    (out), _ = fc.apply(vs, latent, pre, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 34, 27)

    gru = PoseDecoderGRU()
    vs = gru.init(jax.random.PRNGKey(1), latent, pre, train=True)
    out, _ = gru.apply(vs, latent, pre, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 34, 27)
    assert np.isfinite(np.asarray(out)).all()


def test_loader_propagates_producer_errors():
    from livelyspeaker_tpu.data import DataLoader

    class BadDataset:
        def __len__(self):
            return 8

        def batch(self, idx):
            raise RuntimeError("boom in producer")

    dl = DataLoader(BadDataset(), batch_size=2, shuffle=False)
    with pytest.raises(RuntimeError, match="boom in producer"):
        list(dl)


def test_step_timer_counters():
    import time as _time

    from livelyspeaker_tpu.utils.profiling import StepTimer

    t = StepTimer(batch_size=10, warmup_steps=1)
    t.tick()
    _time.sleep(0.01)
    out = t.tick()
    assert out["clips_per_sec"] > 0
    _time.sleep(0.01)
    out = t.tick()
    assert "avg_clips_per_sec" in out and out["avg_clips_per_sec"] > 0


def test_melspectrogram_tone_peak():
    """A pure tone concentrates energy in the mel band containing its
    frequency (librosa-replacement sanity, eval/audio.py)."""
    import numpy as np

    from livelyspeaker_tpu.eval.audio import mel_filterbank, melspectrogram

    sr, f0 = 16000, 1000.0
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    m = melspectrogram(tone, sr=sr, n_mels=64)
    assert m.shape[0] == 64 and m.shape[1] > 0
    band = int(np.argmax(m.mean(axis=1)))
    # locate the filterbank's peak response for 1 kHz
    fb = mel_filterbank(sr, 2048, 64)
    freqs = np.fft.rfftfreq(2048, 1.0 / sr)
    expected = int(np.argmax(fb[:, np.argmin(np.abs(freqs - f0))]))
    assert abs(band - expected) <= 1


def test_apply_saved_args_restores_model_groups(tmp_path):
    """Generate-time args come from the checkpoint's args.json for the
    dataset/model/diffusion groups, but not for sampling knobs
    (parser_util.py:7-39 semantics)."""
    import argparse

    from livelyspeaker_tpu.training.checkpoints import save_args
    from livelyspeaker_tpu.utils.config import add_all_groups, apply_saved_args

    save_dir = str(tmp_path)
    save_args(save_dir, {"latent_dim": 128, "layers": 3, "n_poses": 34,
                         "diffusion_steps": 500, "guidance_param": 9.9})
    p = argparse.ArgumentParser()
    add_all_groups(p, training=False)
    args = p.parse_args(["--model_path", save_dir + "/model.npz",
                         "--guidance_param", "2.0"])
    args = apply_saved_args(args, p)
    assert args.latent_dim == 128 and args.layers == 3
    assert args.diffusion_steps == 500
    # sampling group is NOT restored: CLI wins
    assert args.guidance_param == 2.0


def test_tensorboard_platform_writes_events(tmp_path):
    from livelyspeaker_tpu.training.logging import TensorboardPlatform

    tb = TensorboardPlatform(str(tmp_path))
    tb.report_scalar("loss", 1.0, iteration=1, group_name="Loss")
    tb.close()
    import glob

    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))


def test_clearml_platform_needs_optional_dep(tmp_path):
    import pytest as _pytest

    from livelyspeaker_tpu.training.logging import ClearmlPlatform

    try:
        import clearml  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError):
            ClearmlPlatform(str(tmp_path))


def test_fasttext_vec_export_roundtrip(tmp_path):
    """export_fasttext_npz .vec path -> Vocab.load_word_vectors_npz
    (the offline replacement for vocab.py:70-84's live fastText load)."""
    import subprocess
    import sys

    from livelyspeaker_tpu.data.vocab import Vocab

    dim = 4
    vecs = {"hello": [0.1, 0.2, 0.3, 0.4], "world": [1.0, -1.0, 0.5, 0.0]}
    vec_path = tmp_path / "toy.vec"
    with open(vec_path, "w") as f:
        f.write(f"{len(vecs)} {dim}\n")
        for w, v in vecs.items():
            f.write(w + " " + " ".join(str(x) for x in v) + "\n")
    out = tmp_path / "toy.npz"
    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "export_fasttext_npz.py"
    )
    subprocess.run(
        [sys.executable, script, str(vec_path), str(out), "--dim", str(dim)],
        check=True,
    )

    vocab = Vocab("toy")
    for w in ["hello", "world", "unseen"]:
        vocab.index_word(w)
    vocab.load_word_vectors_npz(str(out), dim)
    np.testing.assert_allclose(
        vocab.word_embedding_weights[vocab.word2index["hello"]],
        np.asarray(vecs["hello"], np.float32),
    )
    np.testing.assert_allclose(
        vocab.word_embedding_weights[vocab.word2index["world"]],
        np.asarray(vecs["world"], np.float32),
    )
    # OOV word keeps the seeded random init (reference behaviour for words
    # absent from the model)
    assert vocab.word_embedding_weights[vocab.word2index["unseen"]].shape == (
        dim,
    )
