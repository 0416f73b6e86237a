"""Evaluator tests: Fréchet math, FGD embedding parity with the torch
reference net, beat-align mechanics, SRGR/L1div, audio DSP sanity."""

import sys

import numpy as np
import jax
import pytest

from livelyspeaker_tpu.eval import (
    EmbeddingSpaceEvaluator,
    SRGR,
    L1Div,
    calculate_frechet_distance,
    frechet_from_samples,
    motion_beat_times_ted,
    ted_beat_align_batch,
)
from livelyspeaker_tpu.eval.audio import (
    mel_filterbank,
    onset_detect,
    onset_strength,
    stft_mag,
)
from livelyspeaker_tpu.models.embedding_net import (
    TedEmbeddingEncoder,
    ted_embedding_params_from_torch,
)
from conftest import REFERENCE_ROOT, requires_reference


def test_frechet_identical_is_zero(rng_np):
    x = rng_np.normal(size=(500, 8))
    assert frechet_from_samples(x, x.copy()) == pytest.approx(0.0, abs=1e-6)


def test_frechet_shifted_mean(rng_np):
    x = rng_np.normal(size=(20000, 4))
    y = x + 2.0
    # FD = ||mu1-mu2||^2 = 4 * 4dims = 16 for identical covariance
    assert frechet_from_samples(x, y) == pytest.approx(16.0, rel=0.05)


def test_frechet_failure_sentinel(rng_np):
    """Numerical failure (NaN features, degenerate covariance) returns the
    reference's 1e10 sentinel instead of raising (ted_evaluator.py:69-73)."""
    from livelyspeaker_tpu.eval.fgd import frechet_from_samples

    a = rng_np.normal(size=(10, 4)).astype(np.float32)
    assert frechet_from_samples(a, np.full((10, 4), np.nan, np.float32)) == 1e10
    assert frechet_from_samples(a, a[:1]) == 1e10


def test_srgr_perfect_match():
    m = SRGR(threshold=0.3, joints=47)
    x = np.zeros((2, 34, 141))
    sem = np.ones((2, 34))
    rate = m.run(x, x, sem)
    assert rate == pytest.approx(1 / 0.165, rel=1e-6)


def test_l1div_zero_for_constant():
    d = L1Div()
    d.run(np.ones((10, 5)))
    assert d.avg() == 0.0


def test_stft_shapes(rng_np):
    y = rng_np.normal(size=16000).astype(np.float32)
    s = stft_mag(y)
    assert s.shape[0] == 1025
    mel = mel_filterbank(16000, 2048, 128)
    assert mel.shape == (128, 1025)
    env = onset_strength(y)
    assert env.ndim == 1 and len(env) == s.shape[1]


def test_onset_detect_finds_clicks():
    sr = 16000
    y = np.zeros(sr * 2, np.float32)
    true_times = [0.25, 0.75, 1.25, 1.75]
    for t in true_times:
        i = int(t * sr)
        y[i : i + 400] += np.random.default_rng(0).normal(size=400) * 0.5
    times = onset_detect(y, sr=sr, units="time")
    assert len(times) >= 4
    for t in true_times:
        assert np.min(np.abs(times - t)) < 0.08
    # silence produces no onsets
    assert len(onset_detect(np.zeros(sr, np.float32), sr=sr)) == 0


def test_motion_beat_times():
    # Construct a motion whose angle-velocity has a clear dip
    rng = np.random.default_rng(0)
    motions = rng.normal(size=(2, 34, 27)).astype(np.float32) * 0.3
    beats = motion_beat_times_ted(motions)
    assert len(beats) == 2
    for b in beats:
        assert all(2 / 15 <= t <= 33 / 15 for t in b)


def test_ted_beat_align_batch_runs(rng_np):
    motions = rng_np.normal(size=(2, 34, 27)).astype(np.float32) * 0.3
    sr = 16000
    audio = np.zeros((2, 36267), np.float32)
    for i in range(2):
        for t in (0.3, 1.1, 1.9):
            j = int(t * sr)
            audio[i, j : j + 300] = rng_np.normal(size=300) * 0.5
    s, n, m = ted_beat_align_batch(motions, audio)
    assert n > 0 and m > 0 and 0 <= s <= n


def test_embedding_evaluator_random_params(rng_np):
    enc = TedEmbeddingEncoder()
    poses = rng_np.normal(size=(4, 34, 27)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), poses)["params"]
    ev = EmbeddingSpaceEvaluator(params)
    gen = rng_np.normal(size=(8, 34, 27)).astype(np.float32)
    real = rng_np.normal(size=(8, 34, 27)).astype(np.float32)
    ev.push_samples(gen, real)
    ev.push_samples(gen + 0.1, real)
    fd, feat_dist = ev.get_scores()
    assert np.isfinite(fd) and np.isfinite(feat_dist)
    assert ev.get_diversity_scores() >= 0
    ev.reset()
    assert ev.get_no_of_samples() == 0


@requires_reference
def test_ted_embedding_matches_reference(rng_np):
    """Random torch EmbeddingNet weights -> converter -> identical features."""
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    from model.embedding_net import EmbeddingNet

    torch.manual_seed(3)
    net = EmbeddingNet(pose_dim=27, n_frames=34)
    net.eval()
    # randomise BN running stats so the test actually checks them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm1d,)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    poses = rng_np.normal(size=(4, 34, 27)).astype(np.float32)
    with torch.no_grad():
        ref_feat, _, _ = net(torch.from_numpy(poses), variational_encoding=False)

    params = ted_embedding_params_from_torch(net.state_dict())
    enc = TedEmbeddingEncoder()
    our_feat = enc.apply({"params": params}, poses)
    np.testing.assert_allclose(
        np.asarray(our_feat), ref_feat.numpy(), atol=2e-4
    )


@requires_reference
def test_beat_embedding_matches_reference(rng_np):
    """BEAT FID embedder converter parity: random torch HalfEmbeddingNet
    (scripts_beat/model/motion_autoencoder.py:38-73,156-167) weights ->
    pose_embedding_params_from_torch -> identical latents.  Full BEAT scale:
    pose_dims=282, vae_length=300 (configs/beat.yaml:17,26), 34 frames."""
    import importlib.util
    import types

    import torch

    from livelyspeaker_tpu.models.embedding_net import (
        BeatEmbeddingEncoder,
        pose_embedding_params_from_torch,
    )

    # load by file path: scripts_beat's `model` package name collides with
    # scripts/model already imported by the TED tests
    spec = importlib.util.spec_from_file_location(
        "ref_motion_autoencoder",
        f"{REFERENCE_ROOT}/scripts_beat/model/motion_autoencoder.py",
    )
    mae = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mae)

    torch.manual_seed(5)
    net = mae.HalfEmbeddingNet(
        types.SimpleNamespace(pose_length=34, pose_dims=282, vae_length=300)
    )
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    poses = rng_np.normal(size=(4, 34, 282)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(poses)).numpy()

    params = pose_embedding_params_from_torch(net.state_dict())
    got = BeatEmbeddingEncoder().apply({"params": params}, poses)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


@requires_reference
def test_fgd_parity_vs_reference_evaluator(tmp_path, rng_np):
    """North-star parity: the SAME (generated, real) clips scored by the
    reference's full EmbeddingSpaceEvaluator (ted_evaluator.py:13-151) and
    ours must give FGD within 1% (BASELINE.md target).  Combined with the
    e2e generation-parity test this closes the loop: same clips AND same
    scores."""
    import types

    import torch

    # ted_evaluator imports umap (viz-only, absent here) and pins cuda:0 at
    # module level; stub the former, repoint the latter.
    sys.modules.setdefault("umap", types.ModuleType("umap"))
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    tev = importlib.import_module("model.ted_evaluator")
    tev.device = torch.device("cpu")
    from model.embedding_net import EmbeddingNet

    torch.manual_seed(11)
    net = EmbeddingNet(pose_dim=27, n_frames=34)
    ckpt_path = str(tmp_path / "gesture_autoencoder_checkpoint_best.bin")
    torch.save({"gen_dict": net.state_dict(), "pose_dim": 27}, ckpt_path)

    ref_ev = tev.EmbeddingSpaceEvaluator(ckpt_path)
    our_ev = EmbeddingSpaceEvaluator.from_torch_checkpoint(ckpt_path)

    # strongly distinct distributions (noise vs structured sinusoids) so the
    # random-weight embedder still separates them and FGD is away from zero
    tgrid = np.arange(34, dtype=np.float32)[None, :, None]
    for k in range(4):
        gen = rng_np.normal(size=(16, 34, 27)).astype(np.float32) * 1.5
        phase = rng_np.uniform(0, 6.28, size=(16, 1, 27)).astype(np.float32)
        real = (2.0 * np.sin(0.5 * tgrid + phase) + 1.0).astype(np.float32)
        with torch.no_grad():
            ref_ev.push_samples(
                torch.from_numpy(gen), torch.from_numpy(real)
            )
        our_ev.push_samples(gen, real)

    ref_fgd, ref_fd = ref_ev.get_scores()
    our_fgd, our_fd = our_ev.get_scores()
    assert ref_fgd > 1e-4
    assert abs(our_fgd - ref_fgd) / abs(ref_fgd) < 0.01, (our_fgd, ref_fgd)
    assert abs(our_fd - ref_fd) / abs(ref_fd) < 0.01, (our_fd, ref_fd)


@requires_reference
def test_srgr_parity_vs_reference(rng_np):
    """Our SRGR accumulator vs the reference's on identical inputs
    (scripts_beat/utils/metric.py:27-51)."""
    import types

    # metric.py imports librosa + matplotlib at module level; only the
    # numpy-based SRGR class is exercised here.
    fake_librosa = types.ModuleType("librosa")
    fake_librosa.display = types.ModuleType("librosa.display")
    sys.modules.setdefault("librosa", fake_librosa)
    sys.modules.setdefault("librosa.display", fake_librosa.display)
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts_beat")
    import importlib

    ref_metric = importlib.import_module("utils.metric")

    ref = ref_metric.SRGR(threshold=4.0, joints=47)
    ours = SRGR(threshold=4.0, joints=47)
    for _ in range(3):
        res = rng_np.normal(size=(68, 141)).astype(np.float32) * 3
        tar = rng_np.normal(size=(68, 141)).astype(np.float32) * 3
        sem = rng_np.uniform(0, 1, size=(68,)).astype(np.float32)
        r1 = ref.run(res, tar, sem)
        r2 = ours.run(res, tar, sem)
        np.testing.assert_allclose(r2, r1, rtol=1e-6)
    np.testing.assert_allclose(ours.avg(), ref.avg(), rtol=1e-6)
