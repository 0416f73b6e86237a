"""Diagnostic plotting utilities + farthest-point sampling."""

import numpy as np
import pytest

from livelyspeaker_tpu.utils.plotting import (
    circles,
    distribution,
    farthest_point_sample,
    function,
    pca2d,
    pca_2d_tracks,
    phase_1d,
    phase_2d,
)


def _np_fps_reference(xyz, npoint, start):
    """Literal numpy port of sample_utils.py:137-157 for cross-checking."""
    b, n, _ = xyz.shape
    centroids = np.zeros((b, npoint), np.int64)
    distance = np.full((b, n), 1e10)
    farthest = np.asarray(start, np.int64)
    bi = np.arange(b)
    for i in range(npoint):
        centroids[:, i] = farthest
        centroid = xyz[bi, farthest][:, None]
        dist = ((xyz - centroid) ** 2).sum(-1)
        distance = np.minimum(distance, dist)
        farthest = distance.argmax(-1)
    return centroids


def test_farthest_point_sample_matches_reference_algorithm(rng_np):
    xyz = rng_np.normal(size=(3, 64, 3)).astype(np.float32)
    start = rng_np.integers(0, 64, size=3)
    got = np.asarray(farthest_point_sample(xyz, 8, start=start))
    want = _np_fps_reference(xyz, 8, start)
    np.testing.assert_array_equal(got, want)


def test_farthest_point_sample_spreads_points():
    # 4 well-separated cluster centers: FPS with 4 picks must visit all 4
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                       np.float32)
    cloud = np.repeat(centers, 16, axis=0)[None]  # [1, 64, 3]
    idx = np.asarray(farthest_point_sample(cloud, 4))
    picked = cloud[0, idx[0]]
    assert len({tuple(p) for p in picked}) == 4


def test_pca_2d_tracks_whitened_variance(rng_np):
    batches = [rng_np.normal(size=(100, 8)) @ rng_np.normal(size=(8, 8))
               for _ in range(3)]
    tracks = pca_2d_tracks(batches)
    assert [len(t) for t in tracks] == [100, 100, 100]
    y = np.vstack(tracks)
    # whiten=True: unit variance per component, uncorrelated
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=0.05)
    assert abs(np.corrcoef(y.T)[0, 1]) < 1e-6


def test_plotters_smoke(tmp_path, rng_np):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(9, 6))
    batches = [rng_np.normal(size=(120, 6)) for _ in range(2)]
    pca2d(axes[0, 0], [0, 1], batches, "pca")
    distribution(axes[0, 1], rng_np.normal(size=(50, 4)), "dist")
    circles(axes[0, 2], rng_np.uniform(0, 1, 5), rng_np.uniform(0.2, 1, 5),
            title="circles", show_axes=False)
    function(axes[1, 0], [np.sin(np.linspace(0, 6, 80))], 0, 6, -1, 1,
             title="fn")
    phase_1d(axes[1, 1], rng_np.uniform(-0.5, 0.5, 60),
             rng_np.uniform(0, 1, 60), color=(0.1, 0.2, 0.8), title="p1")
    phase_2d(axes[1, 2], rng_np.uniform(0, 1, 60),
             rng_np.uniform(0.2, 1, 60), title="p2")
    out = tmp_path / "plots.png"
    fig.savefig(out)
    plt.close(fig)
    assert out.stat().st_size > 1000
