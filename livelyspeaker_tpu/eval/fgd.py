"""Fréchet Gesture Distance evaluator (TED) and Fréchet math.

Re-design of ``scripts/model/ted_evaluator.py:13-151``: the embedding net
runs batched + jitted on device; only 32-d features cross to the host, where
the Fréchet distance (scipy sqrtm — host-only, as in the reference) and the
HA2G diversity score are computed.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.embedding_net import TedEmbeddingEncoder

__all__ = ["calculate_frechet_distance", "frechet_from_samples",
           "EmbeddingSpaceEvaluator", "diversity_score"]


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """pytorch-fid's stable Fréchet distance (ted_evaluator.py:89-142)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}"
            )
        covmean = covmean.real
    return float(
        diff.dot(diff)
        + np.trace(sigma1)
        + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def frechet_from_samples(a: np.ndarray, b: np.ndarray) -> float:
    """Fréchet distance between two sample sets [N, D] (with the reference's
    1e10-style sentinel on numerical failure, ted_evaluator.py:69-73)."""
    try:
        return calculate_frechet_distance(
            a.mean(0), np.cov(a, rowvar=False), b.mean(0), np.cov(b, rowvar=False)
        )
    except ValueError:
        return float(1e10)


def diversity_score(
    generated_feats_batched: List[np.ndarray], seed: int = 233
) -> float:
    """HA2G diversity (ted_evaluator.py:144-151): mean L1 between the
    generated features and a batch-shuffled copy."""
    rng = np.random.default_rng(seed)
    n = min(len(generated_feats_batched), 500)
    feat1 = np.vstack(generated_feats_batched[:n])
    idx = rng.permutation(len(generated_feats_batched))[:n]
    feat2 = np.vstack([generated_feats_batched[i] for i in idx])
    m = min(len(feat1), len(feat2))
    return float(np.mean(np.sum(np.abs(feat1[:m] - feat2[:m]), axis=-1)))


class EmbeddingSpaceEvaluator:
    """Accumulate real/generated embeddings; score FGD/feat-dist/diversity.

    ``push_samples(generated, real)`` takes [B, T, D] mean-subtracted dir-vec
    motions (ted_evaluator.py:35-41 contract).
    """

    def __init__(self, params, pose_dim: int = 27, n_frames: int = 34):
        self.net = TedEmbeddingEncoder(pose_dim=pose_dim, n_frames=n_frames)
        self.params = params
        self._embed = jax.jit(
            lambda poses: self.net.apply({"params": self.params}, poses)
        )
        self.real_feat_list: List[np.ndarray] = []
        self.generated_feat_list: List[np.ndarray] = []

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "EmbeddingSpaceEvaluator":
        import torch

        from ..models.embedding_net import ted_embedding_params_from_torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        params = ted_embedding_params_from_torch(ckpt["gen_dict"])
        return cls(params, pose_dim=int(ckpt["pose_dim"]))

    def reset(self) -> None:
        self.real_feat_list = []
        self.generated_feat_list = []

    def embed(self, poses) -> np.ndarray:
        return np.asarray(self._embed(jnp.asarray(poses)))

    def push_samples(self, generated_poses, real_poses) -> None:
        self.generated_feat_list.append(self.embed(generated_poses))
        self.real_feat_list.append(self.embed(real_poses))

    def get_no_of_samples(self) -> int:
        return len(self.real_feat_list)

    def get_scores(self) -> Tuple[float, float]:
        gen = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        fd = frechet_from_samples(gen, real)
        feat_dist = float(np.mean(np.sum(np.abs(real - gen), axis=-1)))
        return fd, feat_dist

    def get_diversity_scores(self) -> float:
        return diversity_score(self.generated_feat_list)

    def get_features_for_viz(self):
        """2-D projection of generated vs real features for plotting
        (ted_evaluator.py:48-57; PCA instead of the reference's UMAP, which
        isn't available here — same downstream usage)."""
        from sklearn.decomposition import PCA

        gen = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        both = PCA(n_components=2).fit_transform(np.vstack([gen, real]))
        n = len(gen)
        return both[n:], both[:n]
