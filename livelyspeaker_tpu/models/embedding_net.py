"""Frozen evaluation embedding networks (TED FGD / BEAT FID), in Flax.

Inference-only ports of the metric fixtures:
- TED: the TriModal gesture-autoencoder *encoder* used by the FGD evaluator
  (``scripts/model/embedding_net.py:41-81`` PoseEncoderConv; loaded frozen at
  ``scripts/model/ted_evaluator.py:14-23``); out_net widths 8x/4x base.
- BEAT: HalfEmbeddingNet's PoseEncoderConv (``scripts_beat/model/
  motion_autoencoder.py:38-73,156-167``); parametric base (vae_length=300,
  pose_dims=282, configs/beat.yaml:17,26); out_net widths 4x/2x base.

BatchNorm runs in inference mode on stored running statistics — these nets
are never trained here, only evaluated, so the stats are plain frozen params
filled by the torch-checkpoint converter below.

Quirk preserved deliberately: the reference's ``nn.LeakyReLU(True)`` inside
``out_net`` passes ``True`` as ``negative_slope`` (=1.0), making those
activations identity functions.  Bit-parity with the released evaluator
checkpoints requires reproducing that (embedding_net.py:52-61).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "PoseEmbeddingEncoder",
    "TedEmbeddingEncoder",
    "BeatEmbeddingEncoder",
    "ted_embedding_params_from_torch",
    "pose_embedding_params_from_torch",
]


def _frozen_bn(x: jnp.ndarray, p: Dict, eps: float = 1e-5) -> jnp.ndarray:
    """Inference BatchNorm over the channel (last) axis from stored stats."""
    inv = 1.0 / jnp.sqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


class PoseEmbeddingEncoder(nn.Module):
    """poses [B, T, D] -> base-dim embedding (PoseEncoderConv with
    variational_encoding=False: returns fc_mu(out))."""

    pose_dim: int = 27
    n_frames: int = 34
    base: int = 32
    hidden_mults: Tuple[int, int] = (8, 4)  # TED; BEAT uses (4, 2)
    # False: frozen-stat BN as plain params (checkpoint-conversion layout,
    # inference fixtures). True: real flax BatchNorm with batch_stats (for
    # training your own evaluation fixture via GestureAutoencoder).
    trainable_bn: bool = False

    def __call__(self, poses: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # Metric fixtures must be numerically faithful to the torch
        # evaluator: force true-f32 matmuls (TPU's default bf16-precision
        # dots give ~1e-3 latent deltas on the wide BEAT net, which blow up
        # relative FID when the score is near zero). Off the hot path.
        with jax.default_matmul_precision("float32"):
            return self._encode(poses, train=train)

    @nn.compact
    def _encode(self, poses: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = poses  # NWC: [B, T, D]; torch runs NCW with D as channels

        def bn(x, name, feat):
            if self.trainable_bn:
                return nn.BatchNorm(
                    use_running_average=not train, name=f"{name}_bn"
                )(x)
            p = {
                "mean": self.param(f"{name}_bn_mean", nn.initializers.zeros, (feat,)),
                "var": self.param(f"{name}_bn_var", nn.initializers.ones, (feat,)),
                "scale": self.param(f"{name}_bn_scale", nn.initializers.ones, (feat,)),
                "bias": self.param(f"{name}_bn_bias", nn.initializers.zeros, (feat,)),
            }
            return _frozen_bn(x, p)

        def conv_bn_lrelu(x, feat, ksize, stride, name):
            x = nn.Conv(
                feat, (ksize,), strides=(stride,), padding="VALID", name=name
            )(x)
            x = bn(x, name, feat)
            return nn.leaky_relu(x, 0.2)

        b = self.base
        x = conv_bn_lrelu(x, b, 3, 1, "conv0")
        x = conv_bn_lrelu(x, b * 2, 3, 1, "conv1")
        x = conv_bn_lrelu(x, b * 2, 4, 2, "conv2")
        x = nn.Conv(b, (3,), padding="VALID", name="conv3")(x)

        # torch flattens [B, base, L] channel-major; our x is [B, L, base].
        x = x.transpose(0, 2, 1).reshape(x.shape[0], -1)

        h0, h1 = b * self.hidden_mults[0], b * self.hidden_mults[1]
        x = nn.Dense(h0, name="fc0")(x)
        x = bn(x, "fc0", h0)  # LeakyReLU(True) == identity, skipped
        x = nn.Dense(h1, name="fc1")(x)
        x = bn(x, "fc1", h1)
        x = nn.Dense(b, name="fc2")(x)
        return nn.Dense(b, name="fc_mu")(x)


class PoseEmbeddingDecoder(nn.Module):
    """latent [B, base] -> poses [B, T, D] (PoseDecoderConv,
    embedding_net.py:164-216 / motion_autoencoder.py:76-131).  Used when
    training a gesture autoencoder as an FGD/FID fixture; BatchNorm here is
    trainable (use_running_average toggled by ``train``)."""

    pose_dim: int = 27
    n_frames: int = 34
    base: int = 32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        b = self.base
        # pre_net (34-frame branch): Linear -> BN -> (identity) -> Linear
        decoder_size = max(b // 8, 4)
        h = nn.Dense(b * 2, name="pre0")(feat)
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn")(h)
        h = nn.Dense(decoder_size * self.n_frames, name="pre1")(h)
        h = h.reshape(feat.shape[0], -1, decoder_size)  # NWC [B, T', dsize]

        def convt(x, feats, name):
            return nn.ConvTranspose(feats, (3,), padding="VALID", name=name)(x)

        h = convt(h, b, "deconv0")
        h = nn.BatchNorm(use_running_average=not train, name="bn0")(h)
        h = nn.leaky_relu(h, 0.2)
        h = convt(h, b, "deconv1")
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(b * 2, (3,), padding="VALID", name="conv0")(h)
        h = nn.Conv(self.pose_dim, (3,), padding="VALID", name="conv1")(h)
        return h


class PoseDecoderFC(nn.Module):
    """Fully-connected decoder variant (embedding_net.py:84-126): latent
    (optionally + 4 seed poses) -> [B, T, D] through a BN MLP."""

    gen_length: int = 34
    pose_dim: int = 27
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, latent, pre_poses=None, *, train: bool = False):
        feat = latent
        if self.use_pre_poses:
            h = nn.Dense(32, name="pre0")(
                pre_poses.reshape(pre_poses.shape[0], -1)
            )
            h = nn.BatchNorm(use_running_average=not train, name="pre_bn")(h)
            h = nn.relu(h)
            h = nn.Dense(32, name="pre1")(h)
            feat = jnp.concatenate([h, latent], axis=1)
        widths = (128, 128, 256, 512)
        for i, w in enumerate(widths):
            feat = nn.Dense(w, name=f"fc{i}")(feat)
            feat = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(feat)
            feat = nn.relu(feat)
        out = nn.Dense(self.gen_length * self.pose_dim, name="out")(feat)
        return out.reshape(-1, self.gen_length, self.pose_dim)


class PoseDecoderGRU(nn.Module):
    """Bidirectional-GRU decoder variant (embedding_net.py:129-161): seed
    poses + latent repeated over time -> 4-layer bi-GRU -> poses.

    (The reference file also contains a ``ContextEncoder`` referencing
    undefined ``TextEncoderTCN``/``WavEncoder`` symbols — it raises
    NameError if instantiated, i.e. dead code; deliberately not reproduced.)
    """

    gen_length: int = 34
    pose_dim: int = 27
    hidden: int = 300
    num_layers: int = 4

    @nn.compact
    def __call__(self, latent, pre_poses, *, train: bool = False):
        b = latent.shape[0]
        h = nn.Dense(32, name="pre0")(pre_poses.reshape(b, -1))
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn")(h)
        h = nn.relu(h)
        h = nn.Dense(32, name="pre1")(h)
        feat = jnp.concatenate([h, latent], axis=1)
        x = jnp.broadcast_to(
            feat[:, None, :], (b, self.gen_length, feat.shape[-1])
        )
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden), name=f"gru{i}_fwd")(x)
            bwd = nn.RNN(nn.GRUCell(self.hidden), reverse=True,
                         keep_order=True, name=f"gru{i}_bwd")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        # sum the directions (reference: output[:, :, :h] + output[:, :, h:])
        x = x[..., : self.hidden] + x[..., self.hidden :]
        x = nn.Dense(self.hidden // 2, name="out0")(x)
        x = nn.leaky_relu(x, 0.01)
        return nn.Dense(self.pose_dim, name="out1")(x)


class GestureAutoencoder(nn.Module):
    """Trainable gesture autoencoder (EmbeddingNet, embedding_net.py:261-275)
    for producing FGD/FID evaluation fixtures from scratch."""

    pose_dim: int = 27
    n_frames: int = 34
    base: int = 32
    hidden_mults: Tuple[int, int] = (8, 4)

    def setup(self):
        self.encoder = PoseEmbeddingEncoder(
            pose_dim=self.pose_dim,
            n_frames=self.n_frames,
            base=self.base,
            hidden_mults=self.hidden_mults,
            trainable_bn=True,
        )
        self.decoder = PoseEmbeddingDecoder(
            pose_dim=self.pose_dim, n_frames=self.n_frames, base=self.base
        )

    def __call__(self, poses, *, train: bool = False):
        feat = self.encoder(poses, train=train)
        recon = self.decoder(feat, train=train)
        return feat, recon

    def embed(self, poses):
        return self.encoder(poses)


class TedEmbeddingEncoder(PoseEmbeddingEncoder):
    pose_dim: int = 27
    base: int = 32
    hidden_mults: Tuple[int, int] = (8, 4)


class BeatEmbeddingEncoder(PoseEmbeddingEncoder):
    pose_dim: int = 282
    base: int = 300
    hidden_mults: Tuple[int, int] = (4, 2)


def _t(a):
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return np.asarray(a, np.float32)


def pose_embedding_params_from_torch(
    sd: Dict, prefix: str = "pose_encoder."
) -> Dict:
    """Map a PoseEncoderConv state_dict (TED TriModal 'gen_dict' or BEAT
    HalfEmbeddingNet) onto :class:`PoseEmbeddingEncoder` params."""

    def conv(name):
        return {
            "kernel": _t(sd[f"{prefix}{name}.weight"]).transpose(2, 1, 0),
            "bias": _t(sd[f"{prefix}{name}.bias"]),
        }

    def dense(name):
        return {
            "kernel": _t(sd[f"{prefix}{name}.weight"]).T,
            "bias": _t(sd[f"{prefix}{name}.bias"]),
        }

    def bn(dst, name):
        return {
            f"{dst}_bn_mean": _t(sd[f"{prefix}{name}.running_mean"]),
            f"{dst}_bn_var": _t(sd[f"{prefix}{name}.running_var"]),
            f"{dst}_bn_scale": _t(sd[f"{prefix}{name}.weight"]),
            f"{dst}_bn_bias": _t(sd[f"{prefix}{name}.bias"]),
        }

    p: Dict = {
        "conv0": conv("net.0.0"),
        "conv1": conv("net.1.0"),
        "conv2": conv("net.2.0"),
        "conv3": conv("net.3"),
        "fc0": dense("out_net.0"),
        "fc1": dense("out_net.3"),
        "fc2": dense("out_net.6"),
        "fc_mu": dense("fc_mu"),
    }
    p.update(bn("conv0", "net.0.1"))
    p.update(bn("conv1", "net.1.1"))
    p.update(bn("conv2", "net.2.1"))
    p.update(bn("fc0", "out_net.1"))
    p.update(bn("fc1", "out_net.4"))
    return p


# Backwards-compatible name used by the FGD evaluator.
ted_embedding_params_from_torch = pose_embedding_params_from_torch
