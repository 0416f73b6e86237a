"""Frozen evaluation embedding networks (TED FGD / BEAT FID), in Flax.

Inference-only ports of the metric fixtures:
- TED: the TriModal gesture-autoencoder *encoder* used by the FGD evaluator
  (``scripts/model/embedding_net.py:41-81`` PoseEncoderConv; loaded frozen at
  ``scripts/model/ted_evaluator.py:14-23``).
- BEAT: HalfEmbeddingNet's PoseEncoderConv (``scripts_beat/model/
  motion_autoencoder.py:38-74,156-167``).

BatchNorm runs in inference mode on stored running statistics — these nets
are never trained here, only evaluated, so the stats are plain frozen params
filled by the torch-checkpoint converters below.

Quirk preserved deliberately: the reference's ``nn.LeakyReLU(True)`` inside
``out_net`` passes ``True`` as ``negative_slope`` (=1.0), making those
activations identity functions.  Bit-parity with the released evaluator
checkpoint requires reproducing that (embedding_net.py:52-61).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "TedEmbeddingEncoder",
    "ted_embedding_params_from_torch",
]


def _frozen_bn(x: jnp.ndarray, p: Dict, eps: float = 1e-5) -> jnp.ndarray:
    """Inference BatchNorm over the channel (last) axis from stored stats."""
    inv = 1.0 / jnp.sqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


class TedEmbeddingEncoder(nn.Module):
    """poses [B, T, D] -> 32-d embedding (PoseEncoderConv with
    variational_encoding=False: returns fc_mu(out))."""

    pose_dim: int = 27
    n_frames: int = 34

    @nn.compact
    def __call__(self, poses: jnp.ndarray) -> jnp.ndarray:
        x = poses  # keep NWC: [B, T, D]; torch runs NCW with D as channels

        def conv_bn_lrelu(x, feat, ksize, stride, name):
            x = nn.Conv(
                feat, (ksize,), strides=(stride,), padding="VALID", name=name
            )(x)
            bnp = {
                "mean": self.param(f"{name}_bn_mean", nn.initializers.zeros, (feat,)),
                "var": self.param(f"{name}_bn_var", nn.initializers.ones, (feat,)),
                "scale": self.param(f"{name}_bn_scale", nn.initializers.ones, (feat,)),
                "bias": self.param(f"{name}_bn_bias", nn.initializers.zeros, (feat,)),
            }
            x = _frozen_bn(x, bnp)
            return nn.leaky_relu(x, 0.2)

        x = conv_bn_lrelu(x, 32, 3, 1, "conv0")
        x = conv_bn_lrelu(x, 64, 3, 1, "conv1")
        x = conv_bn_lrelu(x, 64, 4, 2, "conv2")
        x = nn.Conv(32, (3,), padding="VALID", name="conv3")(x)

        # torch flattens [B, 32, L] channel-major; our x is [B, L, 32].
        x = x.transpose(0, 2, 1).reshape(x.shape[0], -1)

        x = nn.Dense(256, name="fc0")(x)
        bn0 = {
            "mean": self.param("fc0_bn_mean", nn.initializers.zeros, (256,)),
            "var": self.param("fc0_bn_var", nn.initializers.ones, (256,)),
            "scale": self.param("fc0_bn_scale", nn.initializers.ones, (256,)),
            "bias": self.param("fc0_bn_bias", nn.initializers.zeros, (256,)),
        }
        x = _frozen_bn(x, bn0)  # LeakyReLU(True) == identity, skipped
        x = nn.Dense(128, name="fc1")(x)
        bn1 = {
            "mean": self.param("fc1_bn_mean", nn.initializers.zeros, (128,)),
            "var": self.param("fc1_bn_var", nn.initializers.ones, (128,)),
            "scale": self.param("fc1_bn_scale", nn.initializers.ones, (128,)),
            "bias": self.param("fc1_bn_bias", nn.initializers.zeros, (128,)),
        }
        x = _frozen_bn(x, bn1)
        x = nn.Dense(32, name="fc2")(x)
        return nn.Dense(32, name="fc_mu")(x)


def _t(a):
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return np.asarray(a, np.float32)


def ted_embedding_params_from_torch(sd: Dict, prefix: str = "pose_encoder.") -> Dict:
    """Map the TriModal checkpoint ('gen_dict' of
    gesture_autoencoder_checkpoint_best.bin, ted_evaluator.py:16-20) onto
    :class:`TedEmbeddingEncoder` params."""

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
