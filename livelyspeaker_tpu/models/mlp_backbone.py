"""TransMLP denoiser backbone (MLP-Mixer style) in Flax.

TPU-first re-design of the reference backbone
(``scripts/model/mlp_module.py:37-136``): a stack of blocks, each
    x <- x + t_emb
    x <- x + act(token_mix(LN(x)))      # 1x1 Conv over the sequence axis
    x <- x + act(channel_mix(LN(x)))    # Dense over the feature axis
with the sinusoidal-PE-table timestep embedding added at the input of every
block.  We keep the feature axis (512 = 4x128 lanes) innermost so both mixes
land on the MXU; there is no attention anywhere in this backbone.

The channel-mix kernel uses the reference's xavier-uniform gain=1e-8 init
(mlp_module.py:63-65), which makes every block start as (almost) the identity
plus the token mix — important for training dynamics.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.nn import initializers

__all__ = ["sinusoidal_table", "TimestepEmbedder", "MLPBlock", "TransMLP"]


def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """The classic transformer PE table (mlp_module.py:104-116).

    Used both as the timestep-embedding lookup (``pe[t]``,
    mlp_module.py:135-136 — a *table lookup*, not the on-the-fly
    guided-diffusion ``timestep_embedding``) and as sequence PE in the SAG.
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry mirroring MLPblock's options (mlp_module.py:39-50)."""
    table = {
        "relu": nn.relu,
        "lrelu01": lambda x: nn.leaky_relu(x, 0.1),
        "lrelu02": lambda x: nn.leaky_relu(x, 0.2),
        "lrelu": lambda x: nn.leaky_relu(x, 0.01),
        "silu": nn.silu,
        "gelu": nn.gelu,
    }
    return table[name]


class TimestepEmbedder(nn.Module):
    """t -> PE-table lookup -> Linear/SiLU/Linear (mlp_module.py:123-136)."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        pe = sinusoidal_table(self.max_len, self.latent_dim)
        h = pe[t]  # [B, D]
        h = nn.Dense(self.latent_dim, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.latent_dim, name="fc2")(h)
        return h[:, None, :]  # [B, 1, D]


class MLPBlock(nn.Module):
    """One mixer block (mlp_module.py:37-74)."""

    seq_len: int
    dim: int
    act: str = "silu"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray | None = None,
        emb: jnp.ndarray | None = None,
        *,
        collect_only: bool = False,
    ) -> jnp.ndarray | dict:
        act = get_activation(self.act)
        ln1 = nn.LayerNorm(epsilon=1e-5, name="ln1")
        w = self.param(
            "token_mix_kernel",
            initializers.lecun_normal(),
            (self.seq_len, self.seq_len),
        )
        b = self.param("token_mix_bias", initializers.zeros, (self.seq_len,))
        ln2 = nn.LayerNorm(epsilon=1e-5, name="ln2")
        channel_mix = nn.Dense(
            self.dim,
            kernel_init=initializers.variance_scaling(
                # xavier_uniform with gain 1e-8 (mlp_module.py:64):
                # variance_scaling(scale=gain^2, fan_avg, uniform)
                1e-16,
                "fan_avg",
                "uniform",
            ),
            bias_init=initializers.zeros,
            name="channel_mix",
        )
        if collect_only:
            # Declare the identical param tree (dummy calls create the
            # submodule params; outputs are dead code) and hand the arrays
            # to the fused-VJP kernel path in TransMLP.  Same names, same
            # shapes, same init RNG derivation as a normal call.
            dummy = jnp.zeros((1, self.dim), jnp.float32)
            _ = ln1(dummy)
            _ = ln2(dummy)
            _ = channel_mix(dummy)
            return {
                "ln1": dict(ln1.variables["params"]),
                "token_mix_kernel": w,
                "token_mix_bias": b,
                "ln2": dict(ln2.variables["params"]),
                "channel_mix": dict(channel_mix.variables["params"]),
            }
        if emb is not None:
            x = x + emb
        # --- token mix: 1x1 conv over the sequence axis ------------------
        h = ln1(x)
        h = jnp.einsum("ij,bjd->bid", w, h) + b[None, :, None]
        x = x + act(h)
        # --- channel mix: near-identity-init Dense over features ---------
        h = ln2(x)
        h = channel_mix(h)
        x = x + act(h)
        return x


class TransMLP(nn.Module):
    """The full backbone: timestep embedding + N mixer blocks
    (mlp_module.py:76-91)."""

    seq_len: int = 35
    num_layers: int = 8
    dim: int = 512
    act: str = "silu"
    # Route the whole stack through the fused Pallas kernel with the
    # hand-written backward (ops/pallas/fused_mlp_train.py) — the training
    # fast path (XLA's autodiff of this stack is ~2.3x slower, DESIGN.md).
    # f32, single-device (pallas_call is opaque to GSPMD).
    fused_vjp: bool = False
    fused_batch_tile: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        emb = TimestepEmbedder(self.dim, name="embed_timestep")(t)
        blocks = [
            MLPBlock(self.seq_len, self.dim, self.act, name=f"block_{i}")
            for i in range(self.num_layers)
        ]
        if not self.fused_vjp:
            for blk in blocks:
                x = blk(x, emb)
            return x
        from ..ops.pallas.fused_mlp import pack_transmlp_params
        from ..ops.pallas.fused_mlp_train import fused_transmlp_train

        block_params = {
            f"block_{i}": blk(collect_only=True)
            for i, blk in enumerate(blocks)
        }
        packed = pack_transmlp_params(block_params, self.num_layers)
        return fused_transmlp_train(
            x, emb[:, 0], packed, self.act, self.fused_batch_tile
        )
