"""Post-LN transformer encoder/decoder layers with torch-compatible
parameterisation.

The SAG (MotionCLIP) towers in the reference are stock
``nn.TransformerEncoder/Decoder`` stacks (scripts/model/motionclip_module.py:
62-68, 123-129; PyTorch 1.7 semantics: post-norm, packed QKV projection).
We reimplement that exact computation in Flax — packed QKV and all — so the
released SAG checkpoints map 1:1 onto our param tree, while keeping the
[B, S, D] layout and letting XLA fuse the 34-36-token attention (flash-style
Pallas attention is pointless at this sequence length; the matmuls are the
whole cost).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MultiHeadAttention", "TransformerEncoderLayer",
           "TransformerDecoderLayer", "TransformerEncoder", "TransformerDecoder"]


class MultiHeadAttention(nn.Module):
    """torch ``nn.MultiheadAttention``-equivalent (packed in_proj)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, D]
        key: jnp.ndarray,  # [B, Lk, D]
        value: jnp.ndarray,  # [B, Lk, D]
        *,
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Lk] True=valid
        attn_mask: Optional[jnp.ndarray] = None,  # [Lq, Lk] additive
    ) -> jnp.ndarray:
        d, h = self.d_model, self.num_heads
        hd = d // h
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        q = query @ in_proj_w[:d].T + in_proj_b[:d]
        k = key @ in_proj_w[d : 2 * d].T + in_proj_b[d : 2 * d]
        v = value @ in_proj_w[2 * d :].T + in_proj_b[2 * d :]

        def split_heads(x):
            b, l, _ = x.shape
            return x.reshape(b, l, h, hd).transpose(0, 2, 1, 3)  # [B, H, L, hd]

        q, k, v = map(split_heads, (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if attn_mask is not None:
            logits = logits + attn_mask[None, None]
        if key_padding_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(
                key_padding_mask[:, None, None, :], logits, neg
            )
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b, _, lq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        out = nn.Dense(d, name="out_proj")(out)
        return out


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch 1.7 ``nn.TransformerEncoderLayer``)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, src, *, key_padding_mask=None, deterministic=True):
        act = getattr(nn, self.activation)
        h = MultiHeadAttention(self.d_model, self.num_heads, name="self_attn")(
            src, src, src, key_padding_mask=key_padding_mask
        )
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + h)
        h = nn.Dense(self.dim_feedforward, name="linear1")(src)
        h = act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + h)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer (torch 1.7 ``nn.TransformerDecoderLayer``)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        *,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        deterministic=True,
    ):
        act = getattr(nn, self.activation)
        h = MultiHeadAttention(self.d_model, self.num_heads, name="self_attn")(
            tgt, tgt, tgt, key_padding_mask=tgt_key_padding_mask
        )
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + h)
        h = MultiHeadAttention(self.d_model, self.num_heads, name="multihead_attn")(
            tgt, memory, memory, key_padding_mask=memory_key_padding_mask
        )
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + h)
        h = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        h = act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + h)


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, src, *, key_padding_mask=None, deterministic=True):
        for i in range(self.num_layers):
            src = TransformerEncoderLayer(
                self.d_model,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                name=f"layer_{i}",
            )(src, key_padding_mask=key_padding_mask, deterministic=deterministic)
        return src


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        *,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        deterministic=True,
    ):
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.d_model,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                name=f"layer_{i}",
            )(
                tgt,
                memory,
                tgt_key_padding_mask=tgt_key_padding_mask,
                memory_key_padding_mask=memory_key_padding_mask,
                deterministic=deterministic,
            )
        return tgt
