"""CLIP ViT-B/32 *text tower* in Flax, with an OpenAI-checkpoint converter.

The reference conditions the SAG on a frozen OpenAI CLIP text encoder loaded
from the ``clip`` pip package (scripts/model/motionclip.py:96-104, used at
test_LivelySpeaker_ted.py:85-87).  We re-implement just the text transformer
(vocab 49408, width 512, 12 layers, 8 heads, causal mask, QuickGELU,
ln_final + text projection) so a released ``ViT-B/32`` state_dict converts
directly; the vision tower is never used by this framework.

Runs in float32 like the reference (``clip_model.float()``,
motionclip.py:104).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CLIPTextConfig", "CLIPTextEncoder", "clip_text_params_from_torch"]


class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask):
        d, h = self.width, self.heads
        hd = d // h
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        w = self.param("attn_in_proj_weight", nn.initializers.normal(0.02), (3 * d, d))
        b = self.param("attn_in_proj_bias", nn.initializers.zeros, (3 * d,))
        q = y @ w[:d].T + b[:d]
        k = y @ w[d : 2 * d].T + b[d : 2 * d]
        v = y @ w[2 * d :].T + b[2 * d :]
        bsz, l, _ = y.shape
        sh = lambda a: a.reshape(bsz, l, h, hd).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        logits = logits + attn_mask[None, None]
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(bsz, l, d)
        o = nn.Dense(d, name="attn_out_proj")(o)
        x = x + o
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * d, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(d, name="mlp_c_proj")(y)
        return x + y


class CLIPTextEncoder(nn.Module):
    """tokens [B, 77] int32 -> text features [B, embed_dim]."""

    cfg: CLIPTextConfig = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg or CLIPTextConfig()
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = tok_emb[tokens] + pos_emb[None, : tokens.shape[1]]

        n = tokens.shape[1]
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, x.dtype), k=1)
        for i in range(cfg.layers):
            x = _ResidualAttentionBlock(cfg.width, cfg.heads, name=f"block_{i}")(
                x, causal
            )
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # Take features at the EOT token (highest token id per sequence).
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(cfg.width**-0.5),
            (cfg.width, cfg.embed_dim),
        )
        return x @ proj


def clip_text_params_from_torch(sd: Dict, layers: int = 12) -> Dict:
    """Map an OpenAI CLIP state_dict (full model or text-only) onto
    :class:`CLIPTextEncoder` params."""

    def t(a):
        if hasattr(a, "detach"):
            a = a.detach().cpu().float().numpy()
        return np.asarray(a, dtype=np.float32)

    p: Dict = {
        "token_embedding": t(sd["token_embedding.weight"]),
        "positional_embedding": t(sd["positional_embedding"]),
        "text_projection": t(sd["text_projection"]),
        "ln_final": {
            "scale": t(sd["ln_final.weight"]),
            "bias": t(sd["ln_final.bias"]),
        },
    }
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        p[f"block_{i}"] = {
            "ln_1": {
                "scale": t(sd[f"{pre}.ln_1.weight"]),
                "bias": t(sd[f"{pre}.ln_1.bias"]),
            },
            "attn_in_proj_weight": t(sd[f"{pre}.attn.in_proj_weight"]),
            "attn_in_proj_bias": t(sd[f"{pre}.attn.in_proj_bias"]),
            "attn_out_proj": {
                "kernel": t(sd[f"{pre}.attn.out_proj.weight"]).T,
                "bias": t(sd[f"{pre}.attn.out_proj.bias"]),
            },
            "ln_2": {
                "scale": t(sd[f"{pre}.ln_2.weight"]),
                "bias": t(sd[f"{pre}.ln_2.bias"]),
            },
            "mlp_c_fc": {
                "kernel": t(sd[f"{pre}.mlp.c_fc.weight"]).T,
                "bias": t(sd[f"{pre}.mlp.c_fc.bias"]),
            },
            "mlp_c_proj": {
                "kernel": t(sd[f"{pre}.mlp.c_proj.weight"]).T,
                "bias": t(sd[f"{pre}.mlp.c_proj.bias"]),
            },
        }
    return p
