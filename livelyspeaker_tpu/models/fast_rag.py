"""Inference fast path: RAG forward with the fused Pallas backbone.

Numerically equivalent to ``RAG.__call__`` (eval mode) — same params, same
math — but the 8-block mixer stack runs as a single Pallas kernel
(ops/pallas/fused_mlp.py) and the CFG cond/uncond passes are batched, so one
diffusion step is: tiny XLA glue (input/style/timestep projections) + one
fused kernel + output projection.  Used by the sampler; training keeps the
Flax path where autodiff is free.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .mlp_backbone import sinusoidal_table
from .rag import RAG
from ..ops.pallas.fused_mlp import fused_transmlp, pack_transmlp_params

__all__ = ["fused_rag_forward", "make_fused_cfg_denoiser"]


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def fused_rag_forward(
    model: RAG,
    params: Dict,
    x: jnp.ndarray,  # [B, J, F, T]
    t: jnp.ndarray,  # [B]
    cond: Dict[str, jnp.ndarray],
    audio_feats: jnp.ndarray,  # [B, T, 256] (pre-encoded)
    rng: jax.Array,
    packed: Dict | None = None,
    batch_tile: int = 8,
) -> jnp.ndarray:
    """Eval-mode RAG forward returning the x0 prediction [B, J, F, T]."""
    c = model.cfg
    b, nj, nf, nt = x.shape
    if packed is None:
        packed = pack_transmlp_params(params["backbone"], c.num_layers)

    drop = cond.get("cond_drop")
    audio_emb = (
        audio_feats * (1.0 - drop)[:, None, None]
        if drop is not None
        else audio_feats
    )

    frame_idx = jnp.arange(nt)
    seed_mask = (frame_idx < c.n_pre_seq).astype(x.dtype)
    origin_x = cond["origin_x"].astype(x.dtype) * seed_mask[None, None, None, :]
    to_btc = lambda a: a.reshape(b, nj * nf, nt).transpose(0, 2, 1)
    h = jnp.concatenate(
        [
            to_btc(x),
            to_btc(origin_x),
            jnp.broadcast_to(seed_mask[None, :, None], (b, nt, 1)).astype(x.dtype),
            audio_emb,
        ],
        axis=-1,
    )
    h = _dense(params["input_mapping"], h)  # [B, T, D]

    z_ctx = params["speaker_embedding"]["embedding"][cond["vid"]][:, None]
    z_mu = _dense(params["speaker_mu"], z_ctx)
    z_logvar = _dense(params["speaker_logvar"], z_ctx)
    if "style_eps" in cond:
        eps = cond["style_eps"]
    else:
        eps = jax.random.normal(rng, z_mu.shape, z_mu.dtype)
    style = z_mu + eps * jnp.exp(0.5 * z_logvar)

    prefix = [style]
    if c.num_emotions:
        prefix.append(
            params["emotion_embedding"]["embedding"][cond["emo"]][:, None]
        )
    h = jnp.concatenate(prefix + [h], axis=1)  # [B, S, D]

    pe = sinusoidal_table(5000, c.latent_dim)
    te = params["backbone"]["embed_timestep"]
    emb = _dense(te["fc2"], jax.nn.silu(_dense(te["fc1"], pe[t])))  # [B, D]

    out = fused_transmlp(h, emb, packed, act_name=c.mlpact,
                         batch_tile=batch_tile)
    out = out[:, c.n_prefix :]
    out = _dense(params["pose_final"], out)  # [B, T, IF]
    return out.transpose(0, 2, 1).reshape(b, nj, nf, nt)


def make_fused_cfg_denoiser(
    model: RAG,
    params: Dict,
    cond: Dict[str, jnp.ndarray],
    guidance_scale,
    *,
    batch_tile: int = 8,
):
    """CFG denoiser closure on the fused fast path (drop-in for
    cfg.make_cfg_denoiser)."""
    b = cond["vid"].shape[0]
    c = model.cfg
    packed = pack_transmlp_params(params["backbone"], c.num_layers)
    audio_feats = model.apply(
        {"params": params}, cond["audio"], method=model.encode_audio
    )
    audio2 = jnp.concatenate([audio_feats, audio_feats], axis=0)

    cond2 = {
        k: jnp.concatenate([v, v], axis=0)
        for k, v in cond.items()
        if k not in ("audio", "cond_drop")
    }
    cond2["cond_drop"] = jnp.concatenate(
        [jnp.zeros((b,), jnp.float32), jnp.ones((b,), jnp.float32)]
    )

    scale = jnp.asarray(guidance_scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.full((b,), scale)
    scale = scale.reshape(b, 1, 1, 1)

    def denoise_fn(x, t, rng):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out = fused_rag_forward(
            model, params, x2, t2, cond2, audio2, rng,
            packed=packed, batch_tile=batch_tile,
        )
        out_c, out_u = out[:b], out[b:]
        return out_u + scale * (out_c - out_u)

    return denoise_fn
