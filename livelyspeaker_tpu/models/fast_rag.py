"""Inference fast path: RAG forward with the fused Pallas backbone.

Numerically equivalent to ``RAG.__call__`` (eval mode) — same params, same
math — but the 8-block mixer stack (+ the final pose projection) runs as a
single Pallas kernel (ops/pallas/fused_mlp.py) and the CFG cond/uncond
passes are batched.

Everything t-invariant is hoisted OUT of the per-step work and computed
once per clip batch (``precompute_rag_static``):

- the audio encoding (the reference recomputes it every step,
  ``scripts/model/RAG.py:106``);
- the [origin_x ‖ indicator-bit ‖ audio] share of the input projection —
  ``Linear(concat(a, b))`` splits as ``a @ W_a + b @ W_b``, and only the
  ``x_t`` share changes per step (InputProcess, RAG.py:176-192);
- the timestep-embedding MLP, evaluated for ALL table entries once so each
  step is a gather instead of two matmuls (TimestepEmbedder,
  mlp_module.py:123-136).

One diffusion step is then: one [B,T,27]x[27,D] matmul + style token + one
fused kernel.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from .cfg import _scheduled_scale as _cfg_scheduled_scale
from .mlp_backbone import sinusoidal_table
from .rag import RAG
from ..ops.pallas.fused_mlp import (
    fused_transmlp,
    pack_out_proj,
    pack_transmlp_params,
)

__all__ = ["fused_rag_forward", "make_fused_cfg_denoiser",
           "precompute_rag_static"]


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


class RAGStatic(NamedTuple):
    """Per-clip-batch precomputation shared by every diffusion step."""

    packed: Dict  # fused-kernel weight stack
    out_proj: Dict  # padded pose_final for in-kernel fusion
    w_x: jnp.ndarray  # input_mapping rows for the x_t block [IF, D]
    static_h: jnp.ndarray  # (origin | bit | audio) @ W_rest + bias [B, T, D]
    emb_table: jnp.ndarray  # timestep-MLP applied to the whole PE table [N, D]
    seed_mask: jnp.ndarray  # [T]


def precompute_rag_static(
    model: RAG,
    params: Dict,
    cond: Dict[str, jnp.ndarray],
    audio_feats: jnp.ndarray,  # [B, T, 256]
) -> RAGStatic:
    c = model.cfg
    nt = c.nframes
    in_feats = c.njoints * c.nfeats

    # fold_ln2: LN2's affine lives in the channel-mix weights (exact
    # algebra; 2 fewer VPU ops/element on the measured bound unit)
    packed = pack_transmlp_params(
        params["backbone"], c.num_layers, fold_ln2=True
    )
    out_proj = pack_out_proj(
        params["pose_final"]["kernel"], params["pose_final"]["bias"]
    )

    drop = cond.get("cond_drop")
    audio_emb = (
        audio_feats * (1.0 - drop)[:, None, None]
        if drop is not None
        else audio_feats
    )
    b = audio_emb.shape[0]
    dt = audio_emb.dtype

    frame_idx = jnp.arange(nt)
    seed_mask = (frame_idx < c.n_pre_seq).astype(dt)
    origin_x = cond["origin_x"].astype(dt) * seed_mask[None, None, None, :]
    to_btc = lambda a: a.reshape(b, in_feats, nt).transpose(0, 2, 1)
    rest = jnp.concatenate(
        [
            to_btc(origin_x),
            jnp.broadcast_to(seed_mask[None, :, None], (b, nt, 1)).astype(dt),
            audio_emb,
        ],
        axis=-1,
    )
    w = params["input_mapping"]["kernel"]
    w_x, w_rest = w[:in_feats], w[in_feats:]
    static_h = rest @ w_rest + params["input_mapping"]["bias"]

    pe = sinusoidal_table(5000, c.latent_dim)
    te = params["backbone"]["embed_timestep"]
    emb_table = _dense(te["fc2"], jax.nn.silu(_dense(te["fc1"], pe)))

    return RAGStatic(
        packed=packed,
        out_proj=out_proj,
        w_x=w_x,
        static_h=static_h,
        emb_table=emb_table,
        seed_mask=seed_mask,
    )


def _forward_from_static(
    model: RAG,
    params: Dict,
    static: RAGStatic,
    x: jnp.ndarray,  # [B, J, F, T]
    t: jnp.ndarray,  # [B]
    cond: Dict[str, jnp.ndarray],
    rng: jax.Array,
    batch_tile: int = 8,
) -> jnp.ndarray:
    c = model.cfg
    b, nj, nf, nt = x.shape
    h = (
        x.reshape(b, nj * nf, nt).transpose(0, 2, 1) @ static.w_x
        + static.static_h
    )  # [B, T, D]

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

    emb = static.emb_table[t]  # [B, D]
    out = fused_transmlp(
        h, emb, static.packed, act_name=c.mlpact, batch_tile=batch_tile,
        out_proj=static.out_proj,
    )  # [B, S, P] — pose projection fused in
    out = out[:, c.n_prefix :, : nj * nf]
    return out.transpose(0, 2, 1).reshape(b, nj, nf, nt)


def fused_rag_forward(
    model: RAG,
    params: Dict,
    x: jnp.ndarray,  # [B, J, F, T]
    t: jnp.ndarray,  # [B]
    cond: Dict[str, jnp.ndarray],
    audio_feats: jnp.ndarray,  # [B, T, 256] (pre-encoded)
    rng: jax.Array,
    packed: Dict | None = None,  # kept for API compat; superseded by static
    batch_tile: int = 8,
) -> jnp.ndarray:
    """Eval-mode RAG forward returning the x0 prediction [B, J, F, T]."""
    static = precompute_rag_static(model, params, cond, audio_feats)
    return _forward_from_static(
        model, params, static, x, t, cond, rng, batch_tile=batch_tile
    )


def make_fused_cfg_denoiser(
    model: RAG,
    params: Dict,
    cond: Dict[str, jnp.ndarray],
    guidance_scale,
    *,
    batch_tile: int = 8,
    guidance_schedule=None,
):
    """CFG denoiser closure on the fused fast path (drop-in for
    cfg.make_cfg_denoiser).  All t-invariant work happens here, once.
    ``guidance_schedule`` modulates the scale per timestep exactly as in
    cfg.make_cfg_denoiser (see cfg.make_guidance_schedule)."""
    b = cond["vid"].shape[0]
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
    static = precompute_rag_static(model, params, cond2, audio2)

    scale = jnp.asarray(guidance_scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.full((b,), scale)
    scale = scale.reshape(b, 1, 1, 1)

    def denoise_fn(x, t, rng):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out = _forward_from_static(
            model, params, static, x2, t2, cond2, rng,
            batch_tile=batch_tile,
        )
        out_c, out_u = out[:b], out[b:]
        s = _cfg_scheduled_scale(scale, guidance_schedule, t, b)
        return out_u + s * (out_c - out_u)

    return denoise_fn
