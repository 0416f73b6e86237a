"""Classifier-free guidance as a *batched* denoiser closure.

Replaces the reference ``ClassifierFreeSampleModel`` (scripts/model/
cfg_sampler.py:8-31), which runs two sequential model calls per step.  Here
cond and uncond fuse into one 2B-batch forward (better MXU utilisation, one
kernel launch), and the audio frontend is encoded once before the diffusion
scan instead of 2x per step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["make_denoiser", "make_cfg_denoiser", "make_guidance_schedule"]


def make_guidance_schedule(name: Optional[str], t_boundary: int):
    """Per-step CFG weight ``w(t) in [0, 1]`` over ORIGINAL-process timesteps.

    The guided combine becomes ``out_u + (1 + (scale-1)*w(t)) * (out_c -
    out_u)``: ``w=1`` reproduces plain CFG, ``w=0`` collapses to the pure
    conditional prediction (scale 1).  Motivation (measured, DESIGN §18): in
    the SAG->RAG composition the sketch's text-borne mode signal survives
    the high-t refinement steps nearly intact and is erased by the last
    low-t steps, where CFG extrapolation (scale>1) amplifies the mode-blind
    conditional direction past the x_t-borne signal.  Decaying w toward 0 as
    t->0 keeps full guidance where rhythm forms and preserves the sketch in
    the fine-detail steps.  The reference exposes only a constant per-sample
    scale (scripts/model/cfg_sampler.py:24-31, ``y['scale']``); the schedule
    generalises it and is exactly constant when ``name`` is None/'const'.

    ``t_boundary`` is the highest original-process timestep the denoiser
    will see (the refinement window's first step for skip>0 compositions,
    else T-1); schedules normalise t by it so 'linear'/'cosine' span the
    executed window regardless of respacing or skip.

    Names: None/'const' -> None (no-op); 'linear' -> w = t/t_boundary;
    'cosine' -> w = 0.5*(1-cos(pi*t/t_boundary)) (slower decay at high t,
    faster near 0); 'step:T0' -> w = 1 if t >= T0 else 0.
    """
    if name is None or name == "const":
        return None
    tb = jnp.float32(max(int(t_boundary), 1))
    if name == "linear":
        return lambda t: jnp.clip(t.astype(jnp.float32) / tb, 0.0, 1.0)
    if name == "cosine":
        return lambda t: 0.5 * (
            1.0 - jnp.cos(jnp.pi * jnp.clip(t.astype(jnp.float32) / tb, 0.0, 1.0))
        )
    if name.startswith("step:"):
        t0 = jnp.float32(float(name.split(":", 1)[1]))
        return lambda t: (t.astype(jnp.float32) >= t0).astype(jnp.float32)
    raise ValueError(
        f"unknown guidance schedule {name!r}; expected 'const', 'linear', "
        "'cosine' or 'step:<t0>'"
    )


def _scheduled_scale(scale, guidance_schedule, t, b):
    """[B,1,1,1] effective scale at original-process timesteps ``t`` [B]."""
    if guidance_schedule is None:
        return scale
    w = guidance_schedule(t).reshape(b, 1, 1, 1)
    return 1.0 + (scale - 1.0) * w


def _bind_rngs(rng):
    r_style, r_mask = jax.random.split(rng)
    return {"style": r_style, "cond_mask": r_mask}


def make_denoiser(model, params, cond: Dict[str, jnp.ndarray]):
    """Unguided denoiser closure: (x, t, rng) -> x0_hat.

    Audio features are hoisted: encoded once here, reused every scan step.
    """
    audio_feats = model.apply(
        {"params": params}, cond["audio"], method=model.encode_audio
    )

    def denoise_fn(x, t, rng):
        out = model.apply(
            {"params": params},
            x,
            t,
            cond,
            train=False,
            audio_feats=audio_feats,
            rngs=_bind_rngs(rng),
        )
        return out["output"]

    return denoise_fn


def make_cfg_denoiser(
    model,
    params,
    cond: Dict[str, jnp.ndarray],
    guidance_scale,
    *,
    batch: Optional[int] = None,
    guidance_schedule=None,
):
    """Guided denoiser closure: out_uncond + scale * (out_cond - out_uncond)
    (cfg_sampler.py:29-31), with both passes batched into one forward.

    ``guidance_scale`` may be a scalar or per-sample [B] array (the reference
    passes ``y['scale']`` per sample, test_RAG_ted.py:70).
    ``guidance_schedule`` (optional, from :func:`make_guidance_schedule`)
    modulates the scale per timestep: ``1 + (scale-1)*w(t)``.
    """
    b = batch if batch is not None else cond["vid"].shape[0]
    audio_feats = model.apply(
        {"params": params}, cond["audio"], method=model.encode_audio
    )
    audio_feats2 = jnp.concatenate([audio_feats, audio_feats], axis=0)

    def dup(v):
        return jnp.concatenate([v, v], axis=0)

    cond2 = {k: dup(v) for k, v in cond.items() if k not in ("audio", "cond_drop")}
    # First half conditioned, second half unconditioned (audio zeroed).
    cond2["cond_drop"] = jnp.concatenate(
        [jnp.zeros((b,), jnp.float32), jnp.ones((b,), jnp.float32)], axis=0
    )

    scale = jnp.asarray(guidance_scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.full((b,), scale)
    scale = scale.reshape(b, 1, 1, 1)

    def denoise_fn(x, t, rng):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out = model.apply(
            {"params": params},
            x2,
            t2,
            cond2,
            train=False,
            audio_feats=audio_feats2,
            rngs=_bind_rngs(rng),
        )["output"]
        out_cond, out_uncond = out[:b], out[b:]
        s = _scheduled_scale(scale, guidance_schedule, t, b)
        return out_uncond + s * (out_cond - out_uncond)

    return denoise_fn
