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

__all__ = ["make_denoiser", "make_cfg_denoiser"]


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
):
    """Guided denoiser closure: out_uncond + scale * (out_cond - out_uncond)
    (cfg_sampler.py:29-31), with both passes batched into one forward.

    ``guidance_scale`` may be a scalar or per-sample [B] array (the reference
    passes ``y['scale']`` per sample, test_RAG_ted.py:70).
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
        return out_uncond + scale * (out_cond - out_uncond)

    return denoise_fn
