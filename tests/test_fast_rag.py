"""Fused fast-path parity: fused_rag_forward must equal the Flax RAG forward
(with controlled style eps), for TED and BEAT configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.models.fast_rag import (
    fused_rag_forward,
    make_fused_cfg_denoiser,
)
from livelyspeaker_tpu.models.cfg import make_cfg_denoiser


@pytest.mark.parametrize("variant", ["ted", "beat"])
def test_fused_forward_matches_flax(rng_np, variant):
    if variant == "ted":
        cfg = RAGConfig.ted(latent_dim=128, num_layers=2)
    else:
        cfg = RAGConfig.beat(latent_dim=128, num_layers=2, n_speakers=30)
    model = RAG(cfg)
    b = 3
    cond = {
        "audio": jnp.asarray(
            rng_np.normal(size=(b, audio_samples_for_frames(34))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng_np.integers(0, cfg.n_speakers, size=(b,))),
        "origin_x": jnp.asarray(
            rng_np.normal(size=(b, cfg.njoints, cfg.nfeats, 34)).astype(
                np.float32
            )
        ),
        "style_eps": jnp.asarray(
            rng_np.normal(size=(b, 1, cfg.latent_dim)).astype(np.float32)
        ),
    }
    if cfg.num_emotions:
        cond["emo"] = jnp.asarray(rng_np.integers(0, 8, size=(b,)))
    x = jnp.asarray(
        rng_np.normal(size=(b, cfg.njoints, cfg.nfeats, 34)).astype(np.float32)
    )
    t = jnp.asarray([0, 500, 999])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x,
        t,
        cond,
    )["params"]

    ref = model.apply({"params": params}, x, t, cond)["output"]
    af = model.apply({"params": params}, cond["audio"], method=model.encode_audio)
    with pltpu.force_tpu_interpret_mode():
        out = fused_rag_forward(
            model, params, x, t, cond, af, jax.random.PRNGKey(2), batch_tile=4
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


def test_fused_cfg_denoiser_matches_flax_cfg(rng_np):
    cfg = RAGConfig.ted(latent_dim=128, num_layers=2)
    model = RAG(cfg)
    b = 2
    cond = {
        "audio": jnp.asarray(
            rng_np.normal(size=(b, audio_samples_for_frames(34))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng_np.integers(0, cfg.n_speakers, size=(b,))),
        "origin_x": jnp.asarray(
            rng_np.normal(size=(b, 9, 3, 34)).astype(np.float32)
        ),
        "style_eps": jnp.zeros((b, 1, cfg.latent_dim)),
    }
    x = jnp.asarray(rng_np.normal(size=(b, 9, 3, 34)).astype(np.float32))
    t = jnp.asarray([4, 9])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x,
        t,
        cond,
    )["params"]

    ref_den = make_cfg_denoiser(model, params, cond, 1.7)
    ref = ref_den(x, t, jax.random.PRNGKey(5))
    fast_den = make_fused_cfg_denoiser(model, params, cond, 1.7, batch_tile=4)
    with pltpu.force_tpu_interpret_mode():
        out = fast_den(x, t, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_guidance_sweep_reuses_one_executable():
    """The eval guidance sweep (test_RAG_ted.py:183-193) must not recompile:
    guidance is a traced argument, so one jitted sampler serves all scales."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )
    from livelyspeaker_tpu.pipeline import RAGSampler

    cfg = RAGConfig(latent_dim=32, num_layers=1, n_speakers=4)
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    cond = {
        "audio": jnp.asarray(
            rng.normal(size=(2, audio_samples_for_frames(nf))).astype(
                np.float32
            )
        ),
        "vid": jnp.zeros((2,), jnp.int32),
        "origin_x": jnp.zeros((2, cfg.njoints, cfg.nfeats, nf)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        cond["origin_x"], jnp.zeros((2,), jnp.int32), cond,
    )["params"]
    sampler = RAGSampler(model, params, steps=20,
                         timestep_respacing="ddim4", method="ddim")
    outs = [
        np.asarray(sampler(cond, jax.random.PRNGKey(1), guidance=g))
        for g in (1.0, 1.5, 2.0)
    ]
    assert len(sampler._jitted) == 1  # one executable for the whole sweep
    assert not np.allclose(outs[0], outs[2])  # scale actually traced in
