"""End-to-end LivelySpeaker composition test with tiny models on the CPU
mesh: text -> CLIP -> SAG sketch -> skip-timestep RAG refinement."""

import numpy as np
import jax
import jax.numpy as jnp

from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from livelyspeaker_tpu.models.sag import SAG
from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline, RAGSampler

B, T = 2, 34


def _tiny_models(rng_np):
    cfg = RAGConfig.ted(latent_dim=64, num_layers=2)
    rag = RAG(cfg)
    cond = {
        "audio": jnp.asarray(
            rng_np.normal(size=(B, audio_samples_for_frames(T))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng_np.integers(0, 1400, size=(B,))),
        "origin_x": jnp.asarray(
            rng_np.normal(size=(B, 9, 3, T)).astype(np.float32)
        ),
    }
    rag_params = rag.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.zeros((B, 9, 3, T)),
        jnp.zeros((B,), jnp.int32),
        cond,
    )["params"]

    sag = SAG(latent_dim=64, ff_size=128, num_layers=1)
    sag_params = sag.init(
        jax.random.PRNGKey(2), jnp.zeros((B, 9, 3, T))
    )["params"]

    ccfg = CLIPTextConfig(
        vocab_size=49408, context_length=77, width=64, layers=2, heads=4,
        embed_dim=64,
    )
    clip_model = CLIPTextEncoder(ccfg)
    clip_params = clip_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    return rag, rag_params, sag, sag_params, clip_model, clip_params, cond


def test_full_composition(rng_np):
    rag, rag_params, sag, sag_params, clip_model, clip_params, cond = (
        _tiny_models(rng_np)
    )
    pipe = LivelySpeakerPipeline(
        rag,
        rag_params,
        sag,
        sag_params,
        clip_model,
        clip_params,
        HashTokenizer(),
        steps=100,
        timestep_respacing="ddim10",
        skip_timesteps=8,  # 2 live steps of the 10-step chain
    )
    sentences = ['A person is talking: "hello there"'] * B
    out = pipe(sentences, cond, jax.random.PRNGKey(7), guidance=1.5)
    assert out.shape == (B, 9, 3, T)
    assert bool(jnp.isfinite(out).all())

    # the SAG sketch alone
    sketch = pipe.semantic_sketch(sentences, cond["origin_x"])
    assert sketch.shape == (B, 9, 3, T)
    # different text -> different sketch (CLIP conditioning flows through)
    sketch2 = pipe.semantic_sketch(
        ['A person is talking: "completely different words"'] * B,
        cond["origin_x"],
    )
    assert not np.allclose(np.asarray(sketch), np.asarray(sketch2))


def test_rag_sampler_inpainting(rng_np):
    """Seed-frame inpainting through the sampler (test-time constraint path,
    gaussian_diffusion.py:314-320)."""
    from livelyspeaker_tpu.diffusion import Inpainting

    rag, rag_params, *_, cond = _tiny_models(rng_np)
    sampler = RAGSampler(
        rag, rag_params, steps=50, timestep_respacing=None, method="ddpm"
    )
    mask = jnp.zeros((B, 9, 3, T), bool).at[..., :4].set(True)
    motion = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    out = sampler(
        cond,
        jax.random.PRNGKey(0),
        guidance=1.0,
        inpainting=Inpainting(mask, motion, noised=True),
    )
    assert bool(jnp.isfinite(out).all())
    # BEAT-style blend (un-noised constraint) pins the masked frames exactly
    out2 = sampler(
        cond,
        jax.random.PRNGKey(0),
        guidance=1.0,
        inpainting=Inpainting(mask, motion, noised=False),
    )
    np.testing.assert_allclose(
        np.asarray(out2[..., :4]), np.asarray(motion[..., :4]), atol=1e-5
    )
