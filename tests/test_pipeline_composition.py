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


def test_beat_full_composition_sweep(tmp_path, rng_np):
    """End-to-end BEAT LivelySpeaker composition on synthetic records:
    sentence -> CLIP -> SAG(47x6) sketch -> skip-step RAG refinement ->
    FID + SRGR + alignment + diversity (the eval_livelyspeaker_beat.py
    protocol, reference test_LivelySpeaker_beat.py:77-177)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from eval_livelyspeaker_beat import run_sweep

    from livelyspeaker_tpu.data import DataLoader
    from livelyspeaker_tpu.data.beat import BeatWindowDataset
    from livelyspeaker_tpu.data.synthetic import build_synthetic_beat_records
    from livelyspeaker_tpu.models.embedding_net import BeatEmbeddingEncoder

    d = str(tmp_path / "beat_records")
    n = build_synthetic_beat_records(d, n_clips=2, clip_seconds=4.0)
    assert n > 0
    ds = BeatWindowDataset(d)
    assert "sentence" in ds[0], "synthetic BEAT windows must carry sentences"
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True,
                        seed=233)

    cfg = RAGConfig.beat(latent_dim=64, num_layers=2, n_speakers=30)
    rag = RAG(cfg)
    b0 = ds.batch([0, 1])
    cond0 = {
        "audio": jnp.asarray(b0["audio"]),
        "vid": jnp.asarray(b0["vid"]),
        "emo": jnp.asarray(b0["emo"]),
        "origin_x": jnp.asarray(b0["motion"]),
    }
    rag_params = rag.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.asarray(b0["motion"]),
        jnp.zeros((2,), jnp.int32),
        cond0,
    )["params"]

    sag = SAG(njoints=47, nfeats=6, latent_dim=64, ff_size=128, num_layers=1)
    sag_params = sag.init(
        jax.random.PRNGKey(2), jnp.zeros((2, 47, 6, T))
    )["params"]
    ccfg = CLIPTextConfig(
        vocab_size=49408, context_length=77, width=64, layers=2, heads=4,
        embed_dim=64,
    )
    clip_model = CLIPTextEncoder(ccfg)
    clip_params = clip_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    pipe = LivelySpeakerPipeline(
        rag, rag_params, sag, sag_params, clip_model, clip_params,
        HashTokenizer(),
        steps=100,
        timestep_respacing="ddim10",
        skip_timesteps=8,  # 2 live refinement steps
    )

    enc = BeatEmbeddingEncoder()
    enc_params = enc.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 34, 282))
    )["params"]
    embed = jax.jit(lambda p: enc.apply({"params": enc_params}, p))

    results = run_sweep(ds, loader, pipe, embed, 47, 34, guidances=(1.0,))
    (guidance, fid, align, div, srgr) = results[0]
    assert guidance == 1.0
    assert np.isfinite(fid)
    assert np.isfinite(srgr) and 0.0 <= srgr <= 1.0
    assert np.isfinite(align)
    assert np.isfinite(div)


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


def test_composition_mesh_matches_single_device(rng_np):
    """LivelySpeakerPipeline(mesh=...) is a placement decision: every stage
    (CLIP encode, SAG decode, RAG refinement) runs under GSPMD shardings and
    the composed output reproduces the single-device program (same key
    stream; tolerance covers resharding-induced accumulation-order drift,
    as in test_rag_sampler_mesh_matches_single_device)."""
    from livelyspeaker_tpu.parallel import create_mesh

    rag, rag_params, sag, sag_params, clip_model, clip_params, cond = (
        _tiny_models(rng_np)
    )
    kw = dict(steps=100, timestep_respacing="ddim10", skip_timesteps=8)
    sentences = ['A person is talking: "hello there"'] * B
    key = jax.random.PRNGKey(7)

    ref_pipe = LivelySpeakerPipeline(
        rag, rag_params, sag, sag_params, clip_model, clip_params,
        HashTokenizer(), **kw,
    )
    ref = ref_pipe(sentences, cond, key, guidance=1.5)

    mesh = create_mesh(n_devices=2)
    dp_pipe = LivelySpeakerPipeline(
        rag, rag_params, sag, sag_params, clip_model, clip_params,
        HashTokenizer(), mesh=mesh, **kw,
    )
    out = dp_pipe(sentences, cond, key, guidance=1.5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_guidance_schedule_weights():
    """Schedule math: w(t) in [0,1], correct endpoints, const is a no-op."""
    from livelyspeaker_tpu.models import make_guidance_schedule

    assert make_guidance_schedule(None, 199) is None
    assert make_guidance_schedule("const", 199) is None

    t = jnp.asarray([0, 50, 100, 199, 250], jnp.int32)
    lin = make_guidance_schedule("linear", 199)(t)
    np.testing.assert_allclose(
        np.asarray(lin), [0.0, 50 / 199, 100 / 199, 1.0, 1.0], rtol=1e-6
    )
    cos = make_guidance_schedule("cosine", 199)(t)
    assert float(cos[0]) == 0.0 and float(cos[3]) == 1.0
    assert np.all(np.diff(np.asarray(cos)) >= 0)  # monotone in t
    step = make_guidance_schedule("step:100", 199)(t)
    np.testing.assert_array_equal(np.asarray(step), [0, 0, 1, 1, 1])

    import pytest

    with pytest.raises(ValueError):
        make_guidance_schedule("bogus", 199)


def test_guidance_schedule_sampler_semantics(rng_np):
    """RAGSampler(guidance_schedule=...): 'step:0' (w=1 everywhere) matches
    the unscheduled path bit-for-bit; 'step:<above boundary>' (w=0
    everywhere) matches guidance=1.0 unscheduled — the two analytic
    endpoints of effective_scale = 1 + (scale-1)*w(t)."""
    rag, rag_params, *_ , cond = _tiny_models(rng_np)
    key = jax.random.PRNGKey(11)
    kw = dict(steps=100, timestep_respacing="ddim10", method="ddim")

    base = RAGSampler(rag, rag_params, **kw)
    ref15 = base(cond, key, guidance=1.5)
    ref10 = base(cond, key, guidance=1.0)

    full = RAGSampler(rag, rag_params, guidance_schedule="step:0", **kw)
    np.testing.assert_array_equal(
        np.asarray(full(cond, key, guidance=1.5)), np.asarray(ref15)
    )
    none = RAGSampler(rag, rag_params, guidance_schedule="step:1000", **kw)
    np.testing.assert_allclose(
        np.asarray(none(cond, key, guidance=1.5)), np.asarray(ref10),
        rtol=1e-6, atol=1e-6,
    )
    # a real decaying schedule runs, is finite, and differs from both ends
    lin = RAGSampler(rag, rag_params, guidance_schedule="linear", **kw)
    out = np.asarray(lin(cond, key, guidance=1.5))
    assert np.isfinite(out).all()
    assert not np.allclose(out, np.asarray(ref15))
    assert not np.allclose(out, np.asarray(ref10))


def test_guidance_schedule_fused_matches_xla(rng_np):
    """The fused-denoiser path applies the identical schedule modulation
    (style eps pinned so both paths see the same noise)."""
    from jax.experimental.pallas import tpu as pltpu

    from livelyspeaker_tpu.models import make_cfg_denoiser
    from livelyspeaker_tpu.models import make_guidance_schedule
    from livelyspeaker_tpu.models.fast_rag import make_fused_cfg_denoiser

    cfg = RAGConfig.ted(latent_dim=128, num_layers=2)
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
        "style_eps": jnp.zeros((B, 1, cfg.latent_dim)),
    }
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    t = jnp.asarray([7, 63], jnp.int32)
    rag_params = rag.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x, jnp.zeros((B,), jnp.int32), cond,
    )["params"]

    gs = make_guidance_schedule("linear", 99)
    key = jax.random.PRNGKey(3)
    ref = make_cfg_denoiser(rag, rag_params, cond, 1.5, guidance_schedule=gs)(
        x, t, key
    )
    with pltpu.force_tpu_interpret_mode():
        fused = make_fused_cfg_denoiser(
            rag, rag_params, cond, 1.5, guidance_schedule=gs, batch_tile=4
        )(x, t, key)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=5e-4
    )


def test_full_composition_fused_matches_xla(rng_np):
    """use_fused=True on the PIPELINE (round 5: composition rides the same
    Pallas fast path as plain serving) matches the XLA composition."""
    rag, rag_params, sag, sag_params, clip_model, clip_params, cond = (
        _tiny_models(rng_np)
    )
    kw = dict(
        steps=100, timestep_respacing="ddim10", skip_timesteps=8,
    )
    # pin the speaker-VAE noise: fused/XLA draw style from different rng
    # plumbing (see test_multichip), and the parity claim is about the
    # denoiser math, not the stream layout
    cond = dict(
        cond,
        style_eps=jnp.asarray(
            rng_np.normal(size=(B, 1, 64)).astype(np.float32)
        ),
    )
    sentences = ['A person is talking: "hello there"'] * B
    outs = {}
    from jax.experimental.pallas import tpu as pltpu

    for fused in (False, True):
        pipe = LivelySpeakerPipeline(
            rag, rag_params, sag, sag_params, clip_model, clip_params,
            HashTokenizer(), use_fused=fused, **kw,
        )
        # CPU hosts need pallas interpret mode (kernel math itself is
        # covered by test_pallas_kernels.py + the on-device bench gate)
        import contextlib

        ctx = (pltpu.force_tpu_interpret_mode() if fused
               and jax.devices()[0].platform != "tpu"
               else contextlib.nullcontext())
        with ctx:
            outs[fused] = np.asarray(
                pipe(sentences, cond, jax.random.PRNGKey(7), guidance=1.5)
            )
        assert np.isfinite(outs[fused]).all()
    np.testing.assert_allclose(outs[True], outs[False], atol=5e-4)


