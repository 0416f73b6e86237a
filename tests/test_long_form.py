"""Long-form generation: arbitrary audio length -> stitched gesture stream."""

import numpy as np
import jax
import jax.numpy as jnp

from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.pipeline import RAGSampler, generate_long_form


def _tiny_sampler():
    cfg = RAGConfig(latent_dim=32, num_layers=1, n_speakers=4)
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    cond = {
        "audio": jnp.zeros((1, audio_samples_for_frames(nf))),
        "vid": jnp.zeros((1,), jnp.int32),
        "origin_x": jnp.zeros((1, cfg.njoints, cfg.nfeats, nf)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.asarray(rng.normal(size=(1, cfg.njoints, cfg.nfeats, nf)),
                    jnp.float32),
        jnp.zeros((1,), jnp.int32),
        cond,
    )["params"]
    return RAGSampler(
        model, params, steps=20, timestep_respacing="ddim4", method="ddim"
    ), cfg


def test_long_form_shapes_and_stitching():
    sampler, cfg = _tiny_sampler()
    nf, pre = cfg.nframes, cfg.n_pre_seq
    hop = nf - pre
    # ~100 frames of audio -> 3 windows -> 4 + 3*30 = 94 frames out.
    audio = np.random.default_rng(1).normal(size=int(100 / 15 * 16000)).astype(
        np.float32
    )
    out = generate_long_form(
        sampler, audio, speaker=1, rng=jax.random.PRNGKey(0), guidance=1.0
    )
    # every audio frame gets motion: total = int(len(audio) * fps / sr)
    assert out.shape == (cfg.njoints, cfg.nfeats, int(len(audio) * 15 / 16000))
    assert np.isfinite(out).all()
    # the stream must not be constant across window boundaries (real content)
    assert out[:, :, hop - 1 : hop + 1].std() > 0


def test_long_form_covers_audio_tail_exactly():
    """Audio lengths that don't land on the window grid still get motion for
    every frame (the last window is zero-padded then cropped)."""
    sampler, cfg = _tiny_sampler()
    nf, pre = cfg.nframes, cfg.n_pre_seq
    hop = nf - pre
    for extra in (1, hop // 2, hop - 1):  # worst case: hop-1 tail frames
        frames = nf + hop + extra
        audio = np.zeros(int(frames / 15 * 16000) + 8, np.float32)
        total = int(len(audio) * 15 / 16000)
        out = generate_long_form(
            sampler, audio, speaker=0, rng=jax.random.PRNGKey(2)
        )
        assert out.shape[-1] == total, (extra, out.shape[-1], total)
        assert np.isfinite(out).all()


def test_long_form_single_window_short_audio():
    sampler, cfg = _tiny_sampler()
    out = generate_long_form(
        sampler,
        np.zeros(1000, np.float32),  # far less than one window of audio
        speaker=0,
        rng=jax.random.PRNGKey(0),
    )
    assert out.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
    assert np.isfinite(out).all()


def test_long_form_seed_frames_condition_next_window():
    """The second window must actually see the first window's tail: zeroing
    the seed changes its output."""
    sampler, cfg = _tiny_sampler()
    nf, pre = cfg.nframes, cfg.n_pre_seq
    rng = np.random.default_rng(2)
    win_samples = audio_samples_for_frames(nf)
    wav = rng.normal(size=win_samples).astype(np.float32)

    seed = np.zeros((1, cfg.njoints, cfg.nfeats, nf), np.float32)
    seed[0, :, :, :pre] = rng.normal(size=(cfg.njoints, cfg.nfeats, pre))
    cond_seeded = {
        "audio": jnp.asarray(wav)[None],
        "vid": jnp.zeros((1,), jnp.int32),
        "origin_x": jnp.asarray(seed),
    }
    cond_zero = dict(cond_seeded, origin_x=jnp.zeros_like(cond_seeded["origin_x"]))
    k = jax.random.PRNGKey(3)
    a = np.asarray(sampler(cond_seeded, k, guidance=1.0))
    b = np.asarray(sampler(cond_zero, k, guidance=1.0))
    assert not np.allclose(a, b)


def test_long_form_with_composition_pipeline():
    """Long-form with a SAG composition: each window gets a text-conditioned
    sketch, refined by the last skip_timesteps, stitched via seed frames."""
    import jax.numpy as jnp

    from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
    from livelyspeaker_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from livelyspeaker_tpu.models.sag import SAG
    from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline

    sampler, cfg = _tiny_sampler()
    sag = SAG(njoints=cfg.njoints, nfeats=cfg.nfeats, latent_dim=32,
              ff_size=64, num_layers=1, num_heads=2)
    x0 = jnp.zeros((1, cfg.njoints, cfg.nfeats, cfg.nframes))
    sag_params = sag.init(jax.random.PRNGKey(2), x0)["params"]
    clip_model = CLIPTextEncoder(
        CLIPTextConfig(width=32, layers=1, heads=2, embed_dim=32)
    )
    clip_params = clip_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    pipe = LivelySpeakerPipeline(
        sampler.model, sampler.params, sag, sag_params, clip_model,
        clip_params, HashTokenizer(), steps=20,
        timestep_respacing="ddim4", skip_timesteps=2,
    )
    audio = np.random.default_rng(3).normal(size=int(80 / 15 * 16000)).astype(
        np.float32
    )
    out = generate_long_form(
        pipe.rag_sampler, audio, speaker=0, rng=jax.random.PRNGKey(1),
        pipeline=pipe, sentences=["waves a hand", "points left"],
    )
    assert out.shape == (
        cfg.njoints, cfg.nfeats, int(len(audio) * 15 / 16000)
    )
    assert np.isfinite(out).all()


def test_stream_chunks_concatenate_to_batch_result():
    """The streaming generator must reproduce generate_long_form exactly
    (same key schedule), chunk by chunk."""
    from livelyspeaker_tpu.pipeline import generate_long_form_stream

    sampler, cfg = _tiny_sampler()
    audio = np.random.default_rng(5).normal(size=int(100 / 15 * 16000)).astype(
        np.float32
    )
    whole = generate_long_form(
        sampler, audio, speaker=1, rng=jax.random.PRNGKey(4), guidance=1.0
    )
    chunks = list(
        generate_long_form_stream(
            sampler, audio, speaker=1, rng=jax.random.PRNGKey(4), guidance=1.0
        )
    )
    assert [w for w, _ in chunks] == list(range(len(chunks)))
    assert chunks[0][1].shape[-1] == cfg.nframes
    # middle chunks are full hops; the final one may be cropped to land
    # exactly on int(len(audio) * fps / sr) total frames
    assert all(
        c.shape[-1] == cfg.nframes - cfg.n_pre_seq for _, c in chunks[1:-1]
    )
    assert sum(c.shape[-1] for _, c in chunks) == int(len(audio) * 15 / 16000)
    np.testing.assert_array_equal(
        np.concatenate([c for _, c in chunks], axis=-1), whole
    )


def test_seam_report_detects_injected_discontinuity():
    """long_form_seam_report: smooth motion scores ratio ~1; motion with a
    jump injected exactly at the window seams scores ratio >> 1, and the
    seam boundaries land where the window grid puts them."""
    from livelyspeaker_tpu.eval.metrics import long_form_seam_report

    nf, pre = 34, 4
    hop = nf - pre
    t_total = nf + 3 * hop  # 4 windows
    rng = np.random.default_rng(0)
    # Smooth base motion: sum of slow sinusoids per channel.
    tgrid = np.arange(t_total) / 15.0
    j, f = 9, 3
    phases = rng.uniform(0, 2 * np.pi, size=(j, f, 1))
    freqs = rng.uniform(0.3, 1.0, size=(j, f, 1))
    smooth = np.sin(2 * np.pi * freqs * tgrid[None, None, :] + phases)

    rep = long_form_seam_report(smooth, nf, pre)
    assert rep["n_seams"] == 3
    assert 0.3 < rep["ratio_p95"] < 1.7, rep

    # Inject a jump at each seam crossing: frames >= each seam start get a
    # constant offset, so only the seam boundary velocity spikes.
    jumpy = smooth.copy()
    for w in range(1, 4):
        jumpy[:, :, nf + (w - 1) * hop :] += 2.0
    rep_j = long_form_seam_report(jumpy, nf, pre)
    assert rep_j["ratio_p95"] > 5.0, rep_j
    np.testing.assert_allclose(rep_j["within_p95"], rep["within_p95"],
                               rtol=1e-12)


def test_seam_report_single_window():
    from livelyspeaker_tpu.eval.metrics import long_form_seam_report

    rep = long_form_seam_report(np.zeros((9, 3, 34)), 34, 4)
    assert rep["n_seams"] == 0 and np.isnan(rep["ratio_p95"])


def test_long_form_beat_emotion_conditioned():
    """Emotion-conditioned BEAT models need cond['emo'] in every window
    (models/rag.py:240); generate_long_form threads ``emotion=`` through."""
    cfg = RAGConfig.beat(latent_dim=32, num_layers=1, n_speakers=4)
    model = RAG(cfg)
    nf = cfg.nframes
    cond = {
        "audio": jnp.zeros((1, audio_samples_for_frames(nf))),
        "vid": jnp.zeros((1,), jnp.int32),
        "origin_x": jnp.zeros((1, cfg.njoints, cfg.nfeats, nf)),
        "emo": jnp.zeros((1,), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.zeros((1, cfg.njoints, cfg.nfeats, nf)),
        jnp.zeros((1,), jnp.int32),
        cond,
    )["params"]
    # the reference inits ALL emotion rows to the same 1e-6 constant
    # (RAG.py:67 pattern) — give them distinct values so conditioning on a
    # different id is observable on an untrained model
    params = dict(params)
    params["emotion_embedding"] = {
        "embedding": jax.random.normal(
            jax.random.PRNGKey(9), (cfg.num_emotions, cfg.latent_dim)
        )
    }
    sampler = RAGSampler(
        model, params, steps=20, timestep_respacing="ddim4", method="ddim"
    )
    audio = np.random.default_rng(2).normal(size=int(60 / 15 * 16000)).astype(
        np.float32
    )
    out = generate_long_form(
        sampler, audio, speaker=2, rng=jax.random.PRNGKey(0), guidance=1.0,
        emotion=3,
    )
    assert out.shape == (cfg.njoints, cfg.nfeats, int(len(audio) * 15 / 16000))
    assert np.isfinite(out).all()
    # the emotion token must actually reach the denoiser: different ids at
    # identical keys/audio give different motion
    out2 = generate_long_form(
        sampler, audio, speaker=2, rng=jax.random.PRNGKey(0), guidance=1.0,
        emotion=5,
    )
    assert np.abs(out - out2).max() > 1e-6
