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
    n_windows = (int(len(audio) * 15 / 16000) - pre) // hop
    assert out.shape == (cfg.njoints, cfg.nfeats, pre + n_windows * hop)
    assert np.isfinite(out).all()
    # the stream must not be constant across window boundaries (real content)
    assert out[:, :, hop - 1 : hop + 1].std() > 0


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
