"""Progressive distillation: target math identity, learning, sampling.

The machinery lives in experiments/distillation (demoted after four
measured no-headroom operating points — see its README); these tests keep
the oracle-identity math honest while it sits there.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from experiments.distillation import distill_targets, make_distill_step

from livelyspeaker_tpu.diffusion import (
    DiffusionSchedule,
    q_sample,
    sample_loop,
)
from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames


def test_distill_target_identity_with_perfect_teacher():
    """With a teacher that returns the TRUE x0, the one-step target equals
    that x0 exactly (two perfect DDIM steps land where one perfect step
    lands — Salimans & Ho eq. 7)."""
    sched = DiffusionSchedule.create(steps=64, schedule="cosine")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 2, 3, 5)).astype(np.float32))
    t = jnp.asarray([2, 17, 40, 63])
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    x_t = q_sample(sched, x0, t, noise)

    teacher = lambda x, tt: x0  # oracle
    target, w = distill_targets(sched, teacher, x_t, t)
    np.testing.assert_allclose(np.asarray(target), np.asarray(x0), atol=1e-3)
    assert (np.asarray(w) >= 1.0).all()


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = RAGConfig(latent_dim=32, num_layers=1, n_speakers=4)
    model = RAG(cfg)
    rng = np.random.default_rng(1)
    nf = cfg.nframes
    batch = {
        "motion": jnp.asarray(
            rng.normal(size=(8, cfg.njoints, cfg.nfeats, nf)).astype(
                np.float32
            )
            * 0.3
        ),
        "audio": jnp.asarray(
            rng.normal(size=(8, audio_samples_for_frames(nf))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, 4, size=(8,))),
    }
    init_rngs = {
        "params": jax.random.PRNGKey(0),
        "style": jax.random.PRNGKey(1),
    }
    cond = {"audio": batch["audio"], "vid": batch["vid"],
            "origin_x": batch["motion"]}
    teacher_params = model.init(
        init_rngs, batch["motion"], jnp.zeros((8,), jnp.int32), cond
    )["params"]
    return model, cfg, teacher_params, batch


def test_distill_step_learns(tiny_pair):
    model, cfg, teacher_params, batch = tiny_pair
    sched = DiffusionSchedule.create(steps=32, schedule="cosine")
    tx = optax.adamw(1e-3)
    # student initialised FROM the teacher (the paper's protocol)
    student = jax.tree.map(jnp.array, teacher_params)
    step = jax.jit(make_distill_step(model, sched, tx, teacher_params))
    opt_state = tx.init(student)

    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(40):
        opt_state, student, m = step(
            opt_state, student, batch, jax.random.fold_in(key, i)
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # the student moves toward the teacher's two-step map
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.8, losses[:3] + losses[-3:]


def test_distilled_student_samples_at_half_steps(tiny_pair):
    model, cfg, teacher_params, batch = tiny_pair
    # student sampled on the halved grid: one executable, 16 steps
    sched_half = DiffusionSchedule.create(
        steps=32, schedule="cosine", timestep_respacing="16"
    )
    from livelyspeaker_tpu.models import make_cfg_denoiser

    cond = {"audio": batch["audio"], "vid": batch["vid"],
            "origin_x": batch["motion"]}
    den = make_cfg_denoiser(model, teacher_params, cond, 1.0)
    out = jax.jit(
        lambda k: sample_loop(
            den, sched_half,
            (8, cfg.njoints, cfg.nfeats, cfg.nframes), k, method="ddim",
        )
    )(jax.random.PRNGKey(3))
    assert out.shape == (8, cfg.njoints, cfg.nfeats, cfg.nframes)
    assert np.isfinite(np.asarray(out)).all()
