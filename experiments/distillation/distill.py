"""Progressive distillation: halve the sampler's step count by training.

Salimans & Ho, "Progressive Distillation for Fast Sampling of Diffusion
Models" (ICLR 2022), in the x0-prediction parameterisation this framework
uses everywhere (model_util.py:42 predict_xstart=True): a student is trained
so its ONE deterministic DDIM step from t to t-2 lands where the teacher's
TWO steps (t -> t-1 -> t-2) land. Each distillation round halves the steps;
DPM-Solver++ already gives a training-free 20-step path (docs/DESIGN.md §9),
this is the training-based lever below that (the retrieved fast-sampling
papers — consistency / rectified-flow models — all build on this idea).

No reference counterpart (the reference only has DDIM/PLMS respacing).

STATUS: demoted to ``experiments/`` after four measured operating points
(rounds 2-4) found NO headroom on this workload — the x0-parameterised
denoiser is step-count-insensitive under DDIM on every fixture tried,
including a genuinely multimodal posterior with seed-frame conditioning
disabled, so students only add fine-tuning drift. See README.md in this
directory and docs/DESIGN.md §9 for the numbers; the math stays
oracle-identity-tested (tests/test_distill.py). dpmpp-20 is the
production fast path.

Pure functions + a jitted train step, mirroring trainer.py's structure.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from livelyspeaker_tpu.diffusion.sampling import extract, q_sample
from livelyspeaker_tpu.diffusion.schedule import DiffusionSchedule

__all__ = ["distill_targets", "make_distill_step"]


def _alpha_sigma(sched: DiffusionSchedule, t: jnp.ndarray, nd: int):
    acp = extract(sched.alphas_cumprod, t, nd)
    return jnp.sqrt(acp), jnp.sqrt(jnp.maximum(1.0 - acp, 1e-12))


def distill_targets(
    sched: DiffusionSchedule,
    teacher_x0: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_t: jnp.ndarray,
    t: jnp.ndarray,  # [B] int, sampled from [2, num_timesteps)
):
    """x0 target for the student's one-step jump t -> t-2.

    Runs the teacher's two deterministic (eta=0) DDIM steps and solves the
    x0 that makes the student's single DDIM step land on the same x_{t-2}
    (Salimans & Ho eq. 7 / App. G):

        x~0 = (x_{t-2} - (sigma_{t-2}/sigma_t) x_t)
              / (alpha_{t-2} - (sigma_{t-2}/sigma_t) alpha_t)

    With a PERFECT teacher (true x0), the target equals that x0 exactly —
    asserted in tests. Returns (x0_target, snr_weight) with the paper's
    truncated-SNR weighting max(alpha^2/sigma^2, 1).
    """
    nd = x_t.ndim
    a_t, s_t = _alpha_sigma(sched, t, nd)

    x0_1 = teacher_x0(x_t, t)
    eps1 = (x_t - a_t * x0_1) / s_t
    t1 = jnp.maximum(t - 1, 0)
    a_1, s_1 = _alpha_sigma(sched, t1, nd)
    x_t1 = a_1 * x0_1 + s_1 * eps1

    x0_2 = teacher_x0(x_t1, t1)
    eps2 = (x_t1 - a_1 * x0_2) / s_1
    t2 = jnp.maximum(t - 2, 0)
    a_2, s_2 = _alpha_sigma(sched, t2, nd)
    x_t2 = a_2 * x0_2 + s_2 * eps2

    ratio = s_2 / s_t
    denom = a_2 - ratio * a_t
    x0_target = (x_t2 - ratio * x_t) / jnp.where(
        jnp.abs(denom) < 1e-12, 1.0, denom
    )
    snr = (a_t**2) / (s_t**2)
    w = jnp.maximum(snr, 1.0)
    return x0_target, w


def make_distill_step(
    model,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    teacher_params,
):
    """Jitted distillation step: (opt_state, student_params, batch, rng) ->
    updated student. ``batch`` carries motion [B,J,F,T] + the cond dict
    fields (audio, vid, emo?). The teacher is the same architecture with
    frozen ``teacher_params`` (stop-gradient by construction)."""

    def cond_of(batch: Dict):
        cond = {
            "audio": batch["audio"],
            "vid": batch["vid"],
            "origin_x": batch["motion"],
        }
        if "emo" in batch:
            cond["emo"] = batch["emo"]
        return cond

    def apply_x0(params, x, t, cond, rng, feats):
        out = model.apply(
            {"params": params},
            x,
            sched.map_timesteps(t),
            cond,
            train=False,
            audio_feats=feats,  # hoisted: 3 denoiser calls share 2 encodes
            rngs={"style": rng},
        )
        return out["output"]

    def loss_fn(student_params, batch, t, rng):
        rng_noise, rng_teacher, rng_student = jax.random.split(rng, 3)
        cond = cond_of(batch)
        x0 = batch["motion"]
        t_feats = model.apply(
            {"params": teacher_params}, cond["audio"],
            method=model.encode_audio,
        )
        s_feats = model.apply(
            {"params": student_params}, cond["audio"],
            method=model.encode_audio,
        )
        noise = jax.random.normal(rng_noise, x0.shape, x0.dtype)
        x_t = q_sample(sched, x0, t, noise)
        teacher = lambda x, tt: apply_x0(
            teacher_params, x, tt, cond, rng_teacher, t_feats
        )
        target, w = distill_targets(sched, teacher, x_t, t)
        target = jax.lax.stop_gradient(target)
        w = jax.lax.stop_gradient(w)
        pred = apply_x0(student_params, x_t, t, cond, rng_student, s_feats)
        per_sample = jnp.mean(
            w * (pred - target) ** 2, axis=tuple(range(1, x0.ndim))
        )
        return jnp.mean(per_sample), per_sample

    def step(opt_state, student_params, batch, rng):
        rng_t, rng_loss = jax.random.split(rng)
        b = batch["motion"].shape[0]
        # t in [2, N): the student jump needs two teacher sub-steps below it
        t = jax.random.randint(rng_t, (b,), 2, sched.num_timesteps)
        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(student_params, batch, t, rng_loss)
        updates, opt_state = tx.update(grads, opt_state, student_params)
        student_params = optax.apply_updates(student_params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "t_mean": jnp.mean(t.astype(jnp.float32)),
        }
        return opt_state, student_params, metrics

    return step
