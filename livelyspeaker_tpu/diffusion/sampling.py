"""Pure-functional diffusion posterior math and fully-jitted sampling loops.

TPU-first redesign of the sampling half of the reference diffusion engine
(``scripts/diffusion/gaussian_diffusion.py``): instead of Python ``for`` loops
over timesteps with per-step device round-trips (reference
``p_sample_loop_progressive`` :673-743, ``ddim_sample_loop_progressive``
:945-1014, ``plms_sample_loop_progressive`` :1142-1211), the entire reverse
chain is a single ``jax.lax.scan`` compiled into one XLA program.  Classifier
-free guidance composes as a ``denoise_fn`` closure that batches the cond and
uncond passes (replacing the two sequential model calls of
``scripts/model/cfg_sampler.py:24-31``).

``denoise_fn(x, t_model, rng) -> prediction`` is the only model contract: it
receives the *original-process* timesteps (the ``timestep_map`` remapping of
``respace.py:118-130`` is applied by the loop) and returns the model's raw
prediction (x0 by default, per ``model_util.py:42``).
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule

__all__ = [
    "MeanType",
    "VarType",
    "extract",
    "q_sample",
    "q_mean_variance",
    "q_posterior_mean_variance",
    "predict_xstart_from_eps",
    "predict_eps_from_xstart",
    "predict_xstart_from_xprev",
    "p_mean_variance",
    "Inpainting",
    "condition_mean",
    "condition_score",
    "reverse_loop",
    "sample_loop",
    "sample_loop_with_dump",
]


class MeanType(str, enum.Enum):
    """What the model predicts (gaussian_diffusion.py:73-80)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(str, enum.Enum):
    """Reverse-process variance choice (gaussian_diffusion.py:83-94).

    Learned variances are not supported: the reference always runs
    ``learn_sigma=False`` (model_util.py:46) so only the fixed variants exist
    on any live path.
    """

    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast against an ``ndim`` tensor
    (gaussian_diffusion.py:1651-1663)."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample q(x_t | x_0) (gaussian_diffusion.py:240-258)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_mean_variance(sched, x_start, t):
    """Moments of q(x_t | x_0) (gaussian_diffusion.py:223-238)."""
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_posterior_mean_variance(sched, x_start, x_t, t):
    """Moments of q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:260-282)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    variance = extract(sched.posterior_variance, t, nd)
    log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_xstart_from_eps(sched, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    nd = x_t.ndim
    return (
        extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


class Inpainting(NamedTuple):
    """Inpainting-in-time conditioning (gaussian_diffusion.py:314-320).

    ``mask`` is True where frames are constrained to ``motion``.  The TED tree
    blends a *q_sample-noised* copy of the constraint at t-1 (``noised=True``,
    scripts/diffusion/gaussian_diffusion.py:319); the BEAT tree blends the
    clean constraint (``noised=False``, scripts_beat/.../gaussian_diffusion.py:319).
    """

    mask: jnp.ndarray
    motion: jnp.ndarray
    noised: bool = True


def _apply_inpainting(sched, pred, t, inpaint: Inpainting, rng):
    if inpaint.noised:
        noise = jax.random.normal(rng, inpaint.motion.shape, inpaint.motion.dtype)
        tm1 = jnp.maximum(t - 1, 0)
        noisy = q_sample(sched, inpaint.motion, tm1, noise)
        # Reference gates on t[0] > 0 (gaussian_diffusion.py:319).
        blended_src = jnp.where(t[0] > 0, noisy, inpaint.motion)
    else:
        blended_src = inpaint.motion
    return jnp.where(inpaint.mask, blended_src, pred)


def p_mean_variance(
    sched: DiffusionSchedule,
    model_pred: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable] = None,
):
    """p(x_{t-1} | x_t) moments from a model prediction
    (gaussian_diffusion.py:284-399, fixed-variance paths only)."""
    nd = x.ndim

    if var_type == VarType.FIXED_SMALL:
        variance = extract(sched.posterior_variance, t, nd)
        log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    else:  # FIXED_LARGE: betas with posterior_variance[1] at t=0 (gd.py:346-349)
        large = jnp.concatenate(
            [sched.posterior_variance[1:2], sched.betas[1:]], axis=0
        )
        variance = extract(large, t, nd)
        log_variance = jnp.log(variance)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(sched, x, t, model_pred)
        )
        mean = model_pred
    else:
        if mean_type == MeanType.START_X:
            pred_xstart = process_xstart(model_pred)
        else:
            pred_xstart = process_xstart(
                predict_xstart_from_eps(sched, x, t, model_pred)
            )
        mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return {
        "mean": mean,
        "variance": variance,
        "log_variance": log_variance,
        "pred_xstart": pred_xstart,
    }


def condition_mean(sched, cond_fn, out, x, t):
    """Sohl-Dickstein-style classifier guidance on the posterior mean
    (gaussian_diffusion.py:429-442): mean + variance * grad log p(y|x)."""
    gradient = cond_fn(x, t)
    return out["mean"] + out["variance"] * gradient


def condition_score(sched, cond_fn, out, x, t):
    """Song et al. score-based conditioning (gaussian_diffusion.py:459-481):
    shift eps by -sqrt(1-acp) * grad, recompute x0 and the posterior mean."""
    nd = x.ndim
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t)
    new = dict(out)
    new["pred_xstart"] = predict_xstart_from_eps(sched, x, t, eps)
    new["mean"], _, _ = q_posterior_mean_variance(
        sched, new["pred_xstart"], x, t
    )
    return new


def _nonzero_mask(t, ndim):
    return (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (ndim - 1))


def _ddpm_update(sched, out, x, t, noise):
    """Ancestral step (gaussian_diffusion.py:507-558)."""
    return out["mean"] + _nonzero_mask(t, x.ndim) * jnp.exp(
        0.5 * out["log_variance"]
    ) * noise


def _ddim_update(sched, out, x, t, noise, eta):
    """DDIM step, eq. 12 (gaussian_diffusion.py:745-798)."""
    nd = x.ndim
    eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
        jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)
    ) * eps
    return mean_pred + _nonzero_mask(t, nd) * sigma * noise


def ddim_reverse_step(sched, model_pred, x, t, *, mean_type=MeanType.START_X,
                      clip_denoised=False):
    """Deterministic DDIM encoder step x_t -> x_{t+1}
    (gaussian_diffusion.py:857-893)."""
    out = p_mean_variance(
        sched, model_pred, x, t, mean_type=mean_type, clip_denoised=clip_denoised
    )
    nd = x.ndim
    eps = (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x - out["pred_xstart"]
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
    alpha_bar_next = extract(sched.alphas_cumprod_next, t, nd)
    return out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(
        1 - alpha_bar_next
    ) * eps


def reverse_loop(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray],
    sched: DiffusionSchedule,
    x0: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Deterministic DDIM encoding x_0 -> x_T as one scan (the loop the
    reference only ships per-step, ``ddim_reverse_sample``
    gaussian_diffusion.py:857-893). Enables inversion-based editing."""
    batch = x0.shape[0]

    def body(carry, i):
        x, loop_rng = carry
        loop_rng, step_rng = jax.random.split(loop_rng)
        t = jnp.full((batch,), i, jnp.int32)
        pred = denoise_fn(x, sched.map_timesteps(t), step_rng)
        new_x = ddim_reverse_step(
            sched, pred, x, t, mean_type=mean_type, clip_denoised=clip_denoised
        )
        return (new_x, loop_rng), None

    indices = jnp.arange(sched.num_timesteps, dtype=jnp.int32)
    (final, _), _ = jax.lax.scan(body, (x0, rng), indices)
    return final


def sample_loop(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray],
    sched: DiffusionSchedule,
    shape,
    rng: jax.Array,
    *,
    method: str = "ddpm",
    eta: float = 0.0,
    order: int = 2,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable] = None,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    skip_timesteps: int = 0,
    init_image: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
    inpainting: Optional[Inpainting] = None,
    cond_fn: Optional[Callable] = None,
    const_noise: bool = False,
    return_trajectory: Optional[str] = None,  # "pred_xstart" | "sample"
    dtype=jnp.float32,
):
    """Run the full reverse diffusion as one ``lax.scan``.

    Replaces ``p_sample_loop`` / ``ddim_sample_loop`` / ``plms_sample_loop``
    (gaussian_diffusion.py:608-671, :895-943, :1100-1140) including the
    ``skip_timesteps`` + ``init_image`` warm start used by the LivelySpeaker
    composition (``scripts/test_LivelySpeaker_ted.py:102-113``: q_sample-noise
    the SAG sketch to step T-skip, then denoise the remainder).

    method: "ddpm" (ancestral), "ddim", "plms" (order 1-4), or "dpmpp"
    (DPM-Solver++(2M), data-prediction multistep — a modern training-free
    fast sampler beyond the reference's PLMS; ~10-20 steps typically match
    DDIM-100 quality).
    """
    assert method in ("ddpm", "ddim", "plms", "dpmpp"), method
    n_steps = sched.num_timesteps - skip_timesteps
    assert n_steps >= 1, (sched.num_timesteps, skip_timesteps)
    batch = shape[0]

    rng, init_rng = jax.random.split(rng)
    if noise is None:
        img = jax.random.normal(init_rng, shape, dtype)
        if const_noise:
            img = jnp.broadcast_to(img[:1], shape)
    else:
        img = noise.astype(dtype)

    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype)

    if init_image is not None:
        t0 = jnp.full((batch,), n_steps - 1, jnp.int32)
        img = q_sample(sched, init_image.astype(dtype), t0, img)

    def model_out(x, t, step_rng):
        pred = denoise_fn(x, sched.map_timesteps(t), step_rng)
        return pred

    def shared_out(x, i, step_rng):
        t = jnp.full((batch,), i, jnp.int32)
        rng_model, rng_inpaint = jax.random.split(step_rng)
        pred = model_out(x, t, rng_model)
        if inpainting is not None:
            pred = _apply_inpainting(sched, pred, t, inpainting, rng_inpaint)
        out = p_mean_variance(
            sched,
            pred,
            x,
            t,
            mean_type=mean_type,
            var_type=var_type,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
        )
        if cond_fn is not None:
            # DDPM uses the mean shift (gd.py:550-553); DDIM/PLMS use the
            # score form (gd.py:770-771, :1048-1053).
            if method == "ddpm":
                out = dict(out, mean=condition_mean(sched, cond_fn, out, x, t))
            else:
                out = condition_score(sched, cond_fn, out, x, t)
        return out, t

    indices = jnp.arange(n_steps - 1, -1, -1, dtype=jnp.int32)

    if method in ("ddpm", "ddim"):

        def body(carry, i):
            x, loop_rng = carry
            loop_rng, step_rng, noise_rng = jax.random.split(loop_rng, 3)
            out, t = shared_out(x, i, step_rng)
            step_noise = jax.random.normal(noise_rng, x.shape, dtype)
            if const_noise:
                step_noise = jnp.broadcast_to(step_noise[:1], x.shape)
            if method == "ddpm":
                new_x = _ddpm_update(sched, out, x, t, step_noise)
            else:
                new_x = _ddim_update(sched, out, x, t, step_noise, eta)
            if return_trajectory == "pred_xstart":
                y = out["pred_xstart"]  # TED dump semantics (gd.py:666)
            elif return_trajectory == "sample":
                y = new_x  # BEAT dump semantics (scripts_beat gd.py:664)
            else:
                y = None
            return (new_x, loop_rng), y

        (final, _), preds = jax.lax.scan(body, (img, rng), indices)
        if return_trajectory:
            return final, preds
        return final

    if method == "dpmpp":
        # DPM-Solver++(2M), data-prediction form (Lu et al. 2022).
        # lambda_t = log(alpha_t / sigma_t) with alpha = sqrt(acp),
        # sigma = sqrt(1 - acp); the final step (t=0) returns pred_xstart
        # (sigma_0 of the discrete chain is 0 for the x0 target).
        acp = sched.alphas_cumprod
        acp_prev = sched.alphas_cumprod_prev
        log_lambda = 0.5 * (jnp.log(acp) - jnp.log1p(-acp))
        # lambda at the *destination* of step i (t-1 in the spaced chain)
        log_lambda_prev = 0.5 * (
            jnp.log(acp_prev) - jnp.log(jnp.maximum(1.0 - acp_prev, 1e-20))
        )

        def body(carry, args):
            x, loop_rng, d_prev, h_prev, n_prev = carry
            i, _ = args
            loop_rng, step_rng = jax.random.split(loop_rng)
            out, t = shared_out(x, i, step_rng)
            d = out["pred_xstart"]
            nd = x.ndim

            lam = log_lambda[i]
            lam_next = log_lambda_prev[i]
            h = lam_next - lam
            alpha_next = jnp.sqrt(acp_prev[i])
            sigma_next = jnp.sqrt(jnp.maximum(1.0 - acp_prev[i], 0.0))
            sigma_cur = jnp.sqrt(1.0 - acp[i])

            # 2M correction: D~ = (1 + 1/(2r)) D_i - 1/(2r) D_{i-1}
            r = h_prev / jnp.where(h == 0, 1.0, h)
            coef = 1.0 / jnp.maximum(2.0 * r, 1e-20)
            d_tilde = jnp.where(n_prev > 0, (1.0 + coef) * d - coef * d_prev, d)

            new_x = (sigma_next / sigma_cur) * x - alpha_next * (
                jnp.exp(-h) - 1.0
            ) * d_tilde
            # last step of the chain lands on the clean sample
            new_x = jnp.where(t[0] > 0, new_x, d)
            if return_trajectory == "pred_xstart":
                y = d
            elif return_trajectory == "sample":
                y = new_x
            else:
                y = None
            return (new_x, loop_rng, d, h, n_prev + 1), y

        steps = jnp.arange(n_steps, dtype=jnp.int32)
        (final, _, _, _, _), preds = jax.lax.scan(
            body,
            (img, rng, jnp.zeros_like(img), jnp.float32(1.0), jnp.int32(0)),
            (indices, steps),
        )
        if return_trajectory:
            return final, preds
        return final

    # PLMS (Adams-Bashforth multistep, gaussian_diffusion.py:1016-1098).
    if not 1 <= order <= 4:
        raise ValueError("plms order must be in [1, 4]")

    def eps_of(x, i, step_rng):
        out, t = shared_out(x, i, step_rng)
        eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        return eps, out, t

    def body(carry, args):
        x, loop_rng, old_eps, n_old = carry
        i, step_idx = args
        loop_rng, r1, r2 = jax.random.split(loop_rng, 3)
        eps, out, t = eps_of(x, i, r1)
        nd = x.ndim
        alpha_bar_prev = extract(sched.alphas_cumprod_prev, t, nd)

        def prime_euler(_):
            # First step with order>1: Pseudo Improved Euler (gd.py:1066-1073).
            mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
                1 - alpha_bar_prev
            ) * eps
            eps2, _, _ = eps_of(mean_pred, jnp.maximum(i - 1, 0), r2)
            return (eps + eps2) / 2

        def multistep(_):
            cur = jnp.minimum(n_old + 1, order)
            e1 = eps
            e2 = old_eps[-1]
            e3 = old_eps[-2] if order >= 3 else e2
            e4 = old_eps[-3] if order >= 4 else e3
            cands = [
                e1,
                (3 * e1 - e2) / 2,
                (23 * e1 - 16 * e2 + 5 * e3) / 12,
                (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24,
            ][:order]
            branches = jnp.stack(cands)
            return branches[jnp.clip(cur, 1, order) - 1]

        if order > 1:
            eps_prime = jax.lax.cond(step_idx == 0, prime_euler, multistep, None)
        else:
            eps_prime = eps

        pred_prime = predict_xstart_from_eps(sched, x, t, eps_prime)
        mean_pred = pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            1 - alpha_bar_prev
        ) * eps_prime
        nzm = _nonzero_mask(t, nd)
        new_x = mean_pred * nzm + out["pred_xstart"] * (1 - nzm)

        new_old = jnp.concatenate([old_eps[1:], eps[None]], axis=0)
        if return_trajectory == "pred_xstart":
            y = out["pred_xstart"]
        elif return_trajectory == "sample":
            y = new_x
        else:
            y = None
        return (new_x, loop_rng, new_old, jnp.minimum(n_old + 1, order)), y

    hist = max(order - 1, 1)
    old_eps0 = jnp.zeros((hist,) + tuple(shape), dtype)
    steps = jnp.arange(n_steps, dtype=jnp.int32)
    (final, _, _, _), preds = jax.lax.scan(
        body, (img, rng, old_eps0, jnp.int32(0)), (indices, steps)
    )
    if return_trajectory:
        return final, preds
    return final


def sample_loop_with_dump(
    denoise_fn,
    sched: DiffusionSchedule,
    shape,
    rng: jax.Array,
    *,
    dump_steps,
    dump_field: str = "pred_xstart",
    **kwargs,
):
    """Reference ``dump_steps`` semantics as one XLA program.

    ``p_sample_loop``/``ddim_sample_loop`` optionally collect the sampler
    state at chosen loop indices — pred_xstart in the TED tree
    (scripts/diffusion/gaussian_diffusion.py:666), the post-step sample in
    the BEAT tree (scripts_beat/.../gaussian_diffusion.py:664) — and return
    the collected list INSTEAD of the final sample (gd.py:668-671).  Here the
    scan emits the per-step field and a static gather selects the dumped
    rows; returns ``(final, dumped [len(dump_steps), *shape])`` (the final
    sample costs nothing to also return).
    """
    final, traj = sample_loop(
        denoise_fn,
        sched,
        shape,
        rng,
        return_trajectory=dump_field,
        **kwargs,
    )
    idx = jnp.asarray(list(dump_steps), jnp.int32)
    return final, traj[idx]
