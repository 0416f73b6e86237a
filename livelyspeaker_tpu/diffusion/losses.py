"""Diffusion training losses and likelihood terms, as pure functions.

Covers the reference's ``scripts/diffusion/losses.py`` (normal KL,
discretised Gaussian NLL), the HUBER/MSE training branches of
``GaussianDiffusion.training_losses`` (``scripts/diffusion/
gaussian_diffusion.py:1248-1403``) and the smooth-L1 helper
(``compute_huber``, :21-24) — with the model invocation factored out so the
whole step jits cleanly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .sampling import MeanType, q_posterior_mean_variance, q_sample
from .schedule import DiffusionSchedule

__all__ = [
    "huber",
    "huber_per_sample",
    "masked_l2",
    "normal_kl",
    "discretized_gaussian_log_likelihood",
    "kld_from_mu_logvar",
    "training_losses",
]


def huber(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.1) -> jnp.ndarray:
    """Scaled smooth-L1: ``smooth_l1(pred/beta, target/beta) * beta`` with
    mean reduction, matching ``compute_huber`` (gaussian_diffusion.py:21-24).
    """
    d = (pred - target) / beta
    ad = jnp.abs(d)
    l = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    return jnp.mean(l) * beta


def huber_per_sample(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.1
) -> jnp.ndarray:
    """Per-sample smooth-L1 ([B] vector of per-sample means).

    ``huber_per_sample(...).mean() == huber(...)`` exactly (equal element
    counts per sample), so this gives the per-timestep breakdown the
    reference's quartile logging needs (train_loop.py:255-261) and the
    per-sample losses the loss-aware schedule sampler consumes
    (resample.py:70-104), without changing the scalar loss semantics.
    """
    d = (pred - target) / beta
    ad = jnp.abs(d)
    l = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    return mean_flat(l) * beta


def sum_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def masked_l2(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample masked MSE over [B, J, F, T] with mask [B, 1, 1, T]
    (gaussian_diffusion.py:208-220)."""
    loss = sum_flat((a - b) ** 2 * mask.astype(a.dtype))
    n_entries = a.shape[1] * a.shape[2]
    non_zero = sum_flat(mask.astype(a.dtype)) * n_entries
    return loss / non_zero


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) in nats (losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a [-1,1]-discretised Gaussian (losses.py:50-78)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, a_min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, a_min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, a_min=1e-12)),
        ),
    )
    return log_probs


def kld_from_mu_logvar(z_mu: jnp.ndarray, z_logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE KLD for the speaker-style token (gaussian_diffusion.py:1388-1391)."""
    return -0.5 * jnp.mean(1 + z_logvar - z_mu**2 - jnp.exp(z_logvar))


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_pred: jnp.ndarray,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    clip_denoised: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Variational lower-bound term in bits/dim
    (gaussian_diffusion.py:1213-1246): KL(q(x_{t-1}|x_t,x_0) || p) for t>0,
    decoder NLL at t=0."""
    from .sampling import p_mean_variance

    true_mean, _, true_log_var = q_posterior_mean_variance(
        sched, x_start, x_t, t
    )
    out = p_mean_variance(
        sched, model_pred, x_t, t, mean_type=mean_type,
        clip_denoised=clip_denoised,
    )
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def calc_bpd_loop(
    denoise_fn,
    sched: DiffusionSchedule,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    clip_denoised: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full-chain bits/dim evaluation (gaussian_diffusion.py:1591-1649) as a
    single ``lax.scan``: per-timestep VB terms + MSE, prior bpd, total bpd.

    ``denoise_fn(x_t, t_model, rng) -> model prediction``.
    """
    from .sampling import q_sample as _q_sample
    from .sampling import q_mean_variance

    b = x_start.shape[0]
    n = sched.num_timesteps

    def body(carry, t_scalar):
        loop_rng, = carry
        loop_rng, k1, k2 = jax.random.split(loop_rng, 3)
        t = jnp.full((b,), t_scalar, jnp.int32)
        noise = jax.random.normal(k1, x_start.shape, x_start.dtype)
        x_t = _q_sample(sched, x_start, t, noise)
        pred = denoise_fn(x_t, sched.map_timesteps(t), k2)
        out = vb_terms_bpd(
            sched, pred, x_start, x_t, t,
            mean_type=mean_type, clip_denoised=clip_denoised,
        )
        mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        return (loop_rng,), (out["output"], mse)

    ts = jnp.arange(n - 1, -1, -1)
    (_,), (vb, mse) = jax.lax.scan(body, (rng,), ts)

    # prior bpd: KL(q(x_T | x_0) || N(0, I)) (gd.py:1567-1588)
    t_last = jnp.full((b,), n - 1, jnp.int32)
    qt_mean, _, qt_logvar = q_mean_variance(sched, x_start, t_last)
    kl_prior = normal_kl(
        qt_mean, qt_logvar, jnp.zeros_like(qt_mean), jnp.zeros_like(qt_logvar)
    )
    prior_bpd = mean_flat(kl_prior) / jnp.log(2.0)

    total_bpd = vb.sum(axis=0) + prior_bpd
    return {
        "total_bpd": total_bpd,
        "prior_bpd": prior_bpd,
        "vb": vb.T,  # [B, T] (descending t)
        "mse": mse.T,
    }


def ema_update(ema_params, new_params, decay: float = 0.9999):
    """EMA of params (diffusion/nn.py:56-66 ``update_ema``), functional."""
    return jax.tree.map(
        lambda e, p: e * decay + p * (1 - decay), ema_params, new_params
    )


def training_losses(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]],
    sched: DiffusionSchedule,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    mask: Optional[jnp.ndarray] = None,
    loss_type: str = "huber",
    mean_type: MeanType = MeanType.START_X,
    lambda_vel: float = 1.0,
    noise: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Diffusion training terms for one batch of timesteps.

    ``model_fn(x_t, t_model) -> {'output': ..., 'z_mu'?, 'z_logvar'?}`` is the
    denoiser closure (conditioning and dropout RNG already bound).  ``t`` is in
    *spaced* indices; the ``timestep_map`` remap is applied here, mirroring
    ``SpacedDiffusion.training_losses`` + ``_WrappedModel`` (respace.py:95-130).

    Matches the reference semantics exactly (gaussian_diffusion.py:1248-1403):
    HUBER terms are scalars (global means, :1380-1386); MSE terms are
    per-sample vectors (:1325-1333); ``loss = rot_mse + lambda_vel * vel_mse``
    with the 0.01-weighted KLD added by the caller (train_loop.py:182).
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = q_sample(sched, x_start, t, noise)

    out = model_fn(x_t, sched.map_timesteps(t))
    model_output = out["output"]

    if mean_type == MeanType.PREVIOUS_X:
        target = q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    elif mean_type == MeanType.START_X:
        target = x_start
    else:
        target = noise
    assert model_output.shape == target.shape == x_start.shape

    terms: Dict[str, jnp.ndarray] = {}
    if loss_type == "huber":
        rot_ps = huber_per_sample(target, model_output)
        terms["rot_mse"] = jnp.mean(rot_ps)
        terms["loss_per_sample"] = rot_ps
        if lambda_vel > 0.0:
            target_vel = target[..., 1:] - target[..., :-1]
            out_vel = model_output[..., 1:] - model_output[..., :-1]
            vel_ps = huber_per_sample(target_vel, out_vel)
            terms["vel_mse"] = jnp.mean(vel_ps)
            terms["loss_per_sample"] = rot_ps + lambda_vel * vel_ps
    elif loss_type == "mse":
        if mask is None:
            mask = jnp.ones(
                (x_start.shape[0], 1, 1, x_start.shape[-1]), x_start.dtype
            )
        elif mask.ndim == 2:
            mask = mask[:, None, None, :]
        terms["rot_mse"] = masked_l2(target, model_output, mask)
        if lambda_vel > 0.0:
            target_vel = target[..., 1:] - target[..., :-1]
            out_vel = model_output[..., 1:] - model_output[..., :-1]
            terms["vel_mse"] = masked_l2(target_vel, out_vel, mask[..., 1:])
    else:
        raise NotImplementedError(loss_type)

    if "z_mu" in out:
        terms["kld"] = kld_from_mu_logvar(out["z_mu"], out["z_logvar"])

    terms["loss"] = terms["rot_mse"] + lambda_vel * terms.get("vel_mse", 0.0)
    if "loss_per_sample" not in terms:
        terms["loss_per_sample"] = terms["loss"]  # mse branch: already [B]
    return terms
