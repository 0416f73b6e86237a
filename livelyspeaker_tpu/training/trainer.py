"""Jitted, mesh-parallel training step for the RAG diffusion model.

Replaces the reference TrainLoop internals (``scripts/train_utils/
train_loop.py:146-186``): uniform timestep sampling, diffusion losses with
``loss = (loss * weights).mean() + 0.01 * kld`` (train_loop.py:182), AdamW
with optional linear LR anneal (:188-194) — all inside one donated-state
jitted step, with the batch sharded over the 'data' mesh axis and params
optionally tensor-sharded (GSPMD inserts the gradient all-reduce that the
reference's disabled DDP never did).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion import (
    DiffusionSchedule,
    LossSecondMomentState,
    ema_update,
    loss_aware_sample_t,
    loss_aware_update,
    training_losses,
    uniform_sample_t,
)
from ..models.rag import RAG

__all__ = ["TrainState", "TrainConfig", "make_optimizer", "make_train_step",
           "init_train_state"]


class TrainConfig:
    """Training hyperparameters (defaults from parser_util.py:252-274 and
    model_util.py:40-74)."""

    def __init__(
        self,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        lr_anneal_steps: int = 0,
        loss_type: str = "huber",
        lambda_vel: float = 1.0,
        kld_weight: float = 0.01,  # train_loop.py:182 (BEAT uses 0.0, :246)
        grad_clip: float = 0.0,
        schedule_sampler: str = "uniform",
        ema_rate: float = 0.0,
        ema_warmup: bool = False,
        compute_dtype: str = "float32",
    ):
        self.lr = lr
        self.weight_decay = weight_decay
        self.lr_anneal_steps = lr_anneal_steps
        self.loss_type = loss_type
        self.lambda_vel = lambda_vel
        self.kld_weight = kld_weight
        self.grad_clip = grad_clip
        self.schedule_sampler = schedule_sampler
        # EMA of params (reference update_ema, diffusion/nn.py:56-66);
        # 0.0 = off (the reference's TrainLoop never wires its own EMA either,
        # but guided-diffusion lineage uses 0.9999).
        self.ema_rate = ema_rate
        # Warmed-up decay min(rate, (1+step)/(10+step)) (the classic
        # tf.train.ExponentialMovingAverage num_updates rule): the shadow
        # starts by tracking the params and only asymptotically reaches
        # ema_rate, removing the r^N init weight that dominates short runs
        # (DESIGN.md §13: at rate 0.999 a 1500-step EMA is still 22% random
        # init). Off by default — the plain rule is the reference semantics.
        self.ema_warmup = ema_warmup
        # TPU-native mixed precision: bf16 compute against f32 master params
        # (replaces the reference's fp16 MixedPrecisionTrainer + dynamic loss
        # scaling, fp16_util.py:148-232 — bf16 needs no loss scaling).
        self.compute_dtype = compute_dtype


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Loss-second-moment sampler history (None when schedule_sampler=uniform).
    sampler_state: Any = None
    # EMA shadow params (None when ema_rate == 0).
    ema_params: Any = None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.lr_anneal_steps:
        # Linear anneal lr * (1 - step/anneal_steps) (train_loop.py:188-194).
        sched = lambda step: cfg.lr * jnp.maximum(
            0.0, 1.0 - step / cfg.lr_anneal_steps
        )
    else:
        sched = cfg.lr
    tx = optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


_LOSS_AWARE_NAMES = ("loss-second-moment", "loss_second_moment")


def init_train_state(
    params,
    tx,
    *,
    cfg: "TrainConfig | None" = None,
    num_timesteps: int | None = None,
) -> TrainState:
    sampler_state = None
    ema_params = None
    if cfg is not None:
        if cfg.schedule_sampler in _LOSS_AWARE_NAMES:
            if not num_timesteps:
                raise ValueError(
                    "loss-second-moment sampler needs num_timesteps"
                )
            sampler_state = LossSecondMomentState.create(num_timesteps)
        if cfg.ema_rate > 0:
            # Real copies: aliasing the param buffers would break donation
            # (the same buffer can't be donated twice in one step).
            ema_params = jax.tree.map(
                lambda p: jnp.array(p, copy=True), params
            )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        sampler_state=sampler_state,
        ema_params=ema_params,
    )


def make_train_step(
    model: RAG,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    axis_name: "str | None" = None,
    backbone_factory: "Callable | None" = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the pure train step.

    batch: {'motion': [B,J,F,T], 'audio': [B,L], 'vid': [B],
            'mask'?: [B,T], 'emo'?: [B]}

    ``backbone_factory`` (params -> backbone_apply) routes the mixer stack
    through an alternative forward built from the live params — the
    pipeline-parallel path (parallel.pipeline.make_pipeline_backbone_factory)
    plugs in here; gradients flow through the factory's stacking back to the
    canonical per-block param tree.

    ``axis_name`` switches on explicit data-parallel collectives for use
    inside ``shard_map`` (parallel.shard_train_step): the step then sees
    only its device-local batch shard, pmeans loss+grads across the axis
    (so the optimizer update is bitwise-identical on every device, keeping
    the replicated states in sync), and all_gathers the per-sample
    (t, loss) arrays so the loss-aware sampler history and the host
    quartile logger observe the global batch.  Under plain ``jit`` (GSPMD)
    leave it None — the partitioner inserts these collectives itself.
    """

    compute_dtype = jnp.dtype(cfg.compute_dtype)

    def loss_fn(params, batch, t, weights, rng):
        rng_noise, rng_style, rng_mask = jax.random.split(rng, 3)
        cond = {
            "audio": batch["audio"],
            "vid": batch["vid"],
            "origin_x": batch["motion"],
        }
        if "emo" in batch:
            cond["emo"] = batch["emo"]
        if compute_dtype != jnp.float32:
            # bf16 compute, f32 master params; the cast is differentiable so
            # gradients come back f32.
            apply_params = jax.tree.map(
                lambda p: p.astype(compute_dtype)
                if p.dtype == jnp.float32
                else p,
                params,
            )
        else:
            apply_params = params

        backbone_apply = (
            backbone_factory(apply_params) if backbone_factory else None
        )

        def model_fn(x_t, t_model):
            out = model.apply(
                {"params": apply_params},
                x_t.astype(compute_dtype),
                t_model,
                cond,
                train=True,
                rngs={"style": rng_style, "cond_mask": rng_mask},
                backbone_apply=backbone_apply,
            )
            return {k: v.astype(jnp.float32) for k, v in out.items()}

        terms = training_losses(
            model_fn,
            sched,
            batch["motion"],
            t,
            rng_noise,
            mask=batch.get("mask"),
            loss_type=cfg.loss_type,
            lambda_vel=cfg.lambda_vel,
        )
        # train_loop.py:182: (loss * weights).mean() + 0.01 * kld.  The
        # per-sample reduction makes the importance weights of the
        # loss-aware sampler land on the right samples; for uniform weights
        # it equals the reference's scalar-huber mean exactly.
        loss = jnp.mean(
            terms["loss_per_sample"] * weights
        ) + cfg.kld_weight * terms.get("kld", 0.0)
        return loss, terms

    use_loss_aware = cfg.schedule_sampler in _LOSS_AWARE_NAMES
    if not use_loss_aware and cfg.schedule_sampler != "uniform":
        raise NotImplementedError(
            f"unknown schedule_sampler: {cfg.schedule_sampler!r}"
        )

    def train_step(state: TrainState, batch, rng):
        rng_t, rng_loss = jax.random.split(rng)
        b = batch["motion"].shape[0]
        if use_loss_aware:
            # Importance-sample t from the warmed loss history
            # (resample.py:42-58); the all_gather the reference needs is
            # unnecessary under pjit — the batch is globally sharded.
            t, weights = loss_aware_sample_t(state.sampler_state, rng_t, b)
        else:
            t, weights = uniform_sample_t(rng_t, b, sched.num_timesteps)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, t, weights, rng_loss
        )
        # Per-sample arrays as the GLOBAL batch sees them (sampler history
        # + quartile logging); under shard_map that means gathering the
        # shards (identical result on every device, so the replicated
        # sampler state stays in sync).
        t_global = t
        losses_global = terms["loss_per_sample"]
        if axis_name is not None:
            # Equal shard sizes => mean of shard-means == global mean, so
            # pmean(grads) is exactly the global-batch gradient and every
            # device's optimizer update is identical.
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            t_global = jax.lax.all_gather(t, axis_name, tiled=True)
            losses_global = jax.lax.all_gather(
                terms["loss_per_sample"], axis_name, tiled=True
            )
        # NaN guard: skip the update on a non-finite step (the functional
        # analogue of the reference's fp16 overflow backoff,
        # fp16_util.py:193-198); with bf16 this should never fire, but a
        # skipped step beats a poisoned optimizer state.
        grads_finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            )
        )
        updates, opt_candidate = tx.update(grads, state.opt_state, state.params)
        params_candidate = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(grads_finite, new, old),
            params_candidate,
            state.params,
        )
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(grads_finite, new, old)
            if hasattr(new, "dtype")
            else new,
            opt_candidate,
            state.opt_state,
        )
        # Loss-aware history update, guarded so a NaN batch can't poison the
        # sampling weights (matches the NaN-step skip above).
        new_sampler = state.sampler_state
        if use_loss_aware:
            losses_ps = losses_global
            safe = jnp.all(jnp.isfinite(losses_ps))
            updated = loss_aware_update(
                state.sampler_state,
                t_global,
                jnp.where(safe, losses_ps, jnp.zeros_like(losses_ps)),
            )
            new_sampler = jax.tree.map(
                lambda n, o: jnp.where(safe, n, o),
                updated,
                state.sampler_state,
            )

        new_ema = state.ema_params
        if cfg.ema_rate > 0 and state.ema_params is not None:
            rate = cfg.ema_rate
            if cfg.ema_warmup:
                # state.step counts completed steps, so the first update
                # (step=0) uses decay 0.1 — the shadow locks onto the params
                # immediately instead of clinging to the init copy.
                n = state.step.astype(jnp.float32)
                rate = jnp.minimum(rate, (1.0 + n) / (10.0 + n))
            # new_params is already NaN-guarded, so the EMA stays clean.
            new_ema = ema_update(state.ema_params, new_params, rate)

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(state.params),
            "t_mean": jnp.mean(t_global.astype(jnp.float32)),
            "skipped_nonfinite": 1.0 - grads_finite.astype(jnp.float32),
            # Per-sample breakdown for the quartile logger
            # (train_loop.py:255-261); host side pops these array entries.
            "t": t_global,
            "loss_per_sample": losses_global,
        }
        for k in ("rot_mse", "vel_mse", "kld"):
            if k in terms:
                m = jnp.mean(terms[k])
                if axis_name is not None:
                    m = jax.lax.pmean(m, axis_name)
                metrics[k] = m
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            sampler_state=new_sampler,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step
