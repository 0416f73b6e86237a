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

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion import (
    DiffusionSchedule,
    training_losses,
    uniform_sample_t,
)
from ..models.rag import RAG, RAGConfig

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
    ):
        self.lr = lr
        self.weight_decay = weight_decay
        self.lr_anneal_steps = lr_anneal_steps
        self.loss_type = loss_type
        self.lambda_vel = lambda_vel
        self.kld_weight = kld_weight
        self.grad_clip = grad_clip
        self.schedule_sampler = schedule_sampler


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


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


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_train_step(
    model: RAG,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the pure train step.

    batch: {'motion': [B,J,F,T], 'audio': [B,L], 'vid': [B],
            'mask'?: [B,T], 'emo'?: [B]}
    """

    def loss_fn(params, batch, t, weights, rng):
        rng_noise, rng_style, rng_mask = jax.random.split(rng, 3)
        cond = {
            "audio": batch["audio"],
            "vid": batch["vid"],
            "origin_x": batch["motion"],
        }
        if "emo" in batch:
            cond["emo"] = batch["emo"]

        def model_fn(x_t, t_model):
            return model.apply(
                {"params": params},
                x_t,
                t_model,
                cond,
                train=True,
                rngs={"style": rng_style, "cond_mask": rng_mask},
            )

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
        # train_loop.py:182: (loss * weights).mean() + 0.01 * kld
        loss = jnp.mean(terms["loss"] * weights) + cfg.kld_weight * terms.get(
            "kld", 0.0
        )
        return loss, terms

    def train_step(state: TrainState, batch, rng):
        rng_t, rng_loss = jax.random.split(rng)
        b = batch["motion"].shape[0]
        t, weights = uniform_sample_t(rng_t, b, sched.num_timesteps)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, t, weights, rng_loss
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(state.params),
            "t_mean": jnp.mean(t.astype(jnp.float32)),
        }
        for k in ("rot_mse", "vel_mse", "kld"):
            if k in terms:
                metrics[k] = jnp.mean(terms[k])
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, metrics

    return train_step
