"""Timestep schedule samplers (reference: scripts/diffusion/resample.py).

Redesigned to be jit-compatible and mesh-native:

- :func:`uniform_sample_t` is the default path (resample.py:61-67), a pure
  ``jax.random.randint``.
- :class:`LossSecondMomentState` carries the loss history as a device array
  so the importance sampler lives inside the jitted train step.  The
  cross-replica synchronisation that the reference does with
  ``dist.all_gather`` (resample.py:83-104) is unnecessary here: under pjit
  the batch is globally sharded, so every host already computes the update
  from the *global* batch — the history update is replicated arithmetic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "uniform_sample_t",
    "LossSecondMomentState",
    "loss_aware_sample_t",
    "loss_aware_update",
]


def uniform_sample_t(
    rng: jax.Array, batch: int, num_timesteps: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform timestep sampling with unit weights (resample.py:61-67)."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


@struct.dataclass
class LossSecondMomentState:
    """Device-resident history for loss-second-moment importance sampling
    (resample.py:124-154)."""

    history: jnp.ndarray  # [T, history_per_term]
    counts: jnp.ndarray  # [T] int32
    uniform_prob: float = struct.field(pytree_node=False, default=0.001)

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10,
               uniform_prob: float = 0.001) -> "LossSecondMomentState":
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
            uniform_prob=uniform_prob,
        )

    @property
    def history_per_term(self) -> int:
        return self.history.shape[1]

    def weights(self) -> jnp.ndarray:
        warmed = jnp.all(self.counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(self.history**2, axis=-1))
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / w.shape[0]
        return jnp.where(warmed, w, jnp.ones_like(w))


def loss_aware_sample_t(
    state: LossSecondMomentState, rng: jax.Array, batch: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample t from the history weights (resample.py:42-58)."""
    w = state.weights()
    p = w / jnp.sum(w)
    t = jax.random.choice(rng, w.shape[0], (batch,), p=p)
    weights = 1.0 / (w.shape[0] * p[t])
    return t, weights.astype(jnp.float32)


def loss_aware_update(
    state: LossSecondMomentState, t: jnp.ndarray, losses: jnp.ndarray
) -> LossSecondMomentState:
    """Append per-timestep losses to the rolling history
    (resample.py:143-151), as a scatter that stays on device.

    When a timestep appears multiple times in the batch only the last
    occurrence lands in a slot (segment-last semantics); with hundreds of
    steps and uniform-ish sampling this matches the reference's sequential
    update distributionally while staying O(batch).
    """
    hpt = state.history_per_term
    cnt_t = state.counts[t]
    full = cnt_t == hpt

    # For full slots: shift left and write to the end; implemented as a
    # per-row roll for the affected timesteps.
    def write_one(hist, counts, ti, li, is_full):
        row = hist[ti]
        shifted = jnp.where(is_full, jnp.roll(row, -1).at[-1].set(li),
                            row.at[jnp.minimum(counts[ti], hpt - 1)].set(li))
        hist = hist.at[ti].set(shifted)
        counts = counts.at[ti].set(jnp.minimum(counts[ti] + 1, hpt))
        return hist, counts

    def body(carry, args):
        hist, counts = carry
        ti, li, fi = args
        hist, counts = write_one(hist, counts, ti, li, fi)
        return (hist, counts), None

    (hist, counts), _ = jax.lax.scan(
        body, (state.history, state.counts), (t, losses, full)
    )
    return state.replace(history=hist, counts=counts)
