"""Mesh-sharded data-parallel training for GSPMD-opaque train steps.

The ordinary training path scales out with plain ``jit``: the loader
shards batches over the 'data' axis, params carry TP rules, and GSPMD
inserts the gradient all-reduce (the collective the reference's disabled
DDP never performed, ``scripts/train_utils/train_loop.py``).  That breaks
down for ``RAGConfig(fused_train_backbone=True)``: a ``pallas_call`` is
opaque to the partitioner, which would gather and replicate the batch,
serialising the very step the fused custom-VJP kernel accelerates.

This module is the training twin of ``parallel.sampling``'s shard_map
mode: the WHOLE train step runs per-device on its local batch shard via
``shard_map``, with the step itself (``make_train_step(axis_name=...)``)
pmean-ing loss+grads across the data axis and all_gather-ing the
per-sample (t, loss) arrays.  Because every device then applies the
identical global gradient to the identical replicated state, the
TrainStates stay bitwise in sync — the same SPMD contract GSPMD gives
the XLA path, just written out explicitly.

Key-stream contract (same as sampling/serving): each shard folds its
data-axis index into the step RNG, so shards draw independent timesteps
and noise.  The stream differs from the single-device program (same
distribution, different draws) — a placement-visible choice, not a bug;
``fold_shard_rng=False`` exists for tests that want shards to draw
identically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..training.trainer import make_train_step
from .mesh import DATA_AXIS, MODEL_AXIS, shard_map

__all__ = ["shard_train_step"]


def shard_train_step(
    model,
    sched,
    tx,
    cfg,
    mesh: Mesh,
    *,
    fold_shard_rng: bool = True,
    donate: bool = True,
):
    """Build a jitted DP ``shard_map`` train step over ``mesh``.

    Call it like the plain step: ``state, metrics = step(state, batch,
    rng)`` with ``state`` replicated, ``batch`` leaves carrying a global
    leading batch axis divisible by the data-axis size, and a replicated
    ``rng``.  Outputs are replicated (identical on every device by
    construction — see module docstring).
    """
    if mesh.shape[MODEL_AXIS] != 1:
        raise ValueError(
            "shard_map training is data-parallel only; got model axis of "
            f"size {mesh.shape[MODEL_AXIS]} (the fused kernel is a "
            "single-chip design — a TP axis would silently replicate work)"
        )
    step = make_train_step(model, sched, tx, cfg, axis_name=DATA_AXIS)

    def local_step(state, batch, rng):
        if fold_shard_rng:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        return step(state, batch, rng)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0 if donate else ())
