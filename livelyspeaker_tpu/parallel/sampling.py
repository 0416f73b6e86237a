"""Mesh-sharded batch-parallel sampling: inference scale-out over ICI.

The reference evaluates and serves on a single GPU (``scripts/
test_RAG_ted.py:60-70`` moves the model to one ``mydevice``); its only
batch-scaling lever is the local batch size.  Here the *whole reverse-
diffusion executable* — CFG denoiser, scan, posterior math — shards its
batch axis across a ``jax.sharding.Mesh``, so eval sweeps and the serving
batcher scale out over chips with zero code changes in the samplers
themselves.  Two execution modes, chosen by the denoiser:

* **gspmd** (XLA denoiser): ``jax.jit`` with explicit in/out shardings.
  Pure DP partitions with zero collectives (every op in the chain is
  batch-elementwise); the TP param rules (`mesh.param_spec`) compose, with
  GSPMD inserting the latent-width all-reduces over ICI.  Because JAX's
  counter-based threefry PRNG is partitionable, the result is *identical*
  to the single-device program — sharding is purely a placement decision.

* **shard_map** (fused Pallas denoiser): a ``pallas_call`` is opaque to
  GSPMD — under a sharded jit it would be gathered and replicated, undoing
  the parallelism.  Instead the entire chain runs per-device on the local
  batch shard via ``jax.shard_map``.  Each shard folds its data-axis index
  into the RNG key (`fold_in(key, axis_index)`), so shards draw independent
  noise; the key *stream* therefore differs from the single-device program
  (same distribution, different draws) — the same contract as the serving
  key stream, not a numerical bug.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    param_shardings,
    replicated,
    shard_map,
)

__all__ = ["shard_sample_fn"]


def shard_sample_fn(
    fn: Callable,
    mesh: Mesh,
    params,
    batched: Sequence[bool],
    *,
    use_shard_map: bool = False,
    rng_arg: int | None = None,
):
    """Wrap ``fn(params, *args) -> [B, ...]`` for mesh execution.

    ``batched[i]`` marks ``args[i]`` (everything after ``params``) as
    carrying a leading global-batch axis to shard over ``'data'``; the rest
    (scalars, RNG keys) replicate.  Batched pytree args shard every leaf.
    The global batch must divide the data-axis size — callers assert this
    with a real error message before tracing.

    ``use_shard_map=True`` selects the per-device mode for denoisers GSPMD
    cannot partition (the fused Pallas path).  There ``rng_arg`` names the
    positional index (within ``args``) of the RNG key to fold the shard
    index into; TP is rejected (the kernel is a single-chip design — the
    'model' axis would silently replicate work).
    """
    if not use_shard_map:
        dp = batch_sharding(mesh)
        rep = replicated(mesh)
        in_sh = (param_shardings(params, mesh),) + tuple(
            dp if b else rep for b in batched
        )
        return jax.jit(fn, in_shardings=in_sh, out_shardings=dp)

    assert mesh.shape[MODEL_AXIS] == 1, (
        "shard_map sampling mode is data-parallel only; got model axis "
        f"of size {mesh.shape[MODEL_AXIS]}"
    )
    assert rng_arg is not None and batched[rng_arg] is False, rng_arg
    specs = (P(),) + tuple(P(DATA_AXIS) if b else P() for b in batched)

    def local_fn(params, *args):
        args = list(args)
        args[rng_arg] = jax.random.fold_in(
            args[rng_arg], jax.lax.axis_index(DATA_AXIS)
        )
        return fn(params, *args)

    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=specs,
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )
