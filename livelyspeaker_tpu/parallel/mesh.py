"""Device mesh + sharding rules.

The reference's distributed story is vestigial torch.distributed scaffolding
(``scripts/mdm_utils/dist_util.py:26-41`` — commented-out MPI/NCCL init,
``use_ddp=False`` at train_loop.py:79).  Here parallelism is first-class and
TPU-native: a 2-axis ``jax.sharding.Mesh`` — ``data`` for batch (DP) and
``model`` for tensor parallelism of the wide matmuls — with GSPMD inserting
the collectives over ICI.

Model sizes are modest (tens of MB), so DP carries throughput; TP rules
shard the latent-width matmuls (channel-mix, input/pose projections, the
speaker/CLIP projections) so the same code scales the latent dimension up
without code changes.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "param_spec",
    "shard_params",
    "fsdp_param_shardings",
    "fsdp_shard_params",
    "preserve_state_shardings",
    "replicated",
    "shard_map",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"

try:  # jax >= 0.4.35: top-level export
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# The replication-check kwarg was renamed check_rep -> check_vma when
# shard_map left experimental, NOT in lockstep with the top-level export —
# resolve the name from the callable's own signature, not the import path.
import inspect as _inspect

_SM_PARAMS = _inspect.signature(_shard_map).parameters
_REP_KW = (
    "check_vma"
    if "check_vma" in _SM_PARAMS
    else ("check_rep" if "check_rep" in _SM_PARAMS else None)
)


def shard_map(f, *, mesh, in_specs, out_specs, check_vma=True):
    """Version-portable ``shard_map``: forwards the replication-check
    flag under whichever kwarg name the installed jax accepts (both
    disable the check when False), or omits it if the signature has
    neither."""
    kw = {_REP_KW: check_vma} if _REP_KW is not None else {}
    return _shard_map(
        f,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        **kw,
    )


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


# Rules: regex over the flattened param path -> PartitionSpec.
# Only the wide (latent x latent or wider) matmuls are TP-sharded; everything
# small replicates.  Output-dim sharding keeps the subsequent activation
# feature-sharded, GSPMD all-gathers before LayerNorm automatically.
_PARAM_RULES = (
    (re.compile(r"channel_mix/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"input_mapping/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"(linear1|mlp_c_fc)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"(linear2|mlp_c_proj)/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"embed_timestep/fc[12]/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"(speaker_mu|speaker_logvar)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"in_proj_weight$"), P(MODEL_AXIS, None)),
    (re.compile(r"token_embedding$"), P(None, MODEL_AXIS)),
    (re.compile(r"speaker_embedding/embedding$"), P(None, MODEL_AXIS)),
)


def param_spec(path: str, leaf) -> P:
    for rx, spec in _PARAM_RULES:
        if rx.search(path):
            # Only shard if the dimension is actually divisible; tiny dims
            # (e.g. 27-d pose outputs) replicate.
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param tree under the TP rules, falling back
    to replication when a dim doesn't divide the mesh axis (or the mesh has
    no 'model' axis at all, e.g. a ('data','stage') pipeline mesh)."""
    model_size = mesh.shape.get(MODEL_AXIS, 0)
    if not model_size:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: rep, params)

    def one(path, leaf):
        spec = param_spec(_path_str(path), leaf)
        # validate divisibility
        dims = tuple(spec)
        for axis_idx, name in enumerate(dims):
            if name == MODEL_AXIS:
                if axis_idx >= leaf.ndim or leaf.shape[axis_idx] % model_size:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


# --- FSDP (ZeRO-style fully-sharded data parallelism) -----------------------
#
# Shard every large param leaf over the DATA axis too (on top of any TP rule),
# so params, grads, Adam moments and the EMA shadow all live 1/|data| per
# device.  GSPMD then materialises each weight with an all-gather at its use
# site and reduce-scatters the gradient — the standard JAX FSDP recipe
# (jax-ml.github.io/scaling-book): a *placement* decision, zero model-code
# changes.  For this model family (tens of MB) FSDP is about headroom — the
# same flag keeps memory flat as latent_dim/num_layers scale up.

#: Leaves smaller than this stay replicated: all-gathering a tiny vector per
#: step costs more (latency-bound ICI messages) than holding |data| copies.
FSDP_MIN_SIZE = 2**13


def fsdp_param_shardings(params, mesh: Mesh, min_size: int = FSDP_MIN_SIZE):
    """NamedSharding pytree: TP rules + the largest still-free divisible dim
    of every ``size >= min_size`` leaf sharded over 'data'."""
    data_size = mesh.shape[DATA_AXIS]
    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def one(path, leaf):
        spec = list(param_spec(_path_str(path), leaf))
        spec += [None] * (leaf.ndim - len(spec))
        if MODEL_AXIS not in mesh.shape:
            # meshes without a TP axis (e.g. ('data','stage')): drop the
            # TP rule, keep the leaf eligible for the 'data' shard below
            spec = [None if s == MODEL_AXIS else s for s in spec]
        for i, name in enumerate(spec):
            if name == MODEL_AXIS and (
                i >= leaf.ndim or leaf.shape[i] % model_size
            ):
                spec = [None] * leaf.ndim  # TP rule doesn't divide: replicate
                break
        if leaf.size >= min_size and data_size > 1:
            free = [
                i
                for i in range(leaf.ndim)
                if spec[i] is None and leaf.shape[i] % data_size == 0
                and leaf.shape[i] >= data_size
            ]
            if free:
                spec[max(free, key=lambda i: leaf.shape[i])] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def fsdp_shard_params(params, mesh: Mesh, min_size: int = FSDP_MIN_SIZE):
    """Place a param tree on the mesh fully-sharded (FSDP + TP rules).

    ``tx.init`` on these params yields sharded Adam moments and the EMA copy
    in ``init_train_state`` inherits placement (eager ops preserve input
    shardings).  The jitted train step must pin its OUTPUT state to the same
    placement (``preserve_state_shardings``): left unconstrained, GSPMD's
    propagation pass is free to pick replicated outputs — the all-gathers at
    the weights' use sites make that the locally cheapest choice — which
    silently re-replicates the state after one step.
    """
    return jax.device_put(params, fsdp_param_shardings(params, mesh, min_size))


def preserve_state_shardings(step_fn, state):
    """Wrap a ``(state, batch, key) -> (state, metrics)`` step so the output
    state is sharding-constrained to the (concrete) input ``state``'s
    placement.  This is what makes FSDP stick across steps; for replicated
    or TP-sharded states it pins the status quo.  Jit the result with
    ``donate_argnums=0`` for perfect in-place aliasing."""
    shardings = jax.tree.map(lambda l: l.sharding, state)

    def _pin(x, s):
        # Scalar counters etc. may carry SingleDeviceSharding from eager
        # init; constraining those to one device conflicts with the mesh —
        # only mesh placements are pinned.
        return jax.lax.with_sharding_constraint(x, s) if isinstance(
            s, NamedSharding
        ) else x

    def wrapped(st, batch, key):
        new_state, metrics = step_fn(st, batch, key)
        new_state = jax.tree.map(_pin, new_state, shardings)
        return new_state, metrics

    return wrapped
