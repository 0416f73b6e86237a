"""GPipe-style pipeline parallelism over the TransMLP mixer stack.

The reference has no pipeline story at all — its distributed scaffolding is
vestigial and disabled (``scripts/mdm_utils/dist_util.py:26-41``,
``use_ddp=False`` at ``scripts/train_utils/train_loop.py:79``).  This module
exists so the same backbone code scales past one chip's HBM/FLOPs when
``num_layers``/``dim`` grow, complementing the DP ('data') and TP ('model')
axes in :mod:`livelyspeaker_tpu.parallel.mesh`.

TPU-native design:

* the L identical mixer blocks are stacked layer-major (the same layout
  :func:`~livelyspeaker_tpu.ops.pallas.fused_mlp.pack_transmlp_params` uses)
  and the leading layer axis is sharded over a ``'stage'`` mesh axis — each
  stage holds L/S consecutive blocks;
* a single :func:`jax.shard_map` program rotates microbatch activations
  stage-to-stage with ``lax.ppermute`` over ICI while each stage scans its
  local blocks — the whole M-microbatch, (M+S-1)-tick schedule is ONE
  ``lax.scan``, one XLA program, no host round-trips;
* ``ppermute``/``scan`` are differentiable, so the same program trains: the
  backward pass pipelines in reverse automatically under ``jax.grad``.

Composable with data parallelism: pass a mesh with ('data', 'stage') axes
and each data-row runs an independent pipeline over its batch shard.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from livelyspeaker_tpu.models.mlp_backbone import get_activation

from .mesh import shard_map

__all__ = [
    "STAGE_AXIS",
    "create_pipeline_mesh",
    "stack_block_params",
    "pipeline_spec",
    "pipeline_forward",
    "make_pipeline_backbone_factory",
]

STAGE_AXIS = "stage"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_pipeline_mesh(
    n_devices: Optional[int] = None,
    pipeline_parallel: int = 2,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'stage'[, 'model']) mesh: the innermost (fastest-ICI) axis
    carries tensor parallelism when requested, the middle one the pipeline."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (pipeline_parallel * model_parallel) == 0, (
        n, pipeline_parallel, model_parallel,
    )
    if model_parallel > 1:
        arr = np.asarray(devices).reshape(
            n // (pipeline_parallel * model_parallel),
            pipeline_parallel,
            model_parallel,
        )
        return Mesh(arr, (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(n // pipeline_parallel, pipeline_parallel)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def stack_block_params(backbone_params: Dict, num_layers: int) -> Dict:
    """Stack per-block Flax params (``block_0..block_{L-1}``, the
    :class:`~livelyspeaker_tpu.models.mlp_backbone.MLPBlock` tree) into
    layer-major arrays with a leading L axis — the axis the 'stage' mesh
    axis shards."""
    blocks = [backbone_params[f"block_{i}"] for i in range(num_layers)]

    def stk(fn):
        return jnp.stack([jnp.asarray(fn(b)) for b in blocks])

    return {
        "ln1_scale": stk(lambda b: b["ln1"]["scale"]),  # [L, D]
        "ln1_bias": stk(lambda b: b["ln1"]["bias"]),
        "token_w": stk(lambda b: b["token_mix_kernel"]),  # [L, T, T]
        "token_b": stk(lambda b: b["token_mix_bias"]),  # [L, T]
        "ln2_scale": stk(lambda b: b["ln2"]["scale"]),
        "ln2_bias": stk(lambda b: b["ln2"]["bias"]),
        "ch_w": stk(lambda b: b["channel_mix"]["kernel"]),  # [L, D, D]
        "ch_b": stk(lambda b: b["channel_mix"]["bias"]),
    }


def pipeline_spec(stacked: Dict, tensor_parallel: bool = False) -> Dict:
    """PartitionSpec tree sharding the leading layer axis over 'stage'.

    With ``tensor_parallel``, the channel-mix weight is additionally
    column-sharded over 'model' (output-dim TP, same rule as
    mesh.py:_PARAM_RULES) — each TP rank computes a D/TP slice of the mix
    and an all-gather reforms the activation."""
    spec = {k: P(STAGE_AXIS) for k in stacked}
    if tensor_parallel:
        spec["ch_w"] = P(STAGE_AXIS, None, MODEL_AXIS)
        spec["ch_b"] = P(STAGE_AXIS, MODEL_AXIS)
    return spec


def _ln(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _block(
    p: Dict, x: jnp.ndarray, emb: jnp.ndarray, act, tp: bool = False
) -> jnp.ndarray:
    """One mixer block on stacked-layout params — numerically identical to
    MLPBlock.__call__ (mlp_backbone.py:79-113; reference mlp_module.py:37-74).

    With ``tp``, ``ch_w``/``ch_b`` hold this rank's column shard: the matmul
    produces a D/TP activation slice and a tiled all-gather over 'model'
    reforms full D before the residual add (column-parallel TP, Megatron
    style, over ICI).
    """
    x = x + emb
    h = _ln(x, p["ln1_scale"], p["ln1_bias"])
    h = jnp.einsum("ij,bjd->bid", p["token_w"], h) + p["token_b"][None, :, None]
    x = x + act(h)
    h = _ln(x, p["ln2_scale"], p["ln2_bias"])
    h = h @ p["ch_w"] + p["ch_b"]
    h = act(h)
    if tp:
        h = jax.lax.all_gather(h, MODEL_AXIS, axis=-1, tiled=True)
    x = x + h
    return x


def pipeline_forward(
    stacked: Dict,
    x: jnp.ndarray,
    emb: jnp.ndarray,
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
    act: str = "silu",
    data_sharded: bool = True,
):
    """Run the full mixer stack over the mesh's 'stage' axis.

    Args:
      stacked: layer-major params from :func:`stack_block_params`; the
        leading L axis is sharded over 'stage' (L % S == 0).
      x: [B, T, D] activations (post input-projection, pre block_0).
      emb: [B, 1, D] per-clip timestep embedding (added at EVERY block, the
        reference's per-block t-injection, mlp_module.py:83-87).
      mesh: a Mesh containing a 'stage' axis (and optionally 'data' and
        'model' — a 'model' axis >1 enables column-parallel TP of the
        channel mix inside every stage, composing dp x pp x tp).
      num_microbatches: M; defaults to S. Per-pipeline batch must divide M.
      data_sharded: also shard the batch over the mesh's 'data' axis.

    Returns:
      [B, T, D], bitwise-independent of S and M (same float ops per block).
    """
    S = mesh.shape[STAGE_AXIS]
    L = stacked["ch_w"].shape[0]
    assert L % S == 0, f"layers {L} not divisible by stages {S}"
    M = num_microbatches if num_microbatches is not None else S
    act_fn = get_activation(act)
    dspec = DATA_AXIS if (data_sharded and DATA_AXIS in mesh.shape) else None
    tp = MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1
    if tp:
        D = stacked["ch_w"].shape[-1]
        assert D % mesh.shape[MODEL_AXIS] == 0, (D, mesh.shape[MODEL_AXIS])

    def device_fn(params_local, x_local, emb_local):
        idx = jax.lax.axis_index(STAGE_AXIS)
        b = x_local.shape[0]
        assert b % M == 0, f"per-pipeline batch {b} not divisible by M={M}"
        mb = b // M
        x_mb = x_local.reshape(M, mb, *x_local.shape[1:])
        emb_mb = emb_local.reshape(M, mb, *emb_local.shape[1:])

        def run_stage(h, e):
            def body(carry, p):
                return _block(p, carry, e, act_fn, tp=tp), None

            h, _ = jax.lax.scan(body, h, params_local)
            return h

        def tick(carry, t):
            state, outputs = carry
            # Microbatch m enters stage 0 at tick m and reaches stage s at
            # tick m+s, so stage `idx` holds microbatch t-idx at tick t.
            m_here = jnp.clip(t - idx, 0, M - 1)
            inp = jnp.where(
                idx == 0,
                jax.lax.dynamic_index_in_dim(x_mb, m_here, 0, keepdims=False),
                state,
            )
            e = jax.lax.dynamic_index_in_dim(emb_mb, m_here, 0, keepdims=False)
            h = run_stage(inp, e)
            # The last stage finishes microbatch t-(S-1) at tick t.
            oi = jnp.clip(t - (S - 1), 0, M - 1)
            write = jnp.logical_and(idx == S - 1, t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, oi, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, h, cur), oi, 0
            )
            state = jax.lax.ppermute(
                h, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)]
            )
            return (state, outputs), None

        init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # Replicate the result (valid only on the last stage) over 'stage'.
        outputs = jax.lax.psum(
            jnp.where(idx == S - 1, outputs, jnp.zeros_like(outputs)),
            STAGE_AXIS,
        )
        return outputs.reshape(b, *x_local.shape[1:])

    return shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(pipeline_spec(stacked, tensor_parallel=tp), P(dspec), P(dspec)),
        out_specs=P(dspec),
        check_vma=False,
    )(stacked, x, emb)


def make_pipeline_backbone_factory(
    model_cfg,
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
):
    """Build the ``backbone_factory`` hook for
    :func:`~livelyspeaker_tpu.training.trainer.make_train_step`.

    Given the live param tree, the returned factory produces a
    ``backbone_apply(h, t)`` closure that (a) computes the timestep
    embedding from the canonical ``backbone/embed_timestep`` params,
    (b) stacks the per-block params layer-major, and (c) runs the stack
    GPipe-style over ``mesh``'s 'stage' axis via :func:`pipeline_forward`.
    The stacking is differentiable, so gradients land back on the
    canonical per-block tree and the optimizer/checkpoint layout is
    unchanged — pipeline parallelism stays a pure placement decision.
    """
    from livelyspeaker_tpu.models.mlp_backbone import TimestepEmbedder

    assert STAGE_AXIS in mesh.shape, f"mesh has no '{STAGE_AXIS}' axis: {mesh}"
    assert model_cfg.num_layers % mesh.shape[STAGE_AXIS] == 0, (
        f"layers {model_cfg.num_layers} not divisible by "
        f"{mesh.shape[STAGE_AXIS]} stages"
    )
    embedder = TimestepEmbedder(model_cfg.latent_dim)

    def factory(params):
        bb = params["backbone"]
        stacked = stack_block_params(bb, model_cfg.num_layers)

        def backbone_apply(h, t):
            emb = embedder.apply(
                {"params": bb["embed_timestep"]}, t
            )  # [B, 1, D]
            return pipeline_forward(
                stacked,
                h,
                emb,
                mesh,
                num_microbatches=num_microbatches,
                act=model_cfg.mlpact,
            )

        return backbone_apply

    return factory
