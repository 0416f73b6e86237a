"""Fused Pallas TPU kernels for TRAINING the TransMLP denoiser backbone.

The inference kernel (``fused_mlp.py``) runs the whole 8-block mixer stack in
one ``pallas_call``; this module extends that to the training path with a
``jax.custom_vjp``:

- **forward**: same fused stack, but additionally stashes each block's input
  activation to HBM (one [L, S, B, D] tensor — the only extra traffic);
- **backward**: a second fused kernel that walks the blocks in reverse,
  recomputes the block internals (LN statistics, pre-activations) from the
  stashed inputs entirely in VMEM, and produces dx, d(emb) and all weight
  gradients, accumulating the weight grads across the batch grid inside the
  kernel (grid iterations are sequential on TPU, so in-place accumulation
  over a revisited output block is safe).

Why: XLA's autodiff of the Flax backbone costs 16.1 ms fwd+bwd at the
flagship shape (B=512, D=512, L=8) vs 3.3 ms forward — the backward pass
materialises every intermediate through HBM.  Here backward recompute is
VPU work over VMEM-resident tiles, so fwd+bwd lands near 3x the fused
forward (see docs/DESIGN.md "Fused training step").

Gradient layout note: the kernel computes gradients in the PADDED packed
layout ([L, S_pad, S_pad] token mix etc.).  Contributions landing in padded
rows/columns are garbage-free by construction for everything that flows to
real outputs: the incoming cotangent is zero-padded, the padded token-mix
rows/cols are zero, so every backward flow through padded rows is
identically zero except the dtw padded *columns*, which the caller's
``pack_transmlp_params`` VJP slices away before they reach real params.

Matches the semantics of ``TransMLP.__call__`` (mlp_backbone.py) which in
turn mirrors the reference backbone (scripts/model/mlp_module.py:37-91).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _SUBLANE, _round_up, pack_transmlp_params

__all__ = ["fused_transmlp_train", "pack_transmlp_params"]


def _act_pair(name: str):
    """(act, d_act) for the activations the backbone supports
    (mlp_module.py:39-50; the flagship config uses silu)."""
    if name == "silu":
        def act(x):
            return x * jax.nn.sigmoid(x)

        def dact(x):
            s = jax.nn.sigmoid(x)
            return s * (1.0 + x * (1.0 - s))
    elif name == "relu":
        def act(x):
            return jnp.maximum(x, 0.0)

        def dact(x):
            return (x > 0.0).astype(x.dtype)
    elif name in ("lrelu", "lrelu01", "lrelu02"):
        slope = {"lrelu": 0.01, "lrelu01": 0.1, "lrelu02": 0.2}[name]

        def act(x):
            return jnp.where(x > 0.0, x, slope * x)

        def dact(x):
            return jnp.where(x > 0.0, 1.0, slope).astype(x.dtype)
    else:
        raise NotImplementedError(
            f"fused_transmlp_train: unsupported activation {name!r}"
        )
    return act, dact


def _ln_fwd(x, scale, bias, eps=1e-5):
    """LayerNorm forward returning (y, xhat, inv_std) for reuse in backward."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(g_y, xhat, inv, scale):
    """dL/dx of LayerNorm given upstream g_y; also (d_scale, d_bias)
    contributions reduced over all leading axes, kept 2-D ([1, D]) because
    Mosaic handles sublane-broadcastable 2-D stores where 1-D vector stores
    can abort the compiler."""
    g_xhat = g_y * scale
    m1 = jnp.mean(g_xhat, axis=-1, keepdims=True)
    m2 = jnp.mean(g_xhat * xhat, axis=-1, keepdims=True)
    g_x = inv * (g_xhat - m1 - xhat * m2)
    d_scale = jnp.sum(jnp.sum(g_y * xhat, axis=0), axis=0, keepdims=True)
    d_bias = jnp.sum(jnp.sum(g_y, axis=0), axis=0, keepdims=True)
    return g_x, d_scale, d_bias


def _block_recompute(x, emb, l, ln1s_ref, ln1b_ref, tw_ref, tb_ref,
                     ln2s_ref, ln2b_ref, cw_ref, cb_ref, act):
    """Forward through block ``l`` from its stashed input, returning every
    intermediate the backward pass needs."""
    s_pad, tb, d = x.shape
    a = x + emb
    h1, xhat1, inv1 = _ln_fwd(
        a, ln1s_ref[l][None, None], ln1b_ref[l][None, None]
    )
    m1 = jax.lax.dot_general(
        tw_ref[l], h1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + tb_ref[l][:, :, None]
    r1 = a + act(m1)
    h2, xhat2, inv2 = _ln_fwd(
        r1, ln2s_ref[l][None, None], ln2b_ref[l][None, None]
    )
    m2 = jax.lax.dot_general(
        h2.reshape(s_pad * tb, d), cw_ref[l], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(s_pad, tb, d) + cb_ref[l][None, None]
    return a, h1, xhat1, inv1, m1, r1, h2, xhat2, inv2, m2


def _fwd_kernel(
    x_ref, emb_ref,
    ln1s_ref, ln1b_ref, tw_ref, tb_ref, ln2s_ref, ln2b_ref, cw_ref, cb_ref,
    out_ref, stash_ref,
    *, num_layers, act,
):
    s_pad, tb, d = x_ref.shape
    x = x_ref[:]
    emb = emb_ref[:][None]  # [1, TB, D]
    for l in range(num_layers):
        stash_ref[l] = x
        (a, h1, _, _, m1, r1, _, _, _, m2) = _block_recompute(
            x, emb, l, ln1s_ref, ln1b_ref, tw_ref, tb_ref,
            ln2s_ref, ln2b_ref, cw_ref, cb_ref, act,
        )
        x = r1 + act(m2)
    out_ref[:] = x


def _bwd_kernel(
    stash_ref, emb_ref, g_ref,
    ln1s_ref, ln1b_ref, tw_ref, tb_ref, ln2s_ref, ln2b_ref, cw_ref, cb_ref,
    gx_ref, gemb_ref,
    dln1s_ref, dln1b_ref, dtw_ref, dtb_ref,
    dln2s_ref, dln2b_ref, dcw_ref, dcb_ref,
    *, num_layers, act, dact,
):
    s_pad, tb, d = gx_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dln1s_ref, dln1b_ref, dtw_ref, dtb_ref,
                    dln2s_ref, dln2b_ref, dcw_ref, dcb_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    emb = emb_ref[:][None]
    g = g_ref[:]
    gemb = jnp.zeros((tb, d), jnp.float32)
    for l in reversed(range(num_layers)):
        x_in = stash_ref[l]
        (a, h1, xhat1, inv1, m1, r1, h2, xhat2, inv2, m2) = _block_recompute(
            x_in, emb, l, ln1s_ref, ln1b_ref, tw_ref, tb_ref,
            ln2s_ref, ln2b_ref, cw_ref, cb_ref, act,
        )
        # x_out = r1 + act(m2)
        g_m2 = g * dact(m2)
        g_m2_2d = g_m2.reshape(s_pad * tb, d)
        h2_t = jnp.swapaxes(h2.reshape(s_pad * tb, d), 0, 1)  # [D, S*TB]
        dcw_ref[l] += jax.lax.dot_general(
            h2_t, g_m2_2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dcb_ref[l] += jnp.sum(jnp.sum(g_m2, axis=0), axis=0, keepdims=True)
        cw_t = jnp.swapaxes(cw_ref[l], 0, 1)  # [D, D]
        g_h2 = jax.lax.dot_general(
            g_m2_2d, cw_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(s_pad, tb, d)
        g_r1_ln, ds2, db2 = _ln_bwd(
            g_h2, xhat2, inv2, ln2s_ref[l][None, None]
        )
        dln2s_ref[l] += ds2
        dln2b_ref[l] += db2
        g_r1 = g + g_r1_ln
        # r1 = a + act(m1)
        g_m1 = g_r1 * dact(m1)
        h1_t = jnp.swapaxes(h1.reshape(s_pad, tb * d), 0, 1)  # [TB*D, S]
        dtw_ref[l] += jax.lax.dot_general(
            g_m1.reshape(s_pad, tb * d), h1_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dtb_ref[l] += jnp.sum(
            jnp.sum(g_m1, axis=1), axis=1, keepdims=True
        )
        tw_t = jnp.swapaxes(tw_ref[l], 0, 1)  # [S, S]
        g_h1 = jax.lax.dot_general(
            tw_t, g_m1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_a_ln, ds1, db1 = _ln_bwd(
            g_h1, xhat1, inv1, ln1s_ref[l][None, None]
        )
        dln1s_ref[l] += ds1
        dln1b_ref[l] += db1
        g_a = g_r1 + g_a_ln
        # a = x_in + emb
        gemb = gemb + jnp.sum(g_a, axis=0)
        g = g_a
    gx_ref[:] = g
    gemb_ref[:] = gemb


def _pad_inputs(x, emb, s_pad, batch_tile):
    b, s, d = x.shape
    tb = max(min(batch_tile, _round_up(b, _SUBLANE)), _SUBLANE)
    b_pad = _round_up(b, tb)
    xs = jnp.zeros((s_pad, b_pad, d), jnp.float32)
    xs = xs.at[:s, :b].set(x.transpose(1, 0, 2).astype(jnp.float32))
    embp = jnp.zeros((b_pad, d), jnp.float32).at[:b].set(
        emb.astype(jnp.float32)
    )
    return xs, embp, tb, b_pad


def _full(*shape):
    return pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )


def _weight_specs(l, s_pad, d):
    return [
        _full(l, d), _full(l, d),            # ln1 scale/bias
        _full(l, s_pad, s_pad), _full(l, s_pad, 1),  # token w/b
        _full(l, d), _full(l, d),            # ln2 scale/bias
        _full(l, d, d), _full(l, d),         # channel w/b
    ]


def _weight_args(packed):
    return (
        packed["ln1_scale"], packed["ln1_bias"],
        packed["token_w"], packed["token_b"],
        packed["ln2_scale"], packed["ln2_bias"],
        packed["ch_w"], packed["ch_b"],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_transmlp_train(x, emb, packed, act_name="silu", batch_tile=8):
    """Differentiable fused mixer stack: [B,S,D] x [B,D] x packed -> [B,S,D].

    Semantics identical to :func:`fused_mlp.fused_transmlp` (and therefore to
    ``TransMLP.__call__`` minus the timestep embedder); unlike it, this
    version has a hand-written Pallas backward, so it can sit inside
    ``jax.value_and_grad`` in the training step.  f32 only.

    Non-differentiated calls (an eval forward, a loss probe) run the
    stash-free inference kernel — only under autodiff does ``_vjp_fwd``
    pay the [L,S_pad,B,D] HBM stash write (~335 MB at the flagship shape)
    that the hand-written backward consumes.  The two forwards compute the
    same math; outputs can differ by float-reorder noise only.
    """
    from .fused_mlp import fused_transmlp

    return fused_transmlp(x, emb, packed, act_name, batch_tile)


def _fwd_impl(x, emb, packed, act_name, batch_tile):
    act, _ = _act_pair(act_name)
    b, s, d = x.shape
    assert emb.ndim == 2, "emb must be [B, D] (squeeze outside the vjp)"
    num_layers, s_pad = packed["token_w"].shape[:2]
    xs, embp, tb, b_pad = _pad_inputs(x, emb, s_pad, batch_tile)

    wbytes = sum(
        int(np.prod(packed[k].shape)) * 4 for k in packed
    )
    tile_bytes = s_pad * tb * d * 4
    vmem_limit = min(
        int(wbytes + (10 + 2 * num_layers) * tile_bytes) + (1 << 20),
        100 << 20,
    )
    out, stash = pl.pallas_call(
        functools.partial(_fwd_kernel, num_layers=num_layers, act=act),
        grid=(b_pad // tb,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        in_specs=[
            pl.BlockSpec((s_pad, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(num_layers, s_pad, d),
        out_specs=[
            pl.BlockSpec((s_pad, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, s_pad, tb, d),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, b_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, s_pad, b_pad, d), jnp.float32),
        ],
    )(xs, embp, *_weight_args(packed))
    y = out[:s, :b].transpose(1, 0, 2).astype(x.dtype)
    return y, (stash, embp, packed, (b, s, d, tb, b_pad))


def _vjp_fwd(x, emb, packed, act_name, batch_tile):
    y, res = _fwd_impl(x, emb, packed, act_name, batch_tile)
    return y, res


def _vjp_bwd(act_name, batch_tile, res, g):
    act, dact = _act_pair(act_name)
    stash, embp, packed, (b, s, d, tb, b_pad) = res
    num_layers, s_pad = packed["token_w"].shape[:2]

    gs = jnp.zeros((s_pad, b_pad, d), jnp.float32)
    gs = gs.at[:s, :b].set(g.transpose(1, 0, 2).astype(jnp.float32))

    wbytes = sum(int(np.prod(packed[k].shape)) * 4 for k in packed)
    tile_bytes = s_pad * tb * d * 4
    # weights + weight-grad accumulators + the stashed layer inputs + ~20
    # live activation temporaries + slack; v5e has 128 MB physical VMEM and
    # the default 16 MB scoped budget is just conservative.
    vmem_limit = min(
        int(2 * wbytes + (24 + 2 * num_layers) * tile_bytes) + (6 << 20),
        100 << 20,
    )
    l = num_layers
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_layers=num_layers, act=act, dact=dact
        ),
        grid=(b_pad // tb,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        in_specs=[
            pl.BlockSpec((l, s_pad, tb, d), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(l, s_pad, d),
        out_specs=[
            pl.BlockSpec((s_pad, tb, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _full(l, 1, d), _full(l, 1, d),
            _full(l, s_pad, s_pad), _full(l, s_pad, 1),
            _full(l, 1, d), _full(l, 1, d),
            _full(l, d, d), _full(l, 1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, b_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((l, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((l, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((l, s_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((l, s_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((l, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((l, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((l, d, d), jnp.float32),
            jax.ShapeDtypeStruct((l, 1, d), jnp.float32),
        ],
    )(stash, embp, gs, *_weight_args(packed))
    (gxs, gembp, dln1s, dln1b, dtw, dtb, dln2s, dln2b, dcw, dcb) = outs
    dln1s, dln1b, dln2s, dln2b, dcb = (
        a[:, 0] for a in (dln1s, dln1b, dln2s, dln2b, dcb)
    )

    gx = gxs[:s, :b].transpose(1, 0, 2)
    gemb = gembp[:b]
    dpacked = {
        "ln1_scale": dln1s, "ln1_bias": dln1b,
        "token_w": dtw, "token_b": dtb,
        "ln2_scale": dln2s, "ln2_bias": dln2b,
        "ch_w": dcw, "ch_b": dcb,
    }
    return gx, gemb, dpacked


fused_transmlp_train.defvjp(_vjp_fwd, _vjp_bwd)
