"""Fused Pallas TPU kernels for the WavEncoder audio frontend.

STATUS: experimental / measured negative — NOT the production path.
The staged forward below is correct (interpret-mode parity ~1e-5,
tests/test_fused_wav.py) but measures ~8 ms vs the XLA encoder's 3.1 ms
at the flagship shape: XLA's conv path is already at the HBM roofline and
the in-kernel relayout work here costs more than the HBM traffic it
saves.  Kept as the working record of the staged-kernel technique and the
Mosaic layout constraints it navigates; full analysis in DESIGN.md §15.

The original motivation: conv0+InstanceNorm0 alone is ~3 ms of the
forward at batch 512 — the [B, 7891, 32] first-layer activation (517 MB)
makes ~5 round trips through HBM for the conv write and the
InstanceNorm/LeakyReLU passes, and the backward pass repeats the traffic.
This module runs the four-conv stack (conv0..conv3 + InstanceNorm +
LeakyReLU, audio_encoder.py:39-61) as THREE ``pallas_call`` stages per
direction, with each stage's activations resident in VMEM.

Layout strategy (the part Mosaic dictates): inside a kernel the lane
(minor) dimension can only be changed by a matmul — lane-splitting or
lane-folding reshapes do not lower.  So every stage

- READS its input in "row layout": ``[B, R, 6*C]`` where row ``r`` holds
  times ``6r..6r+5`` sample-major (lane ``s*C + c``).  A stride-6 k-15
  conv then only ever needs rows ``t..t+2`` for output ``t`` — three
  row-shifted ``[B*T_out, 6C] @ [6C, C_out]`` matmuls (taps zero-padded
  15->18), clean MXU shapes, no gathers;
- WRITES its output time-major ``[B, T_out, C_out]`` (the matmul's
  natural shape).  The time-major -> row relayout for the NEXT stage is
  a contiguous, zero-copy XLA reshape in HBM between the pallas calls
  (``[B, T, C] -> [B, T/6, 6C]`` is layout-preserving row-major), so the
  stage boundary costs one HBM round trip of the (small) pre-norm
  activation instead of an unsupported in-kernel relayout;
- conv0 (C_in=1, stride 5) is one dense ``[B*R1, 45] @ [45, 192]``
  matmul over an XLA-built 45-sample im2col (row ``r`` = samples
  ``30r..30r+44``), with the row structure folded into the weight
  matrix — the matmul itself performs the time->row relayout.

HBM traffic collapses from ~5 passes over the 517 MB first activation to
one write + one read of each boundary tensor (~600 MB total forward).
InstanceNorm statistics are two-pass masked sums over the VMEM-resident
activation (pad positions excluded via 0/1 masks in row layout).  The
backward stages recompute their activations from the saved boundary
tensors (VPU recompute beats extra HBM traffic), recover pre-activation
signs and x-hat from post-LeakyReLU values (slope 0.3 preserves sign:
xhat = a if a > 0 else a/0.3), and accumulate weight/bias gradients
across the batch grid in-kernel.

Semantics identical to ``WavEncoder.__call__`` (torch InstanceNorm1d
affine=False, eps 1e-5; reference ``scripts/model/audio_enc.py:6-25``).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["WavDims", "pack_wav_params", "fused_wav_encoder"]

_EPS = 1e-5
_G = 6  # samples per activation row


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class WavDims:
    """All static geometry for waveform length ``L`` (conv semantics of
    audio_enc.py: k15, strides 5/6/6/6, conv0 padded 1600/side)."""

    def __init__(self, length: int):
        self.L = length
        self.T1 = (length + 3200 - 15) // 5 + 1
        self.T2 = (self.T1 - 15) // 6 + 1
        self.T3 = (self.T2 - 15) // 6 + 1
        self.T4 = (self.T3 - 15) // 6 + 1
        if self.T4 < 1:
            raise ValueError(f"waveform too short: {length}")
        self.T2p = _ceil_to(self.T2, _G)
        self.T3p = _ceil_to(self.T3, _G)
        # A1 rows: conv1's last (padded) window T2p-1 reads rows ..T2p+1
        self.R1 = max(self.T2p + 2, -(-self.T1 // _G))
        # A2 rows: conv2 windows need rows ..T3p+1; stage A emits ceil(T2p/6)
        self.R2 = max(self.T3p + 2, -(-self.T2p // _G))
        # A3 rows: conv3 windows need rows ..T4+1; stage B emits ceil(T3p/6)
        self.R3 = max(self.T4 + 2, -(-self.T3p // _G))
        # padded wav: im2col row R1-1 reads samples ..30*R1+14; building the
        # 45-lane rows from two 30-wide reshapes needs one spare row
        self.L5 = 30 * (self.R1 + 1)

    def im2col(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, L] -> [B, R1, 45]: conv0's 1600 zero-pad + overlapping
        45-sample rows (row r = padded samples 30r..30r+44)."""
        b = wav.shape[0]
        wavp = jnp.zeros((b, self.L5), jnp.float32)
        wavp = wavp.at[:, 1600:1600 + self.L].set(wav.astype(jnp.float32))
        w30 = wavp[:, :30 * self.R1].reshape(b, self.R1, 30)
        w30s = wavp[:, 30:30 * (self.R1 + 1)].reshape(b, self.R1, 30)
        return jnp.concatenate([w30, w30s[:, :, :15]], axis=-1)

    def fold_im2col_grad(self, dx45: jnp.ndarray) -> jnp.ndarray:
        """[B, R1, 45] cotangent -> [B, L]: overlap-add the 45-sample rows
        back onto the padded waveform, then crop conv0's padding."""
        b = dx45.shape[0]
        base = dx45[:, :, :30].reshape(b, 30 * self.R1)
        shift = jnp.concatenate(
            [dx45[:, :, 30:], jnp.zeros((b, self.R1, 15), jnp.float32)],
            axis=-1,
        ).reshape(b, 30 * self.R1)
        dwavp = jnp.zeros((b, self.L5), jnp.float32)
        dwavp = dwavp.at[:, :30 * self.R1].add(base)
        dwavp = dwavp.at[:, 30:30 * (self.R1 + 1)].add(shift)
        return dwavp[:, 1600:1600 + self.L]

    def masks(self):
        """0/1 f32 row-layout masks selecting real time positions."""

        def mk(rows, chans, t_real):
            m = np.zeros((rows, _G, chans), np.float32)
            for s in range(_G):
                # time of (row r, group s) = 6r + s
                rmax = (t_real - s + _G - 1) // _G  # rows with 6r+s < t_real
                m[:rmax, s, :] = 1.0
                if rmax > 0 and _G * (rmax - 1) + s >= t_real:
                    m[rmax - 1, s, :] = 0.0
            return jnp.asarray(m.reshape(rows, _G * chans))

        return (
            mk(self.R1, 32, self.T1),
            mk(self.R2, 64, self.T2),
            mk(self.R3, 128, self.T3),
        )


def pack_wav_params(conv_params: Dict) -> Dict:
    """Flax WavEncoder conv params -> kernel layout.

    w0: [45, 192] dense conv0-as-matmul matrix over the 45-sample im2col
    rows (entry (j, s*32+c) = kernel[j-5s, c] when 0 <= j-5s < 15); b0 is
    row-tiled [1, 192].  w1/w2/w3: [3, 6*C_in, C_out] (taps zero-padded
    15->18, rows sample-major: row = s*C_in + ch for sample offset s in
    the 6-block).  Biases as [1, C].  Pure jnp, so the packing is
    differentiable and its VJP routes the kernel's padded-layout
    gradients back to the real [15, C_in, C_out] params (summing the
    tiled copies, discarding the structurally-absent taps).
    """

    def wide(kernel):
        k, cin, cout = kernel.shape
        assert k == 15
        w = jnp.zeros((18, cin, cout), jnp.float32)
        w = w.at[:15].set(jnp.asarray(kernel, jnp.float32))
        return w.reshape(3, _G * cin, cout)

    p = conv_params
    k0 = jnp.asarray(p["conv0"]["kernel"], jnp.float32)[:, 0, :]  # [15, 32]
    cols = []
    for s in range(_G):
        blk = jnp.zeros((45, 32), jnp.float32)
        cols.append(blk.at[5 * s:5 * s + 15].set(k0))
    return {
        "w0": jnp.concatenate(cols, axis=1),  # [45, 192]
        "b0": jnp.tile(jnp.asarray(p["conv0"]["bias"], jnp.float32), _G)[None],
        "w1": wide(p["conv1"]["kernel"]),
        "b1": jnp.asarray(p["conv1"]["bias"], jnp.float32)[None],
        "w2": wide(p["conv2"]["kernel"]),
        "b2": jnp.asarray(p["conv2"]["bias"], jnp.float32)[None],
        "w3": wide(p["conv3"]["kernel"]),
        "b3": jnp.asarray(p["conv3"]["bias"], jnp.float32)[None],
    }


def _group_mat(chans):
    """[G*C, C] 0/1 matrix with F[s*C+c, c'] = (c == c').  Lane-dimension
    changes inside a Mosaic kernel are only expressible as matmuls, so the
    row-layout<->per-channel stat maps go through this tiny matrix (built
    from iotas: constants and lane reshapes don't lower either)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (_G, chans, chans), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (_G, chans, chans), 2)
    return jnp.where(i == j, 1.0, 0.0).reshape(_G * chans, chans)


def _fold(x, chans):
    """[TB, G*C] -> [TB, C]: sum the 6 sample groups of a row."""
    return jax.lax.dot_general(
        x, _group_mat(chans), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tile(x):
    """[TB, C] -> [TB, 1, G*C]: broadcast per-channel stats to row layout."""
    chans = x.shape[-1]
    y = jax.lax.dot_general(
        x, jnp.swapaxes(_group_mat(chans), 0, 1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y[:, None, :]


def _conv_rows(a, w_ref, b_ref, t_out, c_in):
    """rows [TB, R, 6*C_in] -> [TB, t_out, C_out] via 3 shifted matmuls."""
    tb = a.shape[0]
    gc = _G * c_in
    acc = None
    for c in range(3):
        x = a[:, c:c + t_out, :].reshape(tb * t_out, gc)
        y = jax.lax.dot_general(
            x, w_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    c_out = acc.shape[-1]
    return acc.reshape(tb, t_out, c_out) + b_ref[:][None]


def _in_lrelu(pre, mask, t_real, chans, leak):
    """Masked InstanceNorm (affine=False, eps 1e-5) + LeakyReLU in row
    layout.  Returns (post, inv_tiled)."""
    m = mask[None]
    s = _fold(jnp.sum(pre * m, axis=1), chans)
    mu = s / t_real
    mub = _tile(mu)
    dvar = (pre - mub) * m
    v = _fold(jnp.sum(dvar * dvar, axis=1), chans) / t_real
    invb = _tile(jax.lax.rsqrt(v + _EPS))
    xhat = (pre - mub) * invb
    post = jnp.where(xhat > 0, xhat, leak * xhat)
    return post, invb


def _pad_tail_rows(x, total):
    """[TB, T, C] -> [TB, total, C] zero-padded on the time axis."""
    tb, t, c = x.shape
    if total == t:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((tb, total - t, c), jnp.float32)], axis=1
    )


# --------------------------------------------------------------------------
# forward kernels
# --------------------------------------------------------------------------


def _fwd_a(x45_ref, w0, b0, w1, b1, mask0, out_ref, *, d: WavDims, leak):
    x = x45_ref[:]
    tb = x.shape[0]
    m0 = jax.lax.dot_general(
        x.reshape(tb * d.R1, 45), w0[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, d.R1, _G * 32) + b0[:][None]
    a1, _ = _in_lrelu(m0, mask0[:], d.T1, 32, leak)
    m1 = _conv_rows(a1, w1, b1, d.T2p, 32)  # [TB, T2p, 64]
    out_ref[:] = _pad_tail_rows(m1, _G * d.R2)


def _fwd_b(m1r_ref, w2, b2, mask1, out_ref, *, d: WavDims, leak):
    a2, _ = _in_lrelu(m1r_ref[:], mask1[:], d.T2, 64, leak)
    m2 = _conv_rows(a2, w2, b2, d.T3p, 64)  # [TB, T3p, 128]
    out_ref[:] = _pad_tail_rows(m2, _G * d.R3)


def _fwd_c(m2r_ref, w3, b3, mask2, out_ref, *, d: WavDims, leak):
    a3, _ = _in_lrelu(m2r_ref[:], mask2[:], d.T3, 128, leak)
    out_ref[:] = _conv_rows(a3, w3, b3, d.T4, 128)  # [TB, T4, 256]


# --------------------------------------------------------------------------
# backward kernels (recompute activations from the saved stage inputs)
# --------------------------------------------------------------------------


def _pad_rows(x, offset, rows):
    """[TB, T, C] -> [TB, rows, C] with the T rows placed at ``offset``.
    Zero-size pads are skipped (Mosaic rejects empty vectors)."""
    tb, t, c = x.shape
    parts = []
    if offset:
        parts.append(jnp.zeros((tb, offset, c), jnp.float32))
    parts.append(x)
    if rows - offset - t:
        parts.append(jnp.zeros((tb, rows - offset - t, c), jnp.float32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _dotT(a2d, b2d):
    """A^T B with explicit transpose (Mosaic-safe): [N,K]x[N,M] -> [K,M]."""
    return jax.lax.dot_general(
        jnp.swapaxes(a2d, 0, 1), b2d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _in_bwd(g_post, a_post, invb, mask, t_real, chans, leak):
    """Backward through LeakyReLU+InstanceNorm given post-activation grad.

    xhat and the pre-act sign are recovered from the stored post value
    (slope preserves sign).  g_post must already be zero at pad positions;
    the output is re-masked."""
    gy = g_post * jnp.where(a_post > 0, 1.0, leak)
    xhat = jnp.where(a_post > 0, a_post, a_post * (1.0 / leak))
    t1 = _tile(_fold(jnp.sum(gy, axis=1), chans) / t_real)
    t2 = _tile(_fold(jnp.sum(gy * xhat, axis=1), chans) / t_real)
    return invb * (gy - t1 - xhat * t2) * mask[None]


def _conv_rows_bwd(a_rows, g_tm, w, t_out, c_in, rows, dw_ref):
    """Given row-layout input ``a_rows`` [TB, rows, 6*C_in] and the conv's
    time-major output cotangent ``g_tm`` [TB, t_out, C_out], accumulate
    dW into ``dw_ref`` [3, 6*C_in, C_out] and return d(a_rows)."""
    tb = a_rows.shape[0]
    gc = _G * c_in
    c_out = g_tm.shape[-1]
    g2d = g_tm.reshape(tb * t_out, c_out)
    da = None
    for c in range(3):
        dw_ref[c] += _dotT(
            a_rows[:, c:c + t_out, :].reshape(tb * t_out, gc), g2d
        )
        contrib = jax.lax.dot_general(
            g2d, jnp.swapaxes(w[c], 0, 1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tb, t_out, gc)
        p = _pad_rows(contrib, c, rows)
        da = p if da is None else da + p
    return da


def _sum_bias(g):
    """[TB, T, C] -> [1, C]: bias cotangent."""
    return jnp.sum(jnp.sum(g, axis=0), axis=0, keepdims=True)


def _init_accs(*refs):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:] = jnp.zeros(ref.shape, ref.dtype)


def _bwd_c(m2r_ref, g_ref, w3, mask2, gm2r_ref, dw3_ref, db3_ref,
           *, d: WavDims, leak):
    _init_accs(dw3_ref, db3_ref)
    a3, inv2 = _in_lrelu(m2r_ref[:], mask2[:], d.T3, 128, leak)
    g = g_ref[:]  # [TB, T4, 256]
    db3_ref[:] += _sum_bias(g)
    da3 = _conv_rows_bwd(a3, g, w3, d.T4, 128, d.R3, dw3_ref)
    gm2r_ref[:] = _in_bwd(da3, a3, inv2, mask2[:], d.T3, 128, leak)


def _bwd_b(m1r_ref, g_ref, w2, mask1, gm1r_ref, dw2_ref, db2_ref,
           *, d: WavDims, leak):
    _init_accs(dw2_ref, db2_ref)
    a2, inv1 = _in_lrelu(m1r_ref[:], mask1[:], d.T2, 64, leak)
    g = g_ref[:]  # [TB, T3p, 128], zero at pad times
    db2_ref[:] += _sum_bias(g)
    da2 = _conv_rows_bwd(a2, g, w2, d.T3p, 64, d.R2, dw2_ref)
    gm1r_ref[:] = _in_bwd(da2, a2, inv1, mask1[:], d.T2, 64, leak)


def _bwd_a(x45_ref, g_ref, w0, b0, w1, mask0, dx45_ref,
           dw0_ref, db0_ref, dw1_ref, db1_ref, *, d: WavDims, leak):
    _init_accs(dw0_ref, db0_ref, dw1_ref, db1_ref)
    x = x45_ref[:]
    tb = x.shape[0]
    x2d = x.reshape(tb * d.R1, 45)
    m0 = jax.lax.dot_general(
        x2d, w0[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, d.R1, _G * 32) + b0[:][None]
    a1, inv0 = _in_lrelu(m0, mask0[:], d.T1, 32, leak)
    g = g_ref[:]  # [TB, T2p, 64], zero at pad times
    db1_ref[:] += _sum_bias(g)
    da1 = _conv_rows_bwd(a1, g, w1, d.T2p, 32, d.R1, dw1_ref)
    g_m0 = _in_bwd(da1, a1, inv0, mask0[:], d.T1, 32, leak)
    db0_ref[:] += _sum_bias(g_m0)
    g_m0_2d = g_m0.reshape(tb * d.R1, _G * 32)
    dw0_ref[:] += _dotT(x2d, g_m0_2d)
    dx45_ref[:] = jax.lax.dot_general(
        g_m0_2d, jnp.swapaxes(w0[:], 0, 1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, d.R1, 45)


# --------------------------------------------------------------------------
# pallas_call plumbing
# --------------------------------------------------------------------------


def _full(*shape):
    return pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )


def _batched(*shape):
    n = len(shape)
    return pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (n - 1), memory_space=pltpu.VMEM
    )


def _params(nbytes):
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(int(nbytes), 120 << 20)
    )


def _stage_a_fwd(x45, packed, masks, d, tb, b_pad, leak):
    vmem = tb * 4 * d.R1 * (128 + 3 * 256) + tb * 4 * _G * d.R2 * 128
    return pl.pallas_call(
        functools.partial(_fwd_a, d=d, leak=leak),
        grid=(b_pad // tb,),
        compiler_params=_params(1.5 * vmem + (8 << 20)),
        in_specs=[
            _batched(tb, d.R1, 45),
            _full(45, _G * 32), _full(1, _G * 32),
            _full(3, _G * 32, 64), _full(1, 64),
            _full(d.R1, _G * 32),
        ],
        out_specs=_batched(tb, _G * d.R2, 64),
        out_shape=jax.ShapeDtypeStruct((b_pad, _G * d.R2, 64), jnp.float32),
    )(x45, packed["w0"], packed["b0"], packed["w1"], packed["b1"], masks[0])


def _stage_b_fwd(m1r, packed, masks, d, tb, b_pad, leak):
    vmem = tb * 4 * (3 * d.R2 * 384 + _G * d.R3 * 128)
    return pl.pallas_call(
        functools.partial(_fwd_b, d=d, leak=leak),
        grid=(b_pad // tb,),
        compiler_params=_params(1.5 * vmem + (8 << 20)),
        in_specs=[
            _batched(tb, d.R2, _G * 64),
            _full(3, _G * 64, 128), _full(1, 128),
            _full(d.R2, _G * 64),
        ],
        out_specs=_batched(tb, _G * d.R3, 128),
        out_shape=jax.ShapeDtypeStruct((b_pad, _G * d.R3, 128), jnp.float32),
    )(m1r, packed["w2"], packed["b2"], masks[1])


def _stage_c_fwd(m2r, packed, masks, d, tb, b_pad, leak):
    vmem = tb * 4 * (3 * d.R3 * 768 + d.T4 * 256)
    return pl.pallas_call(
        functools.partial(_fwd_c, d=d, leak=leak),
        grid=(b_pad // tb,),
        compiler_params=_params(1.5 * vmem + (8 << 20)),
        in_specs=[
            _batched(tb, d.R3, _G * 128),
            _full(3, _G * 128, 256), _full(1, 256),
            _full(d.R3, _G * 128),
        ],
        out_specs=_batched(tb, d.T4, 256),
        out_shape=jax.ShapeDtypeStruct((b_pad, d.T4, 256), jnp.float32),
    )(m2r, packed["w3"], packed["b3"], masks[2])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_wav_encoder(wav, packed, leak=0.3, batch_tile=8):
    """[B, L] float32 waveform + packed conv params -> [B, T4, 256].

    Drop-in replacement for the WavEncoder conv stack with hand-written
    Pallas forward and backward stages.  f32, single-device."""
    y, _ = _fwd_impl(wav, packed, leak, batch_tile)
    return y


def _fwd_impl(wav, packed, leak, batch_tile):
    b, length = wav.shape
    d = WavDims(length)
    tb = min(batch_tile, b)
    b_pad = _ceil_to(b, tb)
    if b_pad > b:
        wav = jnp.concatenate(
            [wav.astype(jnp.float32),
             jnp.zeros((b_pad - b, length), jnp.float32)]
        )
    x45 = d.im2col(wav)
    masks = d.masks()
    m1 = _stage_a_fwd(x45, packed, masks, d, tb, b_pad, leak)
    m1r = m1.reshape(b_pad, d.R2, _G * 64)   # zero-copy: contiguous fold
    m2 = _stage_b_fwd(m1r, packed, masks, d, tb, b_pad, leak)
    m2r = m2.reshape(b_pad, d.R3, _G * 128)
    out = _stage_c_fwd(m2r, packed, masks, d, tb, b_pad, leak)
    return out[:b], (x45, m1r, m2r, packed, (b, length, tb, b_pad))


def _vjp_fwd(wav, packed, leak, batch_tile):
    return _fwd_impl(wav, packed, leak, batch_tile)


def _vjp_bwd(leak, batch_tile, res, g):
    x45, m1r, m2r, packed, (b, length, tb, b_pad) = res
    d = WavDims(length)
    masks = d.masks()
    gp = g.astype(jnp.float32)
    if b_pad > b:
        gp = jnp.concatenate(
            [gp, jnp.zeros((b_pad - b, d.T4, 256), jnp.float32)]
        )

    vmem_c = tb * 4 * (4 * d.R3 * 768 + d.T4 * 256)
    gm2r, dw3, db3 = pl.pallas_call(
        functools.partial(_bwd_c, d=d, leak=leak),
        grid=(b_pad // tb,),
        compiler_params=_params(1.5 * vmem_c + (8 << 20)),
        in_specs=[
            _batched(tb, d.R3, _G * 128),
            _batched(tb, d.T4, 256),
            _full(3, _G * 128, 256),
            _full(d.R3, _G * 128),
        ],
        out_specs=[
            _batched(tb, d.R3, _G * 128),
            _full(3, _G * 128, 256), _full(1, 256),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d.R3, _G * 128), jnp.float32),
            jax.ShapeDtypeStruct((3, _G * 128, 256), jnp.float32),
            jax.ShapeDtypeStruct((1, 256), jnp.float32),
        ],
    )(m2r, gp, packed["w3"], masks[2])
    g_m2 = gm2r.reshape(b_pad, _G * d.R3, 128)[:, :d.T3p]

    vmem_b = tb * 4 * (4 * d.R2 * 384 + 2 * d.T3p * 128)
    gm1r, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_b, d=d, leak=leak),
        grid=(b_pad // tb,),
        compiler_params=_params(1.5 * vmem_b + (8 << 20)),
        in_specs=[
            _batched(tb, d.R2, _G * 64),
            _batched(tb, d.T3p, 128),
            _full(3, _G * 64, 128),
            _full(d.R2, _G * 64),
        ],
        out_specs=[
            _batched(tb, d.R2, _G * 64),
            _full(3, _G * 64, 128), _full(1, 128),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d.R2, _G * 64), jnp.float32),
            jax.ShapeDtypeStruct((3, _G * 64, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
    )(m1r, g_m2, packed["w2"], masks[1])
    g_m1 = gm1r.reshape(b_pad, _G * d.R2, 64)[:, :d.T2p]

    vmem_a = tb * 4 * d.R1 * (2 * 128 + 4 * 256) + tb * 4 * d.T2p * 128
    dx45, dw0, db0, dw1, db1 = pl.pallas_call(
        functools.partial(_bwd_a, d=d, leak=leak),
        grid=(b_pad // tb,),
        compiler_params=_params(1.5 * vmem_a + (8 << 20)),
        in_specs=[
            _batched(tb, d.R1, 45),
            _batched(tb, d.T2p, 64),
            _full(45, _G * 32), _full(1, _G * 32),
            _full(3, _G * 32, 64),
            _full(d.R1, _G * 32),
        ],
        out_specs=[
            _batched(tb, d.R1, 45),
            _full(45, _G * 32), _full(1, _G * 32),
            _full(3, _G * 32, 64), _full(1, 64),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d.R1, 45), jnp.float32),
            jax.ShapeDtypeStruct((45, _G * 32), jnp.float32),
            jax.ShapeDtypeStruct((1, _G * 32), jnp.float32),
            jax.ShapeDtypeStruct((3, _G * 32, 64), jnp.float32),
            jax.ShapeDtypeStruct((1, 64), jnp.float32),
        ],
    )(x45, g_m1, packed["w0"], packed["b0"], packed["w1"], masks[0])

    d_wav = d.fold_im2col_grad(dx45)[:b]
    dpacked = {
        "w0": dw0, "b0": db0, "w1": dw1, "b1": db1,
        "w2": dw2, "b2": db2, "w3": dw3, "b3": db3,
    }
    return d_wav, dpacked


fused_wav_encoder.defvjp(_vjp_fwd, _vjp_bwd)
