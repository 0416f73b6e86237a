#!/usr/bin/env python
"""Observed op-class time split of the sampling hot loop (round 5).

The bench's roofline fields are analytic (bench.py docstring caveat): the
tunneled `axon` backend serves no profiler RPCs (scripts/profile.py NOTE),
so a kernel-level trace of MXU vs VPU vs copy time is env-blocked.  This
script gets the same answer by MEASUREMENT instead of a trace: it times, on
the real chip at the exact bench shapes (batch 2x256 CFG, latent 512, seq
35, 8 blocks), three scanned variants of the mixer stack

  matmul : the two matmuls per block only (token-mix [T,T], channel-mix
           [D,D]) — the MXU-only skeleton, whose achieved TFLOP/s is the
           per-shape MXU speed-of-light for this program;
  vpu    : everything BUT the matmuls (2x LayerNorm, SiLU x2, residual
           adds, t-embedding add) — the VPU-only skeleton;
  full   : the real block (mlp_backbone.MLPBlock math).

If time(full) ~= time(vpu) >> time(matmul), the chain is VPU-bound and the
bench's 25-27%-of-MXU-peak number is a *consequence of the op mix*, not a
kernel deficiency — the observed confirmation DESIGN §9 previously argued
analytically.  Prints one JSON line.

``--train`` times the same three skeletons through a grad step (forward +
backward + SGD update) instead: the op-class split of one TRAINING step,
the other half of the round-4 verdict's ask (the bench's analytic number
there is 15.7% MXU at batch 512).

Usage:  python scripts/measure_op_split.py [--batch 512] [--iters 200]
        python scripts/measure_op_split.py --train --iters 50
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512,
                   help="2x bench batch 256: the CFG denoiser runs "
                        "cond+uncond in one forward")
    p.add_argument("--seq", type=int, default=35)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--iters", type=int, default=200,
                   help="scan length per timed call (amortises dispatch)")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--train", action="store_true",
                   help="time the skeletons through a grad step (forward + "
                        "backward + SGD update) instead of forward-only — "
                        "the op-class split of one TRAINING step (the "
                        "verdict's other half; the analytic bench number "
                        "is 15.7%% MXU at batch 512)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)
    B, T, D, L = args.batch, args.seq, args.dim, args.layers
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(B, 1, D)).astype(np.float32))
    wt = jnp.asarray(0.02 * rng.normal(size=(L, T, T)).astype(np.float32))
    bt = jnp.zeros((L, T))
    wc = jnp.asarray(0.02 * rng.normal(size=(L, D, D)).astype(np.float32))
    bc = jnp.zeros((L, D))
    g = jnp.ones((L, D))
    be = jnp.zeros((L, D))

    def ln(x, scale, bias):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-5) * scale + bias

    def block_full(x, p):
        x = x + emb
        h = ln(x, p["g1"], p["b1"])
        h = jnp.einsum("ij,bjd->bid", p["wt"], h) + p["bt"][None, :, None]
        x = x + jax.nn.silu(h)
        h = ln(x, p["g2"], p["b2"])
        h = jax.nn.silu(h @ p["wc"] + p["bc"])
        return x + h

    def block_matmul(x, p):
        # MXU skeleton: identical matmul shapes/order, no VPU work beyond
        # the bias adds XLA fuses into the matmul epilogue anyway
        h = jnp.einsum("ij,bjd->bid", p["wt"], x) + p["bt"][None, :, None]
        h = h @ p["wc"] + p["bc"]
        return h

    def block_vpu(x, p):
        # VPU skeleton: everything but the matmuls
        x = x + emb
        h = ln(x, p["g1"], p["b1"])
        x = x + jax.nn.silu(h)
        h = ln(x, p["g2"], p["b2"])
        return x + jax.nn.silu(h)

    stacked = {
        "wt": wt, "bt": bt, "wc": wc, "bc": bc,
        "g1": g, "b1": be, "g2": g, "b2": be,
    }

    def chain(block):
        def body(x, _):
            def per_layer(h, p):
                return block(h, p), None
            x, _ = jax.lax.scan(per_layer, x, stacked)
            # keep magnitudes bounded over the long scan
            return x / jnp.maximum(
                jnp.max(jnp.abs(x)) / 3.0, 1.0
            ), None

        def run(xin):
            out, _ = jax.lax.scan(body, xin, None, length=args.iters)
            return out

        return jax.jit(run)

    def train_chain(block):
        """fwd+bwd+update over the L-block stack, scanned ``iters`` times.

        The carry is the param stack: each step takes grad of a scalar
        loss through all L blocks and applies a tiny SGD update, so the
        backward pass (where training spends ~2/3 of its matmul FLOPs and
        re-runs every LN/SiLU chain rule on the VPU) is on the timed path
        and nothing dead-codes away."""
        def stack_fwd(params, xin):
            def per_layer(h, p):
                return block(h, p), None
            out, _ = jax.lax.scan(per_layer, xin, params)
            return jnp.mean(out * out)

        g = jax.grad(stack_fwd)

        def body(params, _):
            grads = g(params, x0)
            return jax.tree.map(
                lambda p_, g_: p_ - 1e-6 * g_, params, grads
            ), None

        def run(params):
            out, _ = jax.lax.scan(body, params, None, length=args.iters)
            return out

        return jax.jit(run)

    def timeit(fn, arg):
        out = fn(arg)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            jax.block_until_ready(fn(arg))
            best = min(best, time.time() - t0)
        return best

    res = {}
    for name, blk in (
        ("matmul", block_matmul), ("vpu", block_vpu), ("full", block_full)
    ):
        if args.train:
            res[name] = timeit(train_chain(blk), stacked)
        else:
            res[name] = timeit(chain(blk), x0)
        print(f"{name}: {res[name]:.4f}s "
              f"({args.iters} iters x {L} blocks, batch {B}, "
              f"{'train' if args.train else 'fwd'})",
              file=sys.stderr)

    matmul_flops = (
        2.0 * B * D * T * T + 2.0 * B * T * D * D
    ) * L * args.iters
    if args.train:
        # backward adds dL/dx (W^T) and dL/dW (x^T dy) matmuls per fwd
        # matmul: 3x the forward matmul FLOPs
        matmul_flops *= 3.0
    tflops_skeleton = matmul_flops / res["matmul"] / 1e12
    tflops_full = matmul_flops / res["full"] / 1e12
    peak = 197.0  # TPU v5e bf16/f32-accum MXU peak TFLOP/s (bench.py)
    print(json.dumps({
        "mode": "train" if args.train else "fwd",
        "batch": B, "seq": T, "dim": D, "layers": L, "iters": args.iters,
        "t_matmul_s": round(res["matmul"], 4),
        "t_vpu_s": round(res["vpu"], 4),
        "t_full_s": round(res["full"], 4),
        "vpu_over_matmul": round(res["vpu"] / res["matmul"], 2),
        "overlap_frac": round(
            (res["matmul"] + res["vpu"] - res["full"])
            / max(res["matmul"] + res["vpu"], 1e-9), 3),
        "mxu_tflops_matmul_skeleton": round(tflops_skeleton, 1),
        "pct_mxu_peak_matmul_skeleton": round(
            100 * tflops_skeleton / peak, 1),
        "mxu_tflops_full": round(tflops_full, 1),
        "pct_mxu_peak_full": round(100 * tflops_full / peak, 1),
    }))


if __name__ == "__main__":
    main()
