#!/usr/bin/env python
"""Training-step throughput benchmark (flagship TED RAG config).

Measures the FULL jitted train step (grad + AdamW + NaN guard) the way
`TrainLoop` actually executes it — N pipelined async dispatches with one
final `block_until_ready` — NOT per-step blocking, which on this host is
dominated by ~25-30 ms of dispatch latency (docs/DESIGN.md §10).

Prints one JSON line per dtype:
    {"metric": "ted_rag_train_step_ms", "value": ..., "unit": "ms",
     "batch": 512, "compute_dtype": "...", "clips_per_sec": ...}

Usage:
    python scripts/bench_train.py                      # f32 and bf16
    python scripts/bench_train.py --dtypes bfloat16 --batch 512 --steps 30
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np


def bench_dtype(compute_dtype: str, batch: int, steps: int, latent: int,
                layers: int) -> dict:
    from livelyspeaker_tpu.diffusion import DiffusionSchedule
    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = RAGConfig.ted(latent_dim=latent, num_layers=layers)
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    cond = {
        "audio": jnp.asarray(
            rng.normal(size=(batch, audio_samples_for_frames(nf))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, cfg.n_speakers, size=(batch,))),
    }
    x = jnp.asarray(
        rng.normal(size=(batch, cfg.njoints, cfg.nfeats, nf)).astype(
            np.float32
        )
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x,
        jnp.zeros((batch,), jnp.int32),
        {**cond, "origin_x": x},
    )["params"]

    sched = DiffusionSchedule.create(steps=1000, schedule="cosine")
    tcfg = TrainConfig(lr=1e-4, compute_dtype=compute_dtype)
    tx = make_optimizer(tcfg)
    state = init_train_state(params, tx, cfg=tcfg, num_timesteps=1000)
    batch_dict = {"motion": x, **cond}
    step_fn = jax.jit(make_train_step(model, sched, tx, tcfg))

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, metrics = step_fn(state, batch_dict, key)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0

    # Steady state: pipelined dispatches, one final block (TrainLoop's mode).
    t0 = time.time()
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        state, metrics = step_fn(state, batch_dict, key)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / steps
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss under {compute_dtype}"

    return {
        "metric": "ted_rag_train_step_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "batch": batch,
        "compute_dtype": compute_dtype,
        "clips_per_sec": round(batch / dt, 1),
        "compile_s": round(compile_s, 1),
        "final_loss": round(loss, 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument(
        "--dtypes", type=str, nargs="+", default=["float32", "bfloat16"]
    )
    args = p.parse_args()

    print("devices:", jax.devices(), file=sys.stderr)
    for dt in args.dtypes:
        r = bench_dtype(dt, args.batch, args.steps, args.latent_dim, args.layers)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
