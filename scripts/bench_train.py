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
                layers: int, fused_train: bool = False,
                audio_bf16: bool = False) -> dict:
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

    cfg = RAGConfig.ted(latent_dim=latent, num_layers=layers,
                        fused_train_backbone=fused_train,
                        audio_bf16=audio_bf16)
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
    float(metrics["loss"])  # true sync (see steady-state note below)
    compile_s = time.time() - t0

    # Steady state: pipelined dispatches, one final block (TrainLoop's mode).
    t0 = time.time()
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        state, metrics = step_fn(state, batch_dict, key)
    jax.block_until_ready(metrics)
    # Scalar fetch BEFORE the clock stops: on tunneled backends
    # block_until_ready can return with executes still outstanding; the
    # fetch depends on the whole dispatch chain, so it is a true sync.
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / steps
    assert np.isfinite(loss), f"non-finite loss under {compute_dtype}"

    from bench import V5E_BF16_PEAK_FLOPS, train_step_matmul_flops

    tflops = train_step_matmul_flops(cfg, batch) / dt / 1e12
    return {
        "metric": "ted_rag_train_step_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "batch": batch,
        "compute_dtype": compute_dtype,
        "fused_train": fused_train,
        "audio_bf16": audio_bf16,
        "clips_per_sec": round(batch / dt, 1),
        "mxu_tflops": round(tflops, 2),
        "pct_mxu_peak": round(100.0 * tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 2),
        "compile_s": round(compile_s, 1),
        "final_loss": round(loss, 4),
    }


def bench_loaders(batch: int, steps: int, latent: int, layers: int) -> list:
    """END-TO-END training throughput including the data path, for both
    loaders (streaming DataLoader vs HBM-resident DeviceDataLoader) on the
    synthetic record set — the measurement that exposed the 163x
    transfer-bound gap on remote-dispatch hosts (docs/DESIGN.md §13)."""
    import tempfile

    from livelyspeaker_tpu.data import (
        DataLoader,
        DeviceDataLoader,
        TedWindowDataset,
    )
    from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records
    from livelyspeaker_tpu.data.ted import TedConfig
    from livelyspeaker_tpu.diffusion import DiffusionSchedule
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth_bench")
    if not os.path.exists(os.path.join(data_dir, "meta.json")):
        build_synthetic_ted_records(
            data_dir, n_clips=40, clip_seconds=20,
            cfg=TedConfig(audio_dtype="int16"),
        )
    dataset = TedWindowDataset(data_dir)
    fields = ("motion", "audio", "vid")
    batch = min(batch, len(dataset) // 2)

    cfg = RAGConfig.ted(latent_dim=latent, num_layers=layers)
    model = RAG(cfg)
    b0 = dataset.batch(range(batch), fields=fields)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.asarray(b0["motion"]),
        jnp.zeros((batch,), jnp.int32),
        {"audio": jnp.asarray(b0["audio"]), "vid": jnp.asarray(b0["vid"]),
         "origin_x": jnp.asarray(b0["motion"])},
    )["params"]
    sched = DiffusionSchedule.create(steps=1000, schedule="cosine")
    tcfg = TrainConfig(lr=1e-4)
    tx = make_optimizer(tcfg)
    step_fn = jax.jit(make_train_step(model, sched, tx, tcfg))

    rows = []
    for name, loader in (
        ("streaming", DataLoader(dataset, batch_size=batch, shuffle=True,
                                 seed=7, fields=fields)),
        ("device_resident", DeviceDataLoader(dataset, batch_size=batch,
                                             shuffle=True, seed=7,
                                             fields=fields)),
    ):
        state = init_train_state(params, tx, cfg=tcfg, num_timesteps=1000)
        key = jax.random.PRNGKey(1)
        done = 0
        # warm (compile) one step
        for b in loader:
            state, metrics = step_fn(state, b, key)
            jax.block_until_ready(metrics)
            break
        t0 = time.time()
        while done < steps:
            for b in loader:
                if done >= steps:
                    break
                key = jax.random.fold_in(key, done)
                state, metrics = step_fn(state, b, key)
                done += 1
        jax.block_until_ready(metrics)
        float(metrics["loss"])  # true sync; block alone can return early
        dt = (time.time() - t0) / steps
        rows.append({
            "metric": "ted_rag_train_e2e_step_ms",
            "loader": name,
            "value": round(dt * 1e3, 2),
            "unit": "ms",
            "batch": batch,
            "clips_per_sec": round(batch / dt, 1),
        })
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument(
        "--dtypes", type=str, nargs="+", default=["float32", "bfloat16"]
    )
    p.add_argument("--fused_train", action="store_true",
                   help="mixer backbone through the fused Pallas kernel "
                        "with hand-written backward")
    p.add_argument("--audio_bf16", action="store_true",
                   help="bf16 activations for the HBM-bound WavEncoder "
                        "conv stack (params/features stay f32)")
    p.add_argument("--loaders", action="store_true",
                   help="also measure end-to-end steps/s with the "
                        "streaming vs device-resident loaders")
    args = p.parse_args()

    print("devices:", jax.devices(), file=sys.stderr)
    for dt in args.dtypes:
        r = bench_dtype(dt, args.batch, args.steps, args.latent_dim,
                        args.layers, fused_train=args.fused_train,
                        audio_bf16=args.audio_bf16)
        print(json.dumps(r))
    if args.loaders:
        for r in bench_loaders(args.batch, args.steps, args.latent_dim,
                               args.layers):
            print(json.dumps(r))


if __name__ == "__main__":
    main()
