#!/usr/bin/env python
"""Capture a device profile of the hot paths (sampling / training).

Writes a ``jax.profiler`` trace (TensorBoard 'profile' plugin format /
Perfetto) so kernel-level time on the TPU can be inspected — the
observability counterpart of bench.py's wall-clock numbers.

    python scripts/profile.py --what sampler --trace_dir /tmp/ls_trace
    python scripts/profile.py --what train --batch 512
    tensorboard --logdir /tmp/ls_trace   # or load into Perfetto

NOTE: trace collection requires a backend the profiler can reach —
remote-tunneled devices (the `axon` platform) do not serve profiling RPCs
and the capture hangs; use ``--platform cpu`` there to profile the XLA
program structure, or run on a directly-attached TPU for device kernels.

The reference has no profiling tooling (its eval scripts time nothing).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import numpy as np


def profile_sampler(args):
    import jax.numpy as jnp

    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )
    from livelyspeaker_tpu.pipeline import RAGSampler
    from livelyspeaker_tpu.utils.profiling import device_trace

    cfg = RAGConfig.ted()
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    b = args.batch
    cond = {
        "audio": jnp.asarray(
            rng.normal(size=(b, audio_samples_for_frames(cfg.nframes))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, cfg.n_speakers, size=(b,))),
        "origin_x": jnp.zeros((b, cfg.njoints, cfg.nfeats, cfg.nframes)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        cond["origin_x"],
        jnp.zeros((b,), jnp.int32),
        cond,
    )["params"]
    sampler = RAGSampler(
        model,
        params,
        steps=args.steps,
        timestep_respacing=args.timestep_respacing or None,
        method=args.sampler,
        use_fused=not args.no_fused,
    )
    key = jax.random.PRNGKey(0)
    out = sampler(cond, key)  # compile outside the trace
    jax.block_until_ready(out)
    with device_trace(args.trace_dir):
        for i in range(args.iters):
            out = sampler(cond, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
    print(f"sampler trace ({args.iters} iters, batch {b}) -> {args.trace_dir}")


def profile_train(args):
    import jax.numpy as jnp

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
    from livelyspeaker_tpu.utils.profiling import device_trace

    cfg = RAGConfig.ted()
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    b = args.batch
    batch = {
        "motion": jnp.asarray(
            rng.normal(size=(b, cfg.njoints, cfg.nfeats, cfg.nframes)).astype(
                np.float32
            )
        ),
        "audio": jnp.asarray(
            rng.normal(size=(b, audio_samples_for_frames(cfg.nframes))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, cfg.n_speakers, size=(b,))),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        batch["motion"],
        jnp.zeros((b,), jnp.int32),
        {"audio": batch["audio"], "vid": batch["vid"],
         "origin_x": batch["motion"]},
    )["params"]
    sched = DiffusionSchedule.create(steps=1000, schedule="cosine")
    tcfg = TrainConfig(lr=1e-4)
    tx = make_optimizer(tcfg)
    state = init_train_state(params, tx, cfg=tcfg, num_timesteps=1000)
    step = jax.jit(make_train_step(model, sched, tx, tcfg))
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)  # compile outside the trace
    jax.block_until_ready(m)
    with device_trace(args.trace_dir):
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(m)
    print(f"train trace ({args.iters} steps, batch {b}) -> {args.trace_dir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["sampler", "train"], default="sampler")
    p.add_argument("--trace_dir", type=str, default="/tmp/ls_tpu_trace")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--timestep_respacing", type=str, default="")
    p.add_argument("--sampler", type=str, default="ddpm",
                   choices=["ddpm", "ddim", "plms", "dpmpp"])
    p.add_argument("--no_fused", action="store_true")
    p.add_argument("--platform", type=str, default="",
                   help="pin the jax platform (e.g. 'cpu' on hosts whose "
                        "device is remote-tunneled and can't serve traces)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    (profile_sampler if args.what == "sampler" else profile_train)(args)


if __name__ == "__main__":
    main()
