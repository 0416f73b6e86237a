#!/usr/bin/env python
"""N-process data-parallel training demo — the multi-host DCN path.

Proves what the reference's dist_util only gestured at
(``scripts/mdm_utils/dist_util.py:26-41``, commented-out MPI/NCCL init):
N processes, each with its own devices and its own shard of the data
stream, jointly executing one global SPMD train step.  On CPU hosts the
"DCN" is gRPC; on TPU pods the same code rides the real interconnect —
only ``init_distributed``'s arguments change.

Launch (N processes on one machine, e.g. 2, 4 virtual CPU devices each):

    python scripts/train_multihost_demo.py --process_id 0 &
    python scripts/train_multihost_demo.py --process_id 1

(4 processes: add --num_processes 4 and launch --process_id 0..3.)
Each process prints the per-step global loss; the printed values must be
identical across processes (same global computation).  When the window
count doesn't divide the process count, the loader truncates every host
shard to the common minimum so the epoch tail stays lockstep
(data/loader.py) — exercised by tests/test_multihost.py at 4 processes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", type=str, default="localhost:12355")
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--devices_per_process", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--local_batch", type=int, default=4)
    p.add_argument("--latent_dim", type=int, default=32)
    p.add_argument("--layers", type=int, default=1)
    p.add_argument("--platform", type=str, default="cpu")
    return p.parse_args()


def main():
    args = parse_args()

    # Provision the virtual CPU devices BEFORE jax initialises.
    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.devices_per_process}"
            )
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from livelyspeaker_tpu.parallel.multihost import (
        global_batch,
        init_distributed,
    )

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes

    import jax.numpy as jnp

    from livelyspeaker_tpu.data.loader import DataLoader
    from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records
    from livelyspeaker_tpu.data.ted import TedWindowDataset
    from livelyspeaker_tpu.diffusion import DiffusionSchedule
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.parallel import create_mesh, replicated
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    # Global mesh spanning every process's devices; pure DP.
    mesh = create_mesh()
    n_global = len(jax.devices())
    print(
        f"[p{jax.process_index()}] {jax.local_device_count()} local / "
        f"{n_global} global devices, mesh={dict(mesh.shape)}",
        flush=True,
    )

    # Every process materialises the SAME tiny synthetic record set (fixed
    # seed, per-process dir), then DataLoader host-shards the shared index
    # stream: host i sees indices i::num_hosts (loader.py:53-55).
    import tempfile

    data_dir = os.path.join(
        tempfile.gettempdir(), f"ls_tpu_mh_{jax.process_index()}"
    )
    if not os.path.exists(os.path.join(data_dir, "meta.json")):
        build_synthetic_ted_records(data_dir, n_clips=2, clip_seconds=10)
    ds = TedWindowDataset(data_dir)
    loader = DataLoader(
        ds,
        batch_size=args.local_batch,
        shuffle=True,
        seed=233,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
    )

    def _collate(batch):
        return {k: batch[k] for k in ("motion", "audio", "vid")}

    loader.collate = _collate

    cfg = RAGConfig.ted(latent_dim=args.latent_dim, num_layers=args.layers)
    model = RAG(cfg)
    sched = DiffusionSchedule.create(steps=50, schedule="cosine")
    tcfg = TrainConfig(lr=1e-3)
    tx = make_optimizer(tcfg)

    # Identical-seed init, compiled with replicated output shardings so the
    # params are global arrays shared by all processes.
    b0 = ds.batch([0])

    def init_params():
        return model.init(
            {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1),
             "cond_mask": jax.random.PRNGKey(2)},
            jnp.asarray(b0["motion"]),
            jnp.zeros((1,), jnp.int32),
            {"audio": jnp.asarray(b0["audio"]),
             "vid": jnp.asarray(b0["vid"]),
             "origin_x": jnp.asarray(b0["motion"])},
            train=True,
        )["params"]

    params = jax.jit(init_params, out_shardings=replicated(mesh))()
    state = jax.jit(
        lambda p: init_train_state(p, tx, cfg=tcfg,
                                   num_timesteps=sched.num_timesteps)
    )(params)
    step_fn = jax.jit(make_train_step(model, sched, tx, tcfg),
                      donate_argnums=0)

    print(
        f"[p{jax.process_index()}] {len(ds)} windows -> "
        f"{len(loader)} local batches/epoch "
        f"(host shard truncated to {len(ds) // jax.process_count()}; "
        f"uneven={len(ds) % jax.process_count() != 0})",
        flush=True,
    )

    if len(loader) == 0:
        raise SystemExit(
            f"dataset too small for this process count: "
            f"{len(ds)} windows -> {len(ds) // jax.process_count()} per host "
            f"< local_batch {args.local_batch}; reduce --num_processes or "
            f"--local_batch"
        )
    it = iter(loader)
    for step in range(args.steps):
        try:
            local = next(it)
        except StopIteration:
            # Epoch rollover.  Safe in lockstep: the per-host shard is
            # truncated to the common minimum (loader.py), so every
            # process exhausts its epoch at the SAME step.
            it = iter(loader)
            local = next(it)
        gbatch = global_batch(local, mesh)  # [num_procs*local_batch, ...]
        state, metrics = step_fn(state, gbatch, jax.random.PRNGKey(step))
        loss = float(metrics["loss"])
        gnorm = float(metrics["grad_norm"])
        print(
            f"[p{jax.process_index()}] step={step} "
            f"global_batch={gbatch['motion'].shape[0]} "
            f"loss={loss:.6f} grad_norm={gnorm:.6f}",
            flush=True,
        )
    print(f"[p{jax.process_index()}] multihost demo OK", flush=True)


if __name__ == "__main__":
    main()
