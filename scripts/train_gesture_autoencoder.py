#!/usr/bin/env python
"""Train a gesture autoencoder to serve as the FGD/FID evaluation fixture.

The reference *downloads* its frozen TriModal autoencoder checkpoint
(README.md:72, ted_evaluator.py:14-23); this script lets you train an
equivalent fixture from your own records (reconstruction MSE objective,
embedding_net.py:261-275 structure).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import optax

from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
from livelyspeaker_tpu.models.embedding_net import GestureAutoencoder
from livelyspeaker_tpu.training.checkpoints import save_args, save_params_npz
from livelyspeaker_tpu.training.logging import KVLogger
from livelyspeaker_tpu.utils.config import add_all_groups


def parse_args():
    import argparse

    p = argparse.ArgumentParser()
    add_all_groups(p, training=True)
    g = p.add_argument_group("autoencoder")
    g.add_argument("--base", type=int, default=32)
    args = p.parse_args()
    if args.ema_rate or args.ema_warmup:
        p.error("--ema_rate/--ema_warmup apply to the RAG trainer only; "
                "this loop keeps no EMA shadow")
    if args.pipeline_parallel:
        p.error("--pipeline_parallel applies to the RAG trainer only")
    return args


def main():
    args = parse_args()
    if args.dataset == "synthetic":
        import tempfile

        from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_ted_records(data_dir, n_clips=8, clip_seconds=20)
        args.data_dir = data_dir

    dataset = TedWindowDataset(args.data_dir)
    loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, max(len(dataset) // 2, 1)),
        shuffle=True,
        seed=args.seed,
    )

    pose_dim = args.njoints * args.nfeats
    model = GestureAutoencoder(
        pose_dim=pose_dim, n_frames=args.n_poses, base=args.base
    )
    x0 = jnp.zeros((2, args.n_poses, pose_dim))
    variables = model.init(jax.random.PRNGKey(args.seed), x0, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    logger = KVLogger(args.save_dir)
    os.makedirs(args.save_dir, exist_ok=True)
    save_args(args.save_dir, vars(args))

    @jax.jit
    def train_step(params, batch_stats, opt_state, poses):
        def loss_fn(p):
            (feat, recon), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                poses,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((recon - poses) ** 2), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates),
            new_stats,
            opt_state2,
            loss,
        )

    step = 0
    for epoch in range(args.epochs):
        for batch in loader:
            poses = jnp.asarray(batch["vec_seq"])
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, poses
            )
            if step % args.log_interval == 0:
                logger.logkv("recon_mse", float(loss))
                logger.logkv("step", step)
                logger.dumpkvs()
            step += 1
    save_params_npz(
        os.path.join(args.save_dir, f"gesture_ae{step:09d}.npz"),
        {"params": params, "batch_stats": batch_stats},
    )
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
