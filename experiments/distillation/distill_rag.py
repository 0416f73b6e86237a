#!/usr/bin/env python
"""Progressively distill a trained RAG denoiser to fewer sampling steps.

Each round trains a student (initialised from the teacher) so that ONE of
its DDIM steps matches TWO teacher steps, then halves the sampling grid and
makes the student the next teacher (Salimans & Ho 2022). Starting from the
eval grid (ddim100) two rounds give a 25-step sampler; combine with
``--sampler dpmpp`` at inference for further gains.

    python experiments/distillation/distill_rag.py \
        --model_path save/RAG/model*.npz \
        --data_dir datasets/ted_records --save_dir save/RAG_distilled \
        --start_grid 100 --rounds 2 --steps_per_round 2000

No reference counterpart (the reference only respaces); see
experiments/distillation/distill.py for the math (oracle-identity-tested in
tests/test_distill.py) and experiments/distillation/README.md for the four
measured negatives that demoted this machinery from the package proper.
"""

import argparse
import os
import sys

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, _ROOT)

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--dataset", choices=["ted", "beat"], default="ted")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="cosine")
    p.add_argument("--start_grid", type=int, default=100,
                   help="sampling grid of the teacher (e.g. 100 = the "
                        "reference's ddim100 eval grid)")
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--steps_per_round", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--seed", type=int, default=10)
    args = p.parse_args()

    import jax.numpy as jnp

    from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
    from livelyspeaker_tpu.diffusion import DiffusionSchedule

    from experiments.distillation.distill import make_distill_step
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.training.checkpoints import (
        load_args,
        load_params_npz,
        save_args,
        save_params_npz,
    )

    try:
        saved = load_args(args.model_path)
    except FileNotFoundError:
        saved = {}
    cfg = RAGConfig(
        njoints=saved.get("njoints", 9),
        nfeats=saved.get("nfeats", 3),
        nframes=saved.get("n_poses", 34),
        latent_dim=saved.get("latent_dim", 512),
        num_layers=saved.get("layers", 8),
        mlpact=saved.get("mlpact", "silu"),
        n_speakers=saved.get("n_speakers", 1400),
        num_emotions=saved.get("num_emotions", 0),
    )
    model = RAG(cfg)
    teacher = load_params_npz(args.model_path)

    if args.dataset == "beat":
        from livelyspeaker_tpu.data.beat import BeatWindowDataset

        dataset = BeatWindowDataset(args.data_dir)
        fields = ("motion", "audio", "vid", "emo")
    else:
        dataset = TedWindowDataset(args.data_dir)
        fields = ("motion", "audio", "vid")
    loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, max(len(dataset), 1)),
        shuffle=True,
        seed=args.seed,
        fields=fields,
    )

    os.makedirs(args.save_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    grid = args.start_grid
    for rnd in range(args.rounds):
        sched = DiffusionSchedule.create(
            steps=args.diffusion_steps,
            schedule=args.noise_schedule,
            timestep_respacing=str(grid),
        )
        tx = optax.adamw(args.lr)
        student = jax.tree.map(jnp.array, teacher)
        opt_state = tx.init(student)
        step = jax.jit(make_distill_step(model, sched, tx, teacher))

        done = 0
        while done < args.steps_per_round:
            for batch in loader:
                if done >= args.steps_per_round:
                    break
                key, sub = jax.random.split(key)
                dev = {k: jnp.asarray(v) for k, v in batch.items()
                       if k in fields}
                opt_state, student, m = step(opt_state, student, dev, sub)
                done += 1
                if done % args.log_interval == 0:
                    print(f"round {rnd} grid {grid} step {done}: "
                          f"loss={float(m['loss']):.5f} "
                          f"grad={float(m['grad_norm']):.3f}")
        grid //= 2
        teacher = student
        out = os.path.join(
            args.save_dir, f"model_distilled_x{args.start_grid // grid}.npz"
        )
        save_params_npz(out, jax.device_get(student))
        print(f"round {rnd} done -> {out} (sample with "
              f"--timestep_respacing ddim{grid})")
    save_args(args.save_dir, {**saved, "timestep_respacing": f"ddim{grid}"})


if __name__ == "__main__":
    main()
