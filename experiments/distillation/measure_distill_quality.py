#!/usr/bin/env python
"""Quality/steps tradeoff table: teacher vs DPM-Solver++ vs distilled.

Self-contained measurement on the synthetic TED fixture (same protocol as
the FGD-parity run, BASELINE.md): train a small RAG, progressively distill
it, then score every sampler variant's generations against the real windows
with the frozen embedding-space evaluator. Prints one JSON line per row.

    python scripts/measure_distill_quality.py \
        --train_steps 400 --distill_steps 800 --rounds 2

The absolute FGD scale depends on the (fixed, seeded) embedder; the point of
the table is the RELATIVE cost of halving sampler steps with and without
distillation.
"""

import argparse
import json
import os
import sys
import tempfile
import time

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np

from measure_fgd_parity import make_embedder_ckpt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=400)
    p.add_argument("--distill_steps", type=int, default=800)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--start_grid", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--latent_dim", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--guidance", type=float, default=1.0)
    p.add_argument("--modes", type=int, default=0,
                   help="K>0: conditionally-multimodal fixture (K sinusoid "
                        "archetypes the conditioning cannot identify) — the "
                        "regime where few-step DDIM should degrade")
    p.add_argument("--n_pre_seq", type=int, default=4,
                   help="0 disables seed-frame conditioning entirely "
                        "(RAGConfig(n_pre_seq=0) zeroes both the seed "
                        "frames and the indicator bit): with --modes K the "
                        "posterior is then genuinely K-modal — the round-3 "
                        "analysis (DESIGN §9) showed 4 seed frames collapse "
                        "it, hiding any step-count sensitivity")
    p.add_argument("--mode_blind", action="store_true",
                   help="close the remaining mode side channels in the "
                        "--modes fixture: pool audio orthogonally to the "
                        "mode and decorrelate the speaker id (which equals "
                        "c %% modes when n_speakers == modes — a total "
                        "leak); see synthetic_clips(mode_blind=True)")
    p.add_argument("--n_clips", type=int, default=0,
                   help="override the fixture clip count (default 4*modes)")
    args = p.parse_args()

    import optax

    from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
    from livelyspeaker_tpu.data.loader import DeviceDataLoader
    from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records
    from livelyspeaker_tpu.diffusion import DiffusionSchedule

    from experiments.distillation.distill import make_distill_step
    from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.pipeline import RAGSampler
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    if args.modes:
        blind = "b" if args.mode_blind else ""
        n_clips = args.n_clips or 4 * args.modes
        data_dir = os.path.join(
            tempfile.gettempdir(),
            f"ls_tpu_synth_m{args.modes}{blind}_n{n_clips}",
        )
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_ted_records(
                data_dir, n_clips=n_clips, clip_seconds=20,
                modes=args.modes, mode_blind=args.mode_blind,
            )
    else:
        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_ted_records(data_dir, n_clips=8, clip_seconds=20)
    dataset = TedWindowDataset(data_dir)
    # Device-resident batching: the synthetic fixtures fit HBM trivially and
    # the streaming loader is transfer-bound on remote-dispatch hosts
    # (~0.3 s/step vs ~0.02 — see DeviceDataLoader).
    loader = DeviceDataLoader(
        dataset,
        batch_size=min(args.batch_size, len(dataset)),
        shuffle=True,
        seed=233,
        fields=("motion", "audio", "vid"),
    )

    cfg = RAGConfig(latent_dim=args.latent_dim, num_layers=args.layers,
                    n_pre_seq=args.n_pre_seq)
    model = RAG(cfg)
    first = dataset.batch([0], fields=("motion", "audio", "vid"))
    params = model.init(
        {"params": jax.random.PRNGKey(10), "style": jax.random.PRNGKey(11),
         "cond_mask": jax.random.PRNGKey(12)},
        jnp.asarray(first["motion"]),
        jnp.zeros((1,), jnp.int32),
        {"audio": jnp.asarray(first["audio"]),
         "vid": jnp.asarray(first["vid"]),
         "origin_x": jnp.asarray(first["motion"])},
        train=True,
    )["params"]

    # ---- train the teacher -------------------------------------------------
    sched_train = DiffusionSchedule.create(steps=1000, schedule="cosine")
    tcfg = TrainConfig(lr=args.lr)
    tx = make_optimizer(tcfg)
    state = init_train_state(params, tx, cfg=tcfg, num_timesteps=1000)
    step = jax.jit(make_train_step(model, sched_train, tx, tcfg),
                   donate_argnums=0)
    key = jax.random.PRNGKey(0)
    done, t0 = 0, time.time()
    while done < args.train_steps:
        for batch in loader:
            if done >= args.train_steps:
                break
            state, m = step(state, batch, jax.random.fold_in(key, done))
            done += 1
    jax.block_until_ready(m["loss"])
    teacher = state.params
    print(f"teacher trained: {done} steps, loss={float(m['loss']):.4f} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    # ---- distill -----------------------------------------------------------
    students = {}
    t_params, grid = teacher, args.start_grid
    for rnd in range(args.rounds):
        sched = DiffusionSchedule.create(
            steps=1000, schedule="cosine", timestep_respacing=str(grid)
        )
        dtx = optax.adamw(1e-4)
        student = jax.tree.map(jnp.array, t_params)
        opt_state = dtx.init(student)
        dstep = jax.jit(make_distill_step(model, sched, dtx, t_params))
        done = 0
        while done < args.distill_steps:
            for batch in loader:
                if done >= args.distill_steps:
                    break
                opt_state, student, dm = dstep(
                    opt_state, student, batch,
                    jax.random.fold_in(key, 10_000 + rnd * 100_000 + done),
                )
                done += 1
        jax.block_until_ready(dm["loss"])
        grid //= 2
        print(f"distill round {rnd}: grid->{grid} "
              f"loss={float(dm['loss']):.5f}", file=sys.stderr)
        students[grid] = student
        t_params = student

    # ---- score every variant ----------------------------------------------
    embedder = make_embedder_ckpt("/tmp/fgd_embedder.bin")
    evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(embedder)

    eval_loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, len(dataset)),
        shuffle=False,
        drop_last=True,
        seed=233,
    )

    def score(params_v, respacing, method):
        sampler = RAGSampler(
            model, params_v, steps=1000, timestep_respacing=respacing,
            method=method,
        )
        evaluator.reset()
        rng = jax.random.PRNGKey(233)
        denoiser_passes = 0
        for batch in eval_loader:
            b = batch["motion"].shape[0]
            cond = {
                "audio": jnp.asarray(batch["audio"]),
                "vid": jnp.asarray(batch["vid"]),
                "origin_x": jnp.asarray(batch["motion"]),
            }
            rng, srng = jax.random.split(rng)
            sample = sampler(cond, srng, guidance=args.guidance)
            gen = (
                np.asarray(sample).transpose(0, 3, 1, 2).reshape(b, 34, -1)
            )
            evaluator.push_samples(gen, batch["vec_seq"])
        fgd, fd = evaluator.get_scores()
        return float(fgd), float(fd)

    rows = [
        ("teacher", teacher, f"ddim{args.start_grid}", "ddim"),
        ("teacher", teacher, "ddim20", "dpmpp"),
    ]
    # teacher and its distilled student head-to-head at every halved grid
    for grid_k, student in students.items():
        rows.append(("teacher", teacher, f"ddim{grid_k}", "ddim"))
        rows.append((f"distilled_x{args.start_grid // grid_k}", student,
                     f"ddim{grid_k}", "ddim"))

    for name, pv, respacing, method in rows:
        fgd, fd = score(pv, respacing, method)
        print(json.dumps({
            "model": name,
            "sampler": method,
            "respacing": respacing,
            "fgd": round(fgd, 6),
            "feat_dist": round(fd, 6),
        }))


if __name__ == "__main__":
    main()
