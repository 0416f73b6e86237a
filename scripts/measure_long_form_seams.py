#!/usr/bin/env python
"""Measure long-form window-seam quality (eval.metrics.long_form_seam_report).

The long-form path (pipeline.generate_long_form) stitches windows via the
seed-frame mechanism (reference RAG.py:184-192); stream==batch exactness is
already regression-tested, but this script measures the one user-visible
quality property: is the frame-to-frame velocity at a window seam
indistinguishable from ordinary motion (ratio ~1), or does the stitch jerk?

Protocol: load a trained RAG (--model_path from a train_rag.py save_dir),
build long audio by concatenating dataset clips' audio (in-distribution
conditioning), generate the long-form stream on device, and report seam vs
within-window velocity percentiles.  A random-weight model is also scored
as the null baseline (no seed-frame discipline -> ratio reflects chance).

    python scripts/measure_long_form_seams.py \
        --model_path /tmp/seam_flagship/model_final.npz --seconds 60
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import argparse

import jax
import numpy as np

from livelyspeaker_tpu.data import TedWindowDataset
from livelyspeaker_tpu.eval.metrics import long_form_seam_report
from livelyspeaker_tpu.models import RAG, RAGConfig
from livelyspeaker_tpu.pipeline import RAGSampler, generate_long_form
from livelyspeaker_tpu.utils.config import add_all_groups, apply_saved_args


def parse_args():
    p = argparse.ArgumentParser()
    add_all_groups(p, training=False)
    g = p.add_argument_group("seams")
    g.add_argument("--seconds", type=float, default=60.0,
                   help="length of stitched audio to generate over")
    g.add_argument("--respacing", type=str, default="ddim100")
    g.add_argument("--guidance", type=float, default=1.5)
    g.add_argument("--speaker", type=int, default=1)
    g.add_argument("--emotion", type=int, default=0,
                   help="emotion id for BEAT models (--num_emotions > 0)")
    g.add_argument("--with_random_baseline",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="also score a random-init model for context "
                        "(--no-with_random_baseline to skip the extra "
                        "generation)")
    g.add_argument("--max_ratio", type=float, default=0.0,
                   help="fail if trained seam ratio_p95 exceeds this "
                        "(0 = report only)")
    return apply_saved_args(p.parse_args(), p)


def build_audio(args) -> np.ndarray:
    if args.dataset == "synthetic":
        import tempfile

        from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_ted_records(data_dir, n_clips=8, clip_seconds=20)
        args.data_dir = data_dir
    if args.dataset == "beat":
        from livelyspeaker_tpu.data.beat import BeatWindowDataset

        ds = BeatWindowDataset(args.data_dir)
    else:
        ds = TedWindowDataset(args.data_dir)
    want = int(args.seconds * 16000)
    pieces, i = [], 0
    total = 0
    while total < want:
        audio = np.asarray(ds[i % len(ds)]["audio"], np.float32)
        pieces.append(audio)
        total += len(audio)
        i += 1
    return np.concatenate(pieces)[:want]


def score(model, params, args, audio) -> dict:
    sampler = RAGSampler(
        model, params, steps=args.diffusion_steps,
        timestep_respacing=args.respacing, method="ddim",
        use_fused=args.fused,
        guidance_schedule=args.guidance_schedule,
    )
    out = generate_long_form(
        sampler, audio, speaker=args.speaker, rng=jax.random.PRNGKey(233),
        guidance=args.guidance, emotion=args.emotion,
    )
    rep = long_form_seam_report(
        out, model.cfg.nframes, model.cfg.n_pre_seq
    )
    rep["frames"] = int(out.shape[-1])
    return rep


def main():
    args = parse_args()
    audio = build_audio(args)

    cfg = RAGConfig(
        njoints=args.njoints, nfeats=args.nfeats, nframes=args.n_poses,
        latent_dim=args.latent_dim, num_layers=args.layers,
        mlpact=args.mlpact, n_speakers=args.n_speakers,
        num_emotions=args.num_emotions, cond_mask_prob=args.cond_mask_prob,
    )
    model = RAG(cfg)

    from eval_rag_ted import load_rag_params

    params = load_rag_params(args.model_path, args)
    trained = score(model, params, args, audio)
    print(f"trained: {json.dumps(trained, sort_keys=True)}")

    if args.with_random_baseline:
        import jax.numpy as jnp

        from livelyspeaker_tpu.models import audio_samples_for_frames

        nf = cfg.nframes
        init_cond = {
            "audio": jnp.zeros((1, audio_samples_for_frames(nf))),
            "vid": jnp.zeros((1,), jnp.int32),
            "origin_x": jnp.zeros((1, cfg.njoints, cfg.nfeats, nf)),
        }
        if cfg.num_emotions:
            init_cond["emo"] = jnp.zeros((1,), jnp.int32)
        rand = model.init(
            {"params": jax.random.PRNGKey(5), "style": jax.random.PRNGKey(6)},
            jnp.zeros((1, cfg.njoints, cfg.nfeats, nf)),
            jnp.zeros((1,), jnp.int32),
            init_cond,
        )["params"]
        print(
            f"random-baseline: "
            f"{json.dumps(score(model, rand, args, audio), sort_keys=True)}"
        )

    if args.max_ratio:
        p95 = trained["ratio_p95"]
        if trained["n_seams"] < 1 or not np.isfinite(p95):
            raise SystemExit(
                f"--max_ratio gate needs at least one seam to measure "
                f"(n_seams={trained['n_seams']}, ratio_p95={p95}); "
                f"increase --seconds"
            )
        if p95 > args.max_ratio:
            raise SystemExit(
                f"seam ratio_p95 {p95:.3f} > bound {args.max_ratio}"
            )


if __name__ == "__main__":
    main()
