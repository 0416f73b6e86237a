#!/usr/bin/env python
"""RAG-only TED evaluation: FGD + beat-align + diversity over a guidance
sweep (reference: scripts/test_RAG_ted.py).

Checkpoint sources:
  --model_path foo.npz       our portable params export
  --model_path RAG.pt        the reference's released torch checkpoint
                             (converted on the fly)

FGD needs the frozen TriModal evaluator checkpoint
(--eval_model_path gesture_autoencoder_checkpoint_best.bin, the same fixture
the reference downloads, README.md:72).  Without it the script still reports
beat-align and runs the full sampling path, printing FGD as n/a.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np

from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator, ted_beat_align_batch
from livelyspeaker_tpu.models import RAG, RAGConfig
from livelyspeaker_tpu.pipeline import RAGSampler
from livelyspeaker_tpu.training.checkpoints import load_params_npz
from eval_common import mesh_from_args
from livelyspeaker_tpu.utils.config import generate_args


def load_rag_params(path: str, args):
    if path.endswith(".npz"):
        return load_params_npz(path)
    if path.endswith((".pt", ".pth", ".bin")):
        import torch

        from livelyspeaker_tpu.utils.torch_convert import (
            rag_params_from_torch_state_dict,
        )

        sd = torch.load(path, map_location="cpu", weights_only=False)
        return rag_params_from_torch_state_dict(
            sd, num_layers=args.layers, num_emotions=args.num_emotions
        )
    raise ValueError(f"unknown checkpoint format: {path}")


def main():
    args = generate_args()
    random.seed(233)
    np.random.seed(233)

    dataset = TedWindowDataset(args.data_dir)
    batch_size = min(args.batch_size, max(len(dataset), 1))
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=True,
        drop_last=True,
        seed=233,
    )

    cfg = RAGConfig(
        njoints=args.njoints,
        nfeats=args.nfeats,
        nframes=args.n_poses,
        latent_dim=args.latent_dim,
        num_layers=args.layers,
        mlpact=args.mlpact,
        n_pre_seq=getattr(args, "n_pre_poses", 4),
        n_speakers=args.n_speakers,
        num_emotions=args.num_emotions,
        cond_mask_prob=args.cond_mask_prob,
    )
    model = RAG(cfg)
    params = load_rag_params(args.model_path, args)
    sampler = RAGSampler(
        model,
        params,
        steps=args.diffusion_steps,
        schedule=args.noise_schedule,
        timestep_respacing=args.timestep_respacing or None,
        method=args.sampler or (
            "ddim" if args.timestep_respacing.startswith("ddim") else "ddpm"
        ),
        use_fused=args.fused,
        mesh=mesh_from_args(args, batch_size=batch_size),
        guidance_schedule=args.guidance_schedule,
    )

    evaluator = None
    if args.eval_model_path and os.path.exists(args.eval_model_path):
        evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(
            args.eval_model_path
        )

    speaker_ids = (
        list(dataset.speaker_model.word2index.values())
        if dataset.speaker_model
        else [0]
    )

    results = []
    for guidance in (1.0, 1.5, 2.0):
        if evaluator:
            evaluator.reset()
        rng = jax.random.PRNGKey(233)
        score_sum = n_beats = motion_beats = 0
        for i, batch in enumerate(loader):
            b = batch["motion"].shape[0]
            vid = np.array(
                [random.choice(speaker_ids) for _ in range(b)], np.int32
            )  # random speakers at eval (test_RAG_ted.py:56)
            cond = {
                "audio": jnp.asarray(batch["audio"]),
                "vid": jnp.asarray(vid),
                "origin_x": jnp.asarray(batch["motion"]),
            }
            rng, srng = jax.random.split(rng)
            sample = sampler(cond, srng, guidance=guidance)
            gen = np.asarray(sample).transpose(0, 3, 1, 2).reshape(b, args.n_poses, -1)
            real = batch["vec_seq"]
            if evaluator:
                evaluator.push_samples(gen, real)
            s, nb, mb = ted_beat_align_batch(gen, batch["audio"])
            score_sum += s
            n_beats += nb
            motion_beats += mb
        beat_score = score_sum / max(n_beats, 1)
        if evaluator:
            fgd, feat_dist = evaluator.get_scores()
            div = evaluator.get_diversity_scores()
        else:
            fgd = feat_dist = div = float("nan")
        print(
            f"guidance={guidance}: FGD={fgd:.4f} beat_align={beat_score:.4f} "
            f"diversity={div:.4f} feat_dist={feat_dist:.4f} "
            f"motion_beats={motion_beats}"
        )
        results.append((guidance, fgd, beat_score, div))
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
