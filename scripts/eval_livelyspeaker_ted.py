#!/usr/bin/env python
"""Full LivelySpeaker composition eval on TED: SAG semantic sketch ->
skip-timestep RAG refinement -> FGD / beat-align / diversity
(reference: scripts/test_LivelySpeaker_ted.py).

Requires --sag_path (SAG weights: our .npz or the released SAG.pth) and
optionally --clip_path (OpenAI CLIP ViT-B/32 weights; random frozen tower
otherwise) and --bpe_path (CLIP BPE merges; hash tokenizer otherwise).
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
from livelyspeaker_tpu.utils.config import generate_args
from eval_common import (  # noqa: F401 (re-export)
    build_pipeline,
    load_sag_params,
    mesh_from_args,
)
from eval_rag_ted import load_rag_params


def main():
    args = generate_args()
    random.seed(233)
    np.random.seed(233)

    dataset = TedWindowDataset(args.data_dir)
    batch_size = min(args.batch_size, max(len(dataset), 1))
    loader = DataLoader(dataset, batch_size=batch_size,
                        shuffle=True, drop_last=True, seed=233)

    cfg = RAGConfig(
        njoints=args.njoints, nfeats=args.nfeats, nframes=args.n_poses,
        latent_dim=args.latent_dim, num_layers=args.layers, mlpact=args.mlpact,
        n_speakers=args.n_speakers, num_emotions=args.num_emotions,
        cond_mask_prob=args.cond_mask_prob,
    )
    rag = RAG(cfg)
    rag_params = load_rag_params(args.model_path, args)
    pipe = build_pipeline(args, rag, rag_params, args.njoints, args.nfeats,
                          mesh=mesh_from_args(args, batch_size=batch_size))

    evaluator = None
    if args.eval_model_path and os.path.exists(args.eval_model_path):
        evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(args.eval_model_path)

    speaker_ids = (list(dataset.speaker_model.word2index.values())
                   if dataset.speaker_model else [0])

    for guidance in (1.0, 1.5):
        if evaluator:
            evaluator.reset()
        rng = jax.random.PRNGKey(233)
        score_sum = n_beats = motion_beats = 0
        for batch in loader:
            b = batch["motion"].shape[0]
            vid = np.array([random.choice(speaker_ids) for _ in range(b)], np.int32)
            cond = {
                "audio": jnp.asarray(batch["audio"]),
                "vid": jnp.asarray(vid),
                "origin_x": jnp.asarray(batch["motion"]),
            }
            rng, srng = jax.random.split(rng)
            sample = pipe(batch["sentence"], cond, srng, guidance=guidance)
            gen = np.asarray(sample).transpose(0, 3, 1, 2).reshape(b, args.n_poses, -1)
            if evaluator:
                evaluator.push_samples(gen, batch["vec_seq"])
            s, nb, mb = ted_beat_align_batch(gen, batch["audio"])
            score_sum += s; n_beats += nb; motion_beats += mb
        beat_score = score_sum / max(n_beats, 1)
        if evaluator:
            fgd, feat_dist = evaluator.get_scores()
            div = evaluator.get_diversity_scores()
        else:
            fgd = feat_dist = div = float("nan")
        print(f"skip={pipe.skip_timesteps} guidance={guidance}: FGD={fgd:.4f} "
              f"beat_align={beat_score:.4f} diversity={div:.4f}")


if __name__ == "__main__":
    main()
