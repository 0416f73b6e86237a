#!/usr/bin/env python
"""RAG-only BEAT evaluation: FID + onset alignment (+ SRGR for the full
pipeline) over a guidance sweep (reference: scripts_beat/test_RAG_beat.py).

FID needs the frozen BEAT autoencoder checkpoint
(--eval_model_path best_rec_200.bin, configs/beat.yaml:11); without it FID
prints n/a but sampling + alignment still run.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np

from livelyspeaker_tpu.data import DataLoader
from livelyspeaker_tpu.data.beat import BeatWindowDataset, rot6d_to_euler_deg
from livelyspeaker_tpu.eval import SRGR, Alignment
from livelyspeaker_tpu.eval.fgd import diversity_score, frechet_from_samples
from livelyspeaker_tpu.models import RAG, RAGConfig
from livelyspeaker_tpu.models.embedding_net import (
    BeatEmbeddingEncoder,
    pose_embedding_params_from_torch,
)
from livelyspeaker_tpu.pipeline import RAGSampler
from livelyspeaker_tpu.utils.config import generate_args
from eval_common import mesh_from_args
from eval_rag_ted import load_rag_params


def main():
    args = generate_args()
    np.random.seed(233)

    dataset = BeatWindowDataset(args.data_dir)
    batch_size = min(args.batch_size, max(len(dataset), 1))
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=True,
        drop_last=True,
        seed=233,
    )

    cfg = RAGConfig.beat(
        njoints=dataset.cfg.njoints,
        latent_dim=args.latent_dim,
        num_layers=args.layers,
        mlpact=args.mlpact,
        n_speakers=max(args.n_speakers, 30),
        cond_mask_prob=args.cond_mask_prob,
    )
    model = RAG(cfg)
    args.num_emotions = 8
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

    embed = None
    if args.eval_model_path and os.path.exists(args.eval_model_path):
        import torch

        ckpt = torch.load(args.eval_model_path, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state") or ckpt.get("state_dict") or ckpt
        enc_params = pose_embedding_params_from_torch(sd)
        enc = BeatEmbeddingEncoder()
        embed = jax.jit(lambda p: enc.apply({"params": enc_params}, p))

    # Optional SAG composition (test_LivelySpeaker_beat.py:119-130:
    # SAG sketch from CLIP text -> skip_timesteps refinement); the dedicated
    # full-composition sweep lives in eval_livelyspeaker_beat.py.
    pipe = None
    if args.sag_path:
        from eval_common import build_pipeline

        pipe = build_pipeline(args, model, params, cfg.njoints, cfg.nfeats)

    aligner = Alignment(0.3, 2)  # test_RAG_beat.py:43
    n_joints = dataset.cfg.njoints

    for guidance in (1.0, 1.5):
        rng = jax.random.PRNGKey(233)
        lat_out, lat_ori = [], []
        align_sum, total = 0.0, 0
        srgr = SRGR(threshold=4.0, joints=n_joints)  # test_RAG_beat.py:44
        for batch in loader:
            b = batch["motion"].shape[0]
            cond = {
                "audio": jnp.asarray(batch["audio"]),
                "vid": jnp.asarray(batch["vid"]),
                "emo": jnp.asarray(batch["emo"]),
                "origin_x": jnp.asarray(batch["motion"]),
            }
            rng, srng = jax.random.split(rng)
            if pipe is not None:
                sentences = batch.get(
                    "sentence", ["a person is gesturing"] * b
                )
                sample = pipe(sentences, cond, srng, guidance=guidance)
            else:
                sample = sampler(cond, srng, guidance=guidance)
            gen_rot6d = np.asarray(sample).transpose(0, 3, 1, 2)  # [B,T,J,6]
            tar_rot6d = batch["motion"].transpose(0, 3, 1, 2)
            if embed is not None:
                lat_out.append(
                    np.asarray(embed(gen_rot6d.reshape(b, 34, -1)))
                )
                lat_ori.append(
                    np.asarray(embed(tar_rot6d.reshape(b, 34, -1)))
                )
            gen_euler = rot6d_to_euler_deg(
                gen_rot6d.reshape(b, 34, n_joints, 6)
            ).reshape(b, 34, -1)
            tar_euler = rot6d_to_euler_deg(
                tar_rot6d.reshape(b, 34, n_joints, 6)
            ).reshape(b, 34, -1)
            srgr.run(gen_euler, tar_euler, batch["sem"])
            for i in range(b):
                align_sum += aligner.score(
                    batch["audio"][i], gen_euler[i], pose_fps=15
                )
            total += b
        if embed is not None:
            fid = frechet_from_samples(
                np.concatenate(lat_out), np.concatenate(lat_ori)
            )
            div = diversity_score(lat_out)
        else:
            fid = div = float("nan")
        print(
            f"guidance={guidance}: FID={fid:.4f} align={align_sum / total:.4f} "
            f"SRGR={srgr.avg():.4f} diversity={div:.4f}"
        )


if __name__ == "__main__":
    main()
