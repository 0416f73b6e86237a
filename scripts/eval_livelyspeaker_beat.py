#!/usr/bin/env python
"""Full LivelySpeaker composition eval on BEAT: SAG semantic sketch from the
window sentence -> skip=80 RAG rhythm refinement -> FID + SRGR + onset
alignment + diversity, swept over guidance {1, 1.5}
(reference: scripts_beat/test_LivelySpeaker_beat.py:77-177, skipsteps=80
at :232, guidance sweep :234-237).

FID needs the frozen BEAT autoencoder checkpoint
(--eval_model_path best_rec_200.bin, configs/beat.yaml:11); without it FID
prints n/a but sampling + SRGR + alignment still run.

Example (synthetic records, random-weight smoke):
    python scripts/eval_livelyspeaker_beat.py \
        --model_path save/beat/model000001000.npz --data_dir beat_records
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
from livelyspeaker_tpu.utils.config import generate_args
from eval_common import build_pipeline, mesh_from_args
from eval_rag_ted import load_rag_params


def load_beat_embedder(args):
    """Frozen HalfEmbeddingNet FID embedder (other_tools.py:76-79,
    --e_name HalfEmbeddingNet parser_util.py:310)."""
    if not (args.eval_model_path and os.path.exists(args.eval_model_path)):
        return None
    import torch

    ckpt = torch.load(args.eval_model_path, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("model_state") or ckpt.get("state_dict") or ckpt
    enc_params = pose_embedding_params_from_torch(sd)
    enc = BeatEmbeddingEncoder()
    return jax.jit(lambda p: enc.apply({"params": enc_params}, p))


def run_sweep(dataset, loader, pipe, embed, n_joints, n_frames,
              guidances=(1.0, 1.5)):
    """The infer_from_testloader protocol (test_LivelySpeaker_beat.py:77-177):
    returns [(guidance, fid, align, diversity, srgr), ...]."""
    aligner = Alignment(0.3, 2)  # BaseTrainer.__init__ :64
    results = []
    for guidance in guidances:
        rng = jax.random.PRNGKey(233)
        lat_out, lat_ori = [], []
        align_sum, total = 0.0, 0
        srgr = SRGR(threshold=4.0, joints=n_joints)  # :65
        for batch in loader:
            b = batch["motion"].shape[0]
            cond = {
                "audio": jnp.asarray(batch["audio"]),
                "vid": jnp.asarray(batch["vid"]),
                "emo": jnp.asarray(batch["emo"]),
                "origin_x": jnp.asarray(batch["motion"]),
            }
            sentences = batch.get("sentence") or (
                ["a person is gesturing"] * b
            )
            rng, srng = jax.random.split(rng)
            sample = pipe(sentences, cond, srng, guidance=guidance)
            gen_rot6d = np.asarray(sample).transpose(0, 3, 1, 2)  # [B,T,J,6]
            tar_rot6d = batch["motion"].transpose(0, 3, 1, 2)
            if embed is not None:
                lat_out.append(
                    np.asarray(embed(gen_rot6d.reshape(b, n_frames, -1)))
                )
                lat_ori.append(
                    np.asarray(embed(tar_rot6d.reshape(b, n_frames, -1)))
                )
            # rot6d -> euler degrees for SRGR + beat alignment (:145-165)
            gen_euler = rot6d_to_euler_deg(
                gen_rot6d.reshape(b, n_frames, n_joints, 6)
            ).reshape(b, n_frames, -1)
            tar_euler = rot6d_to_euler_deg(
                tar_rot6d.reshape(b, n_frames, n_joints, 6)
            ).reshape(b, n_frames, -1)
            srgr.run(gen_euler, tar_euler, batch["sem"])
            for i in range(b):
                align_sum += aligner.score(
                    batch["audio"][i], gen_euler[i], pose_fps=15
                )
            total += b
        if embed is not None and lat_out:
            fid = frechet_from_samples(
                np.concatenate(lat_out), np.concatenate(lat_ori)
            )
            div = diversity_score(lat_out)
        else:
            fid = div = float("nan")
        align = align_sum / max(total, 1)
        results.append((guidance, fid, align, div, srgr.avg()))
        print(
            f"skip={pipe.skip_timesteps} guidance={guidance}: FID={fid:.4f} "
            f"align={align:.4f} SRGR={srgr.avg():.4f} diversity={div:.4f}"
        )
    return results


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
    args.njoints = cfg.njoints
    args.nfeats = cfg.nfeats
    params = load_rag_params(args.model_path, args)

    pipe = build_pipeline(args, model, params, cfg.njoints, cfg.nfeats,
                          mesh=mesh_from_args(args, batch_size=batch_size))
    embed = load_beat_embedder(args)
    for item in run_sweep(dataset, loader, pipe, embed, cfg.njoints,
                          cfg.nframes):
        print(item)


if __name__ == "__main__":
    main()
