#!/usr/bin/env python
"""Measure the FGD-parity north star (BASELINE.md).

Protocol: generate clips for every window of a TED record set with a trained
RAG checkpoint through OUR sampler, then score the SAME (generated, real)
pairs with

  (a) our ``EmbeddingSpaceEvaluator`` (eval/fgd.py), and
  (b) the reference's torch ``EmbeddingSpaceEvaluator``
      (``/root/reference/scripts/model/ted_evaluator.py:13-151``),

both loaded from the SAME embedder checkpoint.  With the e2e
generation-parity test (same clips from both frameworks) this closes the
loop: same clips AND same scores => FGD parity.  Prints one JSON line.

Example:
    python scripts/measure_fgd_parity.py \
        --model_path /tmp/rag_parity/model000000360.npz --dataset synthetic
"""

import json
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np

from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator
from livelyspeaker_tpu.models import RAG, RAGConfig
from livelyspeaker_tpu.pipeline import RAGSampler
from livelyspeaker_tpu.utils.config import generate_args
from eval_rag_ted import load_rag_params

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")


def make_embedder_ckpt(path: str, pose_dim: int = 27, seed: int = 11) -> str:
    """Seeded random torch EmbeddingNet checkpoint in the reference's
    gesture_autoencoder format ({'gen_dict', 'pose_dim'}).  Parity holds for
    any fixed embedder weights; a trained fixture only changes the absolute
    FGD scale, not the cross-framework delta."""
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    from model.embedding_net import EmbeddingNet

    torch.manual_seed(seed)
    net = EmbeddingNet(pose_dim=pose_dim, n_frames=34)
    torch.save({"gen_dict": net.state_dict(), "pose_dim": pose_dim}, path)
    return path


def reference_evaluator(ckpt_path: str):
    """The reference's evaluator on CPU (umap is viz-only and absent)."""
    import importlib

    import torch

    sys.modules.setdefault("umap", types.ModuleType("umap"))
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    tev = importlib.import_module("model.ted_evaluator")
    tev.device = torch.device("cpu")
    return tev.EmbeddingSpaceEvaluator(ckpt_path)


def main():
    args = generate_args()
    np.random.seed(233)

    if args.dataset == "synthetic":
        import tempfile

        from livelyspeaker_tpu.data.synthetic import (
            build_synthetic_ted_records,
        )

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_ted_records(data_dir, n_clips=8, clip_seconds=20)
        args.data_dir = data_dir

    dataset = TedWindowDataset(args.data_dir)
    loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, max(len(dataset), 1)),
        shuffle=False,
        drop_last=True,
        seed=233,
    )

    cfg = RAGConfig(
        njoints=args.njoints, nfeats=args.nfeats, nframes=args.n_poses,
        latent_dim=args.latent_dim, num_layers=args.layers,
        mlpact=args.mlpact, n_speakers=args.n_speakers,
        cond_mask_prob=args.cond_mask_prob,
    )
    model = RAG(cfg)
    params = load_rag_params(args.model_path, args)
    sampler = RAGSampler(
        model, params,
        steps=args.diffusion_steps,
        schedule=args.noise_schedule,
        timestep_respacing=args.timestep_respacing or "ddim100",
        method=args.sampler or "ddim",
        use_fused=args.fused,
    )

    if args.eval_model_path and os.path.exists(args.eval_model_path):
        ckpt_path = args.eval_model_path
    else:
        ckpt_path = make_embedder_ckpt("/tmp/fgd_embedder.bin")

    ours = EmbeddingSpaceEvaluator.from_torch_checkpoint(ckpt_path)
    theirs = reference_evaluator(ckpt_path)

    import torch

    rng = jax.random.PRNGKey(233)
    n_clips = 0
    for batch in loader:
        b = batch["motion"].shape[0]
        cond = {
            "audio": jnp.asarray(batch["audio"]),
            "vid": jnp.asarray(batch["vid"]),
            "origin_x": jnp.asarray(batch["motion"]),
        }
        rng, srng = jax.random.split(rng)
        sample = sampler(cond, srng, guidance=args.guidance_param)
        gen = (
            np.asarray(sample)
            .transpose(0, 3, 1, 2)
            .reshape(b, args.n_poses, -1)
        )
        real = batch["vec_seq"]
        ours.push_samples(gen, real)
        with torch.no_grad():
            theirs.push_samples(
                torch.from_numpy(gen), torch.from_numpy(np.asarray(real))
            )
        n_clips += b

    our_fgd, our_fd = ours.get_scores()
    ref_fgd, ref_fd = theirs.get_scores()
    rel = abs(our_fgd - ref_fgd) / max(abs(ref_fgd), 1e-12)
    print(json.dumps({
        "n_clips": n_clips,
        "guidance": args.guidance_param,
        "our_fgd": float(our_fgd),
        "ref_fgd": float(ref_fgd),
        "fgd_rel_delta": float(rel),
        "our_feat_dist": float(our_fd),
        "ref_feat_dist": float(ref_fd),
        "within_1pct": bool(rel < 0.01),
    }))


if __name__ == "__main__":
    main()
