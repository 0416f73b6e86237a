#!/usr/bin/env python
"""Measure BEAT-side FID parity (BASELINE.md).

BEAT twin of ``measure_fgd_parity.py``: generate clips for every window of a
BEAT record set with a trained RAG checkpoint through OUR sampler, then score
the SAME (generated, real) rot6d pairs with

  (a) our stack — ``BeatEmbeddingEncoder`` (converted weights) +
      ``frechet_from_samples`` (eval/fgd.py), and
  (b) the reference's — torch ``HalfEmbeddingNet``
      (``/root/reference/scripts_beat/model/motion_autoencoder.py:156-167``) +
      ``FIDCalculator.frechet_distance``
      (``/root/reference/scripts_beat/dataloaders/data_tools.py:229-292``,
      used at ``test_RAG_beat.py:118-122``),

both from the SAME embedder checkpoint.  Prints one JSON line.

Example:
    python scripts/measure_fid_parity_beat.py \
        --model_path /tmp/rag_beat_parity/model000000360.npz --dataset synthetic
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

from livelyspeaker_tpu.data import DataLoader
from livelyspeaker_tpu.data.beat import BeatWindowDataset
from livelyspeaker_tpu.eval.fgd import frechet_from_samples
from livelyspeaker_tpu.models import RAG, RAGConfig
from livelyspeaker_tpu.models.embedding_net import (
    BeatEmbeddingEncoder,
    pose_embedding_params_from_torch,
)
from livelyspeaker_tpu.pipeline import RAGSampler
from livelyspeaker_tpu.utils.config import generate_args
from eval_rag_ted import load_rag_params

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")


def make_embedder_ckpt(path: str, seed: int = 11) -> str:
    """Seeded random torch HalfEmbeddingNet checkpoint in the reference's
    ``best_rec_*.bin`` format ({'model_state': ...}).  Parity holds for any
    fixed embedder weights; a trained fixture only changes the absolute FID
    scale, not the cross-framework delta."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_motion_autoencoder",
        f"{REFERENCE_ROOT}/scripts_beat/model/motion_autoencoder.py",
    )
    mae = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mae)
    torch.manual_seed(seed)
    net = mae.HalfEmbeddingNet(
        types.SimpleNamespace(pose_length=34, pose_dims=282, vae_length=300)
    )
    with torch.no_grad():  # non-trivial running stats so BN conversion counts
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    torch.save({"model_state": net.state_dict()}, path)
    return path


def reference_fid_calculator():
    """The reference's FIDCalculator; its module imports lmdb/pyarrow/
    fasttext/loguru (absent here) only for dataset tooling — stub them.
    pandas must import first so its optional-pyarrow probe sees a real
    ImportError instead of the stub."""
    import importlib

    import pandas  # noqa: F401

    for name in ("lmdb", "pyarrow", "fasttext"):
        sys.modules.setdefault(name, types.ModuleType(name))
    log = types.ModuleType("loguru")
    log.logger = types.SimpleNamespace(
        info=lambda *a, **k: None, warning=lambda *a, **k: None
    )
    sys.modules.setdefault("loguru", log)
    # pymo.viz_tools imports IPython -> cProfile -> stdlib `profile`, which
    # our scripts/profile.py would shadow: drop this scripts dir from
    # sys.path for the duration of the reference import.
    here = os.path.dirname(os.path.abspath(__file__))
    saved = list(sys.path)
    sys.path = [p for p in sys.path if os.path.abspath(p or ".") != here]
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts_beat")
    try:
        return importlib.import_module("dataloaders.data_tools").FIDCalculator
    finally:
        sys.path = saved


def main():
    args = generate_args()
    np.random.seed(233)

    if args.dataset == "synthetic":
        import tempfile

        from livelyspeaker_tpu.data.synthetic import (
            build_synthetic_beat_records,
        )

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth_beat")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_beat_records(data_dir, n_clips=8, clip_seconds=20)
        args.data_dir = data_dir

    dataset = BeatWindowDataset(args.data_dir)
    loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, max(len(dataset), 1)),
        shuffle=False,
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
        ckpt_path = make_embedder_ckpt("/tmp/fid_embedder_beat.bin")

    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = sd.get("model_state") or sd.get("state_dict") or sd
    enc = BeatEmbeddingEncoder()
    enc_params = pose_embedding_params_from_torch(sd)
    our_embed = jax.jit(lambda p: enc.apply({"params": enc_params}, p))

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_motion_autoencoder",
        f"{REFERENCE_ROOT}/scripts_beat/model/motion_autoencoder.py",
    )
    mae = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mae)
    ref_net = mae.HalfEmbeddingNet(
        types.SimpleNamespace(pose_length=34, pose_dims=282, vae_length=300)
    )
    ref_net.load_state_dict(sd)
    ref_net.eval()
    fidcalc = reference_fid_calculator()

    rng = jax.random.PRNGKey(233)
    ours_out, ours_ori, ref_out, ref_ori = [], [], [], []
    lat_delta = 0.0
    n_clips = 0
    for batch in loader:
        b = batch["motion"].shape[0]
        cond = {
            "audio": jnp.asarray(batch["audio"]),
            "vid": jnp.asarray(batch["vid"]),
            "emo": jnp.asarray(batch["emo"]),
            "origin_x": jnp.asarray(batch["motion"]),
        }
        rng, srng = jax.random.split(rng)
        sample = sampler(cond, srng, guidance=args.guidance_param)
        gen = np.asarray(sample).transpose(0, 3, 1, 2).reshape(b, 34, -1)
        real = batch["motion"].transpose(0, 3, 1, 2).reshape(b, 34, -1)
        ours_out.append(np.asarray(our_embed(gen)))
        ours_ori.append(np.asarray(our_embed(real)))
        with torch.no_grad():
            ref_out.append(ref_net(torch.from_numpy(gen)).numpy())
            ref_ori.append(ref_net(torch.from_numpy(real)).numpy())
        lat_delta = max(
            lat_delta,
            float(np.abs(ours_out[-1] - ref_out[-1]).max()),
            float(np.abs(ours_ori[-1] - ref_ori[-1]).max()),
        )
        n_clips += b

    our_fid = frechet_from_samples(
        np.concatenate(ours_out), np.concatenate(ours_ori)
    )
    ref_fid = fidcalc.frechet_distance(
        np.concatenate(ref_out), np.concatenate(ref_ori)
    )
    rel = abs(our_fid - ref_fid) / max(abs(ref_fid), 1e-12)
    print(json.dumps({
        "n_clips": n_clips,
        "guidance": args.guidance_param,
        "our_fid": float(our_fid),
        "ref_fid": float(ref_fid),
        "fid_rel_delta": float(rel),
        "max_latent_abs_delta": lat_delta,
        "within_1pct": bool(rel < 0.01),
    }))


if __name__ == "__main__":
    main()
