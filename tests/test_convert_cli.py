"""Converter-CLI dress rehearsal: the released-file workflow, end to end.

test_checkpoint_manifests.py proves the converter *functions* consume the
pinned key surfaces; this file proves the actual day-1 user workflow: a
real ``torch.save``-format checkpoint file (exact manifest key surface,
including the release wrappers — plain state_dict for RAG/SAG per
scripts/train_utils/train_loop.py:205-225 and tmp/SAG_trainer.py:230-235,
``{'gen_dict': ...}`` for the TED evaluator per
scripts/model/ted_evaluator.py:14-23, ``{'model_state': ...}`` for the BEAT
HalfEmbeddingNet per scripts_beat/utils/other_tools.py:61-79) is driven
through ``scripts/convert_checkpoint.py`` as a subprocess, the resulting
npz is loaded back, and a 1-batch forward runs on the loaded params.
The RAG family additionally exercises the ``args.json`` sidecar restore
(parse_and_load_from_model, mdm_utils/parser_util.py:7-39).
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_checkpoint_manifests import load_manifest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONVERT = os.path.join(REPO, "scripts", "convert_checkpoint.py")


def torch_sd(manifest, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in manifest.items():
        if k.endswith("num_batches_tracked"):
            sd[k] = torch.tensor(7, dtype=torch.int64)
        elif k.endswith("running_var"):
            sd[k] = torch.from_numpy(
                np.abs(rng.normal(size=shape)).astype(np.float32) + 0.5
            )
        else:
            sd[k] = torch.from_numpy(
                rng.normal(size=shape).astype(np.float32)
            )
    return sd


def run_convert(kind, src, dst, *extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, CONVERT, kind, src, dst, *extra],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(dst)


@pytest.mark.parametrize(
    "name,beat", [("rag_ted", False), ("rag_beat", True)], ids=["ted", "beat"]
)
def test_convert_cli_rag(tmp_path, name, beat):
    from livelyspeaker_tpu.models import (
        RAG, RAGConfig, audio_samples_for_frames,
    )
    from livelyspeaker_tpu.utils.config import generate_args

    src = str(tmp_path / "RAG.pt")
    dst = str(tmp_path / "rag.npz")
    # the release format: plain CLIP-stripped state_dict
    # (train_loop.py:205-225)
    torch.save(torch_sd(load_manifest(name)), src)
    # args.json sidecar exactly as the reference trainer writes it
    # (train_RAG.py:30-33); apply_saved_args restores model args from it
    saved = {"latent_dim": 512, "layers": 8,
             "num_emotions": 8 if beat else 0}
    with open(tmp_path / "args.json", "w") as f:
        json.dump(saved, f)
    args = generate_args(
        ["--model_path", src, "--data_dir", str(tmp_path)]
        + (["--num_emotions", "0"] if beat else [])
    )
    # sidecar restore overrides the CLI value (parser_util.py:7-39)
    assert args.num_emotions == (8 if beat else 0)
    assert args.latent_dim == 512 and args.layers == 8

    run_convert("rag", src, dst, "--layers", str(args.layers),
                "--num_emotions", str(args.num_emotions))

    # the eval chain's loader accepts the converted npz...
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from eval_rag_ted import load_rag_params
    finally:
        sys.path.pop(0)
    params = load_rag_params(dst, args)

    # ...and a 1-batch forward runs on the loaded params
    cfg = RAGConfig.beat() if beat else RAGConfig.ted()
    model = RAG(cfg)
    b = 2
    cond = {
        "audio": jnp.zeros((b, audio_samples_for_frames(cfg.nframes))),
        "vid": jnp.zeros((b,), jnp.int32),
        "origin_x": jnp.zeros((b, cfg.njoints, cfg.nfeats, cfg.nframes)),
    }
    if beat:
        cond["emo"] = jnp.zeros((b,), jnp.int32)
    out = model.apply(
        {"params": params},
        jnp.zeros((b, cfg.njoints, cfg.nfeats, cfg.nframes)),
        jnp.zeros((b,), jnp.int32),
        cond, train=False, rngs={"style": jax.random.PRNGKey(0)},
    )["output"]
    assert out.shape == (b, cfg.njoints, cfg.nfeats, cfg.nframes)
    assert bool(jnp.isfinite(out).all())


def test_convert_cli_sag(tmp_path):
    from livelyspeaker_tpu.models.sag import SAG
    from livelyspeaker_tpu.training.checkpoints import load_params_npz

    src = str(tmp_path / "SAG.pth")
    dst = str(tmp_path / "sag.npz")
    torch.save(torch_sd(load_manifest("sag")), src)  # SAG_trainer.py:230-235
    run_convert("sag", src, dst)

    params = load_params_npz(dst)
    sag = SAG()
    x = jnp.zeros((2, 9, 3, 34))
    out = sag.apply({"params": params}, x)
    assert out["output"].shape == x.shape
    assert bool(jnp.isfinite(out["output"]).all())


@pytest.mark.parametrize(
    "name,kind,wrapper,encoder_cls_name,pose_dim",
    [
        ("ted_evaluator", "fgd", "gen_dict", "TedEmbeddingEncoder", 27),
        ("beat_half_embedding", "beat_fid", "model_state",
         "BeatEmbeddingEncoder", 282),
    ],
    ids=["ted", "beat"],
)
def test_convert_cli_embedding(tmp_path, name, kind, wrapper,
                               encoder_cls_name, pose_dim):
    import livelyspeaker_tpu.models.embedding_net as emb
    from livelyspeaker_tpu.training.checkpoints import load_params_npz

    src = str(tmp_path / f"{name}.bin")
    dst = str(tmp_path / f"{name}.npz")
    # release wrapper: {'gen_dict': sd} (ted_evaluator.py:14-23) /
    # {'model_state': sd} (other_tools.py:61-79)
    torch.save({wrapper: torch_sd(load_manifest(name))}, src)
    run_convert(kind, src, dst)

    params = load_params_npz(dst)
    net = getattr(emb, encoder_cls_name)(n_frames=34)
    feat = net.apply({"params": params}, jnp.zeros((2, 34, pose_dim)))
    assert feat.ndim == 2 and feat.shape[0] == 2
    assert bool(jnp.isfinite(feat).all())
