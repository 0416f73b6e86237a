#!/usr/bin/env python
"""Generate reference-checkpoint key manifests (tests/manifests/*.json).

A released checkpoint's day-1 ingestion failure mode is a key-surface
mismatch: the converter expects a key the file doesn't carry, or silently
skips one it should consume.  This tool pins the *exact* state_dict surface
of each released-checkpoint family by instantiating the reference's own
torch modules (CPU, random weights — we only need names+shapes) and dumping
``{key: shape}`` JSON manifests that `tests/test_checkpoint_manifests.py`
asserts the converters consume exactly.

Families (save sites in the reference):
  rag_ted.json    RAG state_dict, `clip_model.*` stripped
                  (scripts/train_utils/train_loop.py:205-225), flagship
                  latent 512 / 8 blocks (mdm_utils/parser_util.py:99-110)
  rag_beat.json   scripts_beat RAG ditto, njoints=47/nfeats=6
                  (scripts_beat/train_utils/train_loop.py, model_util.py:27-28)
  sag.json        MOTIONCLIP plain state_dict (tmp/SAG_trainer.py:230-235;
                  loaded at test_LivelySpeaker_ted.py:40-47)
  ted_evaluator.json   ckpt['gen_dict'] = EmbeddingNet(27, 34) state_dict
                  (scripts/model/ted_evaluator.py:14-23)
  beat_half_embedding.json  ckpt['model_state'] = HalfEmbeddingNet state_dict,
                  pose_dims 282 / vae_length 300 (configs/beat.yaml:17,26;
                  utils/other_tools.py:61-79)

Run from the repo root with the reference tree present at /root/reference.
The committed manifests are the artifact; this script only needs re-running
if the reference layout ever changes.
"""

import importlib
import json
import os
import sys
import types

REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "manifests")


def _purge(prefixes):
    for name in list(sys.modules):
        if any(name == p or name.startswith(p + ".") for p in prefixes):
            del sys.modules[name]


def _enter_tree(tree: str):
    """Point imports at one of the reference's two parallel code trees."""
    for p in (os.path.join(REFERENCE, "scripts"),
              os.path.join(REFERENCE, "scripts_beat")):
        while p in sys.path:
            sys.path.remove(p)
    _purge(["model", "diffusion", "mdm_utils", "utils", "dataloaders"])
    sys.path.insert(0, os.path.join(REFERENCE, tree))


def manifest(sd, strip=()):
    out = {}
    for k, v in sd.items():
        if any(k.startswith(s) for s in strip):
            continue
        out[k] = list(v.shape)
    return dict(sorted(out.items()))


def main():
    import argparse

    global REFERENCE
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference", default=REFERENCE,
                    help="reference tree to instantiate (default "
                         "$REFERENCE_DIR or /root/reference)")
    args = ap.parse_args()
    REFERENCE = args.reference

    # The reference imports the `clip` pip package at module scope
    # (model/RAG.py:5, model/motionclip.py:5); it is absent here and unneeded
    # for state_dict surfaces (only get_clip() touches it) — stub it.
    sys.modules.setdefault("clip", types.ModuleType("clip"))

    os.makedirs(OUT_DIR, exist_ok=True)
    manifests = {}

    rag_kwargs = dict(
        modeltype="", num_actions=1370, translation=True, pose_rep="rot6d",
        glob=True, glob_rot=True, latent_dim=512, ff_size=1024, num_layers=8,
        num_heads=4, dropout=0.1, activation="gelu", data_rep="vec_dir",
        cond_mode="text", cond_mask_prob=0.1, action_emb="tensor",
        arch="trans_enc", mlpact="silu",
    )

    _enter_tree("scripts")
    RAG_ted = importlib.import_module("model.RAG").RAG
    manifests["rag_ted"] = manifest(
        RAG_ted(njoints=9, nfeats=3, **rag_kwargs).state_dict(),
        strip=("clip_model.",),
    )

    enc_mod = importlib.import_module("model.motionclip_module")
    mc_mod = importlib.import_module("model.motionclip")
    sag = mc_mod.MOTIONCLIP(
        enc_mod.Encoder_TRANSFORMER(latent_dim=512),
        enc_mod.Decoder_TRANSFORMER(latent_dim=512, n_pre_poses=4,
                                    use_style=False),
        None,  # promptLearner (get_SAG passes None, motionclip.py:88)
        None,  # cfg is unused for the state_dict surface
    )
    manifests["sag"] = manifest(sag.state_dict())

    emb_mod = importlib.import_module("model.embedding_net")
    manifests["ted_evaluator"] = manifest(
        emb_mod.EmbeddingNet(pose_dim=27, n_frames=34).state_dict()
    )

    _enter_tree("scripts_beat")
    RAG_beat = importlib.import_module("model.RAG").RAG
    manifests["rag_beat"] = manifest(
        RAG_beat(njoints=47, nfeats=6, **rag_kwargs).state_dict(),
        strip=("clip_model.",),
    )

    ae_mod = importlib.import_module("model.motion_autoencoder")
    beat_args = types.SimpleNamespace(
        pose_length=34, pose_dims=282, vae_length=300
    )
    manifests["beat_half_embedding"] = manifest(
        ae_mod.HalfEmbeddingNet(beat_args).state_dict()
    )

    for name, m in manifests.items():
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"{name}: {len(m)} keys -> {path}")


if __name__ == "__main__":
    main()
