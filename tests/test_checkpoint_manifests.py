"""Reference-checkpoint key-surface manifests.

The converters in utils/torch_convert.py + models/embedding_net.py are
parity-tested against same-layout torch modules, but a released checkpoint
can still fail on day 1 if its *key surface* differs from what the converter
consumes.  tests/manifests/*.json pin the exact state_dict surface of each
released-checkpoint family, generated from the reference's own module trees
by scripts/gen_reference_manifests.py:

  rag_ted / rag_beat   RAG state_dict with clip_model.* stripped
                       (scripts/train_utils/train_loop.py:205-225)
  sag                  MOTIONCLIP plain state_dict (tmp/SAG_trainer.py:230-235)
  ted_evaluator        ckpt['gen_dict'] (scripts/model/ted_evaluator.py:14-23)
  beat_half_embedding  ckpt['model_state'] (scripts_beat/utils/
                       other_tools.py:61-79, motion_autoencoder.py:156-167)

Each test feeds the converter a synthetic state_dict carrying EXACTLY the
manifest's keys/shapes and asserts
  (a) conversion succeeds (no missing key),
  (b) every unconsumed key is in the documented ignore set (deterministic
      buffers our models regenerate, or decoder halves the eval protocol
      never runs),
  (c) the converted tree structurally matches our model's init tree
      (same leaf paths and shapes), so the params actually load.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "manifests")


def load_manifest(name):
    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        return json.load(f)


class RecordingDict(dict):
    """state_dict wrapper recording which keys a converter touches."""

    def __init__(self, data):
        super().__init__(data)
        self.touched = set()

    def __getitem__(self, k):
        self.touched.add(k)
        return super().__getitem__(k)


def synthetic_sd(manifest, seed=0):
    rng = np.random.default_rng(seed)
    return RecordingDict(
        {
            k: rng.normal(size=shape).astype(np.float32)
            for k, shape in manifest.items()
        }
    )


def tree_paths_and_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[jax.tree_util.keystr(path)] = tuple(np.shape(leaf))
    return out


def assert_surface(sd, manifest, ignore):
    untouched = set(manifest) - sd.touched
    unexpected = untouched - ignore
    assert not unexpected, (
        f"manifest keys the converter silently skipped: {sorted(unexpected)}"
    )
    dead_ignores = ignore - set(manifest)
    assert not dead_ignores, (
        f"ignore-set entries not in the manifest: {sorted(dead_ignores)}"
    )


# Deterministic sinusoid tables (RAG.py:141-157, mlp_module.py:104-120);
# our models rebuild them in closed form, so the converter ignores the
# checkpointed copies.
RAG_PE_BUFFERS = {
    "sequence_pos_encoder.pe",
    "backbone.sequence_pos_encoder.pe",
    "backbone.embed_timestep.sequence_pos_encoder.pe",
}


@pytest.mark.parametrize(
    "name,beat",
    [("rag_ted", False), ("rag_beat", True)],
    ids=["ted", "beat"],
)
def test_rag_manifest_surface_and_structure(name, beat):
    from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
    from livelyspeaker_tpu.utils.torch_convert import (
        rag_params_from_torch_state_dict,
    )

    manifest = load_manifest(name)
    sd = synthetic_sd(manifest)
    params = rag_params_from_torch_state_dict(
        sd, num_layers=8, num_emotions=8 if beat else 0
    )
    assert_surface(sd, manifest, ignore=RAG_PE_BUFFERS)

    cfg = RAGConfig.beat() if beat else RAGConfig.ted()
    model = RAG(cfg)
    b, nf = 1, cfg.nframes
    cond = {
        "audio": jnp.zeros((b, audio_samples_for_frames(nf))),
        "vid": jnp.zeros((b,), jnp.int32),
        "origin_x": jnp.zeros((b, cfg.njoints, cfg.nfeats, nf)),
    }
    if beat:
        cond["emo"] = jnp.zeros((b,), jnp.int32)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.zeros((b, cfg.njoints, cfg.nfeats, nf)),
        jnp.zeros((b,), jnp.int32),
        cond,
    )["params"]
    assert tree_paths_and_shapes(params) == tree_paths_and_shapes(init)


def test_sag_manifest_surface_and_structure():
    from livelyspeaker_tpu.models.sag import SAG
    from livelyspeaker_tpu.utils.torch_convert import (
        sag_params_from_torch_state_dict,
    )

    manifest = load_manifest("sag")
    sd = synthetic_sd(manifest)
    params = sag_params_from_torch_state_dict(sd, num_layers=3)
    assert_surface(
        sd,
        manifest,
        ignore={
            "encoder.sequence_pos_encoder.pe",
            "decoder.sequence_pos_encoder.pe",
        },
    )

    model = SAG()
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 9, 3, 34))
    )["params"]
    assert tree_paths_and_shapes(params) == tree_paths_and_shapes(init)


@pytest.mark.parametrize(
    "name,encoder_cls_name",
    [
        ("ted_evaluator", "TedEmbeddingEncoder"),
        ("beat_half_embedding", "BeatEmbeddingEncoder"),
    ],
    ids=["ted", "beat"],
)
def test_embedding_manifest_surface_and_structure(name, encoder_cls_name):
    import livelyspeaker_tpu.models.embedding_net as emb
    from livelyspeaker_tpu.models.embedding_net import (
        pose_embedding_params_from_torch,
    )

    manifest = load_manifest(name)
    sd = synthetic_sd(manifest)
    # BN running_var must be positive for init-structure comparison realism
    for k in sd:
        if k.endswith("running_var"):
            dict.__setitem__(sd, k, np.abs(sd[k]) + 0.5)
    params = pose_embedding_params_from_torch(sd)

    # FGD/FID runs the frozen *encoder* mean path only
    # (ted_evaluator.py:61-67 embeds via pose_encoder; HalfEmbeddingNet
    # .forward ignores mu/logvar and the decoder entirely), so the decoder
    # half, the variational head, and BN step counters are deliberately
    # unconsumed.
    ignore = {
        k
        for k in manifest
        if k.startswith("decoder.")
        or k.startswith("pose_encoder.fc_logvar.")
        or k.endswith("num_batches_tracked")
    }
    assert_surface(sd, manifest, ignore=ignore)

    net = getattr(emb, encoder_cls_name)(n_frames=34)
    init = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 34, net.pose_dim))
    )["params"]
    assert tree_paths_and_shapes(params) == tree_paths_and_shapes(init)
