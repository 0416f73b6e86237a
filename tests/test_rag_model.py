"""RAG denoiser tests: shapes, CFG semantics, and weight-level parity with
the reference torch model via the checkpoint converter."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.models import (
    RAG,
    RAGConfig,
    WavEncoder,
    audio_samples_for_frames,
    make_cfg_denoiser,
    make_denoiser,
)
from livelyspeaker_tpu.utils.torch_convert import rag_params_from_torch_state_dict
from conftest import REFERENCE_ROOT, requires_reference

B, T = 2, 34
AUDIO_LEN = audio_samples_for_frames(T)  # 36266


def _cond(rng_np, cfg: RAGConfig):
    cond = {
        "audio": jnp.asarray(
            rng_np.normal(size=(B, AUDIO_LEN)).astype(np.float32)
        ),
        "vid": jnp.asarray(rng_np.integers(0, cfg.n_speakers, size=(B,))),
        "origin_x": jnp.asarray(
            rng_np.normal(size=(B, cfg.njoints, cfg.nfeats, T)).astype(np.float32)
        ),
    }
    if cfg.num_emotions:
        cond["emo"] = jnp.asarray(rng_np.integers(0, 8, size=(B,)))
    return cond


def _init(model, cfg, cond):
    x = jnp.zeros((B, cfg.njoints, cfg.nfeats, T))
    t = jnp.zeros((B,), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x,
        t,
        cond,
    )
    return variables["params"]


def test_wav_encoder_output_frames(rng_np):
    enc = WavEncoder()
    wav = jnp.asarray(rng_np.normal(size=(B, AUDIO_LEN)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), wav)
    out = enc.apply(params, wav)
    assert out.shape == (B, 34, 256)


def test_wav_encoder_bf16_matches_f32(rng_np):
    """audio_bf16: same f32 params, bf16 activations — features within the
    bf16 noise floor, returned f32, and master-param grads stay f32 (the
    HBM-bound training-step option, audio_encoder.py module docstring)."""
    wav = jnp.asarray(
        rng_np.normal(size=(B, AUDIO_LEN)).astype(np.float32) * 0.1
    )
    enc32, enc16 = WavEncoder(), WavEncoder(dtype=jnp.bfloat16)
    params = enc32.init(jax.random.PRNGKey(0), wav)
    f32 = enc32.apply(params, wav)
    f16 = enc16.apply(params, wav)
    assert f16.dtype == jnp.float32 and f16.shape == f32.shape
    rel = float(jnp.max(jnp.abs(f16 - f32)) / jnp.max(jnp.abs(f32)))
    assert rel < 3e-2, f"bf16 WavEncoder diverged: rel={rel}"

    g = jax.grad(lambda p: jnp.sum(enc16.apply(p, wav) ** 2))(params)
    assert all(
        l.dtype == jnp.float32 and bool(jnp.isfinite(l).all())
        for l in jax.tree_util.tree_leaves(g)
    )

    # plumbed through the model config
    cfg = RAGConfig.ted(latent_dim=64, num_layers=2, audio_bf16=True)
    model = RAG(cfg)
    rcond = _cond(rng_np, cfg)
    rp = _init(model, cfg, rcond)
    feats = model.apply(
        {"params": rp}, rcond["audio"], method=RAG.encode_audio
    )
    assert feats.dtype == jnp.float32 and feats.shape == (B, T, 256)


def test_rag_forward_shapes_ted(rng_np):
    cfg = RAGConfig.ted()
    model = RAG(cfg)
    cond = _cond(rng_np, cfg)
    params = _init(model, cfg, cond)
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    t = jnp.asarray([0, 999])
    out = model.apply(
        {"params": params}, x, t, cond, rngs={"style": jax.random.PRNGKey(2)}
    )
    assert out["output"].shape == (B, 9, 3, T)
    assert out["z_mu"].shape == (B, 1, cfg.latent_dim)


def test_rag_forward_shapes_beat(rng_np):
    cfg = RAGConfig.beat()
    assert cfg.seq_len == 36
    model = RAG(cfg)
    cond = _cond(rng_np, cfg)
    params = _init(model, cfg, cond)
    x = jnp.asarray(rng_np.normal(size=(B, 47, 6, T)).astype(np.float32))
    out = model.apply(
        {"params": params},
        x,
        jnp.asarray([5, 10]),
        cond,
        rngs={"style": jax.random.PRNGKey(2)},
    )
    assert out["output"].shape == (B, 47, 6, T)


def test_cond_drop_zeroes_audio_only(rng_np):
    """uncond output must equal the output with audio replaced by zeros
    *after the encoder* (mask_cond semantics, RAG.py:80-96)."""
    cfg = RAGConfig.ted(cond_mask_prob=0.1)
    model = RAG(cfg)
    cond = _cond(rng_np, cfg)
    params = _init(model, cfg, cond)
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    t = jnp.asarray([7, 7])
    eps = jnp.zeros((B, 1, cfg.latent_dim))

    cond_u = dict(cond, cond_drop=jnp.ones((B,)), style_eps=eps)
    out_u = model.apply({"params": params}, x, t, cond_u)["output"]

    # manually zero the *encoded* audio by feeding zero audio features
    af = model.apply({"params": params}, cond["audio"], method=model.encode_audio)
    cond_c = dict(cond, cond_drop=jnp.zeros((B,)), style_eps=eps)
    out_manual = model.apply(
        {"params": params}, x, t, cond_c, audio_feats=jnp.zeros_like(af)
    )["output"]
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_manual), atol=1e-5
    )


def test_cfg_denoiser_scale_identity(rng_np):
    """scale=1 must reduce to the conditioned output exactly."""
    cfg = RAGConfig.ted()
    model = RAG(cfg)
    cond = _cond(rng_np, cfg)
    params = _init(model, cfg, cond)
    cond_det = dict(cond, style_eps=jnp.zeros((B, 1, cfg.latent_dim)))
    den_cfg = make_cfg_denoiser(model, params, cond_det, 1.0)
    den_plain = make_denoiser(
        model, params, dict(cond_det, cond_drop=jnp.zeros((B,)))
    )
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, T)).astype(np.float32))
    t = jnp.asarray([3, 3])
    g = den_cfg(x, t, jax.random.PRNGKey(0))
    c = den_plain(x, t, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(g), np.asarray(c), atol=1e-5)


def _stub_clip():
    if "clip" not in sys.modules:
        sys.modules["clip"] = types.ModuleType("clip")


def _ref_rag_module():
    _stub_clip()
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    return importlib.import_module("model.RAG")


@requires_reference
def test_param_count_matches_reference():
    ref_mod = _ref_rag_module()
    ref = ref_mod.RAG(
        modeltype="",
        njoints=9,
        nfeats=3,
        num_actions=1370,
        translation=True,
        pose_rep="rot6d",
        glob=True,
        glob_rot=True,
        latent_dim=512,
        ff_size=1024,
        num_layers=8,
        cond_mask_prob=0.1,
    )
    ref_count = sum(p.numel() for p in ref.parameters())

    cfg = RAGConfig.ted()
    model = RAG(cfg)
    rng_np = np.random.default_rng(0)
    cond = _cond(rng_np, cfg)
    params = _init(model, cfg, cond)
    our_count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert our_count == ref_count


@requires_reference
def test_rag_forward_matches_reference(rng_np):
    """Load the same (random) torch weights into both frameworks; with
    deterministic style eps=0 and eval mode the outputs must match."""
    import torch

    ref_mod = _ref_rag_module()
    torch.manual_seed(0)
    ref = ref_mod.RAG(
        modeltype="",
        njoints=9,
        nfeats=3,
        num_actions=1370,
        translation=True,
        pose_rep="rot6d",
        glob=True,
        glob_rot=True,
        latent_dim=512,
        ff_size=1024,
        num_layers=8,
        cond_mask_prob=0.1,
    )
    ref.eval()
    sd = ref.state_dict()
    params = rag_params_from_torch_state_dict(sd, num_layers=8)

    cfg = RAGConfig.ted()
    model = RAG(cfg)

    x = rng_np.normal(size=(B, 9, 3, T)).astype(np.float32)
    audio = rng_np.normal(size=(B, AUDIO_LEN)).astype(np.float32) * 0.1
    origin = rng_np.normal(size=(B, 9, 3, T)).astype(np.float32)
    vid = rng_np.integers(0, 1400, size=(B,))
    t = np.array([17, 800])

    # reference forward with eps = 0: monkeypatch randn_like
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda a: torch.zeros_like(a)
    try:
        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(x),
                torch.from_numpy(t),
                y={
                    "audio_input": torch.from_numpy(audio),
                    "vid_indices": torch.from_numpy(vid),
                    "origin_x": torch.from_numpy(origin.copy()),
                },
            )
    finally:
        torch.randn_like = orig_randn_like

    cond = {
        "audio": jnp.asarray(audio),
        "vid": jnp.asarray(vid),
        "origin_x": jnp.asarray(origin),
        "style_eps": jnp.zeros((B, 1, cfg.latent_dim)),
    }
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), cond)

    np.testing.assert_allclose(
        np.asarray(out["z_mu"]), ref_out["z_mu"].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["output"]), ref_out["output"].numpy(), atol=2e-4
    )
