"""Pallas kernel parity tests (run in interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.models.mlp_backbone import TimestepEmbedder, TransMLP
from livelyspeaker_tpu.ops.pallas.fused_mlp import (
    fused_transmlp,
    pack_transmlp_params,
)


@pytest.mark.parametrize("batch,seq,dim,layers", [(4, 35, 128, 2), (6, 36, 256, 3)])
def test_fused_transmlp_matches_flax(rng_np, batch, seq, dim, layers):
    model = TransMLP(seq_len=seq, num_layers=layers, dim=dim)
    x = jnp.asarray(rng_np.normal(size=(batch, seq, dim)).astype(np.float32))
    t = jnp.asarray(rng_np.integers(0, 1000, size=(batch,)))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    # give channel-mix real magnitude so the test isn't trivially residual
    params = jax.tree.map(
        lambda p: p * 50.0 if p.ndim == 2 and p.shape == (dim, dim) else p,
        params,
    )

    ref = model.apply({"params": params}, x, t)

    emb = TimestepEmbedder(dim).apply(
        {"params": params["embed_timestep"]}, t
    )
    packed = pack_transmlp_params(params, layers)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = fused_transmlp(x, emb, packed, batch_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_transmlp_ragged_batch(rng_np):
    """batch not divisible by batch_tile exercises the padding path."""
    model = TransMLP(seq_len=35, num_layers=2, dim=128)
    x = jnp.asarray(rng_np.normal(size=(5, 35, 128)).astype(np.float32))
    t = jnp.asarray([0, 1, 2, 3, 999])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    ref = model.apply({"params": params}, x, t)
    emb = TimestepEmbedder(128).apply({"params": params["embed_timestep"]}, t)
    packed = pack_transmlp_params(params, 2)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = fused_transmlp(x, emb, packed, batch_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_transmlp_bf16_parity(rng_np):
    """bf16 weights/activations stay within bf16 tolerance of f32."""
    from jax.experimental.pallas import tpu as pltpu

    model = TransMLP(seq_len=35, num_layers=2, dim=128)
    x = jnp.asarray(rng_np.normal(size=(4, 35, 128)).astype(np.float32))
    t = jnp.asarray([0, 10, 500, 999])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    ref = model.apply({"params": params}, x, t)
    emb = TimestepEmbedder(128).apply({"params": params["embed_timestep"]}, t)
    packed16 = pack_transmlp_params(params, 2, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = fused_transmlp(
            x.astype(jnp.bfloat16), emb.astype(jnp.bfloat16), packed16,
            batch_tile=16,
        )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )


# ---------------------------------------------------------------------------
# Training kernel (fused forward + hand-written Pallas backward)
# ---------------------------------------------------------------------------


def test_fused_vjp_backbone_matches_xla_grads(rng_np):
    """value_and_grad through TransMLP(fused_vjp=True) == the plain Flax
    stack: same loss, same grads for every backbone/embedder param and the
    input cotangent (ops/pallas/fused_mlp_train.py)."""
    from jax.experimental.pallas import tpu as pltpu

    seq, dim, layers, batch = 35, 128, 2, 5
    m0 = TransMLP(seq_len=seq, num_layers=layers, dim=dim)
    m1 = TransMLP(seq_len=seq, num_layers=layers, dim=dim, fused_vjp=True,
                  fused_batch_tile=4)
    x = jnp.asarray(rng_np.normal(size=(batch, seq, dim)).astype(np.float32))
    t = jnp.asarray(rng_np.integers(0, 1000, size=(batch,)))
    w = jnp.asarray(rng_np.normal(size=(batch, seq, dim)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), x, t)["params"]
    params = jax.tree.map(
        lambda p: p * 50.0 if p.ndim == 2 and p.shape == (dim, dim) else p,
        params,
    )

    def loss(m, p, xx):
        return jnp.sum(m.apply({"params": p}, xx, t) * w)

    l0, (gp0, gx0) = jax.value_and_grad(
        lambda p, xx: loss(m0, p, xx), argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        l1, (gp1, gx1) = jax.value_and_grad(
            lambda p, xx: loss(m1, p, xx), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=5e-3)
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(gp1)
    }
    for k, v in flat0:
        ks = jax.tree_util.keystr(k)
        scale = max(float(jnp.max(jnp.abs(v))), 1.0)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat1[ks]), atol=5e-4 * scale,
            err_msg=f"grad mismatch at {ks}",
        )


def test_fused_vjp_rag_param_tree_and_loss(rng_np):
    """RAGConfig(fused_train_backbone=True) keeps the param tree (checkpoint
    compatibility) and the identical forward output."""
    from jax.experimental.pallas import tpu as pltpu

    from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames

    kw = dict(latent_dim=128, num_layers=2, n_speakers=7, speaker_dim=8,
              audio_feat_dim=16)
    m0 = RAG(RAGConfig.ted(**kw))
    m1 = RAG(RAGConfig.ted(fused_train_backbone=True, **kw))
    B, nf = 3, 34
    x = jnp.asarray(rng_np.normal(size=(B, 9, 3, nf)).astype(np.float32))
    t = jnp.asarray(rng_np.integers(0, 1000, size=(B,)))
    cond = {
        "audio": jnp.asarray(rng_np.normal(
            size=(B, audio_samples_for_frames(nf))).astype(np.float32)),
        "vid": jnp.asarray(rng_np.integers(0, 7, size=(B,))),
        "origin_x": x,
    }
    rngs = {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)}
    p0 = m0.init(rngs, x, t, cond)["params"]
    with pltpu.force_tpu_interpret_mode():
        p1 = m1.init(rngs, x, t, cond)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert all(
        float(jnp.max(jnp.abs(a - b))) == 0.0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )

    out0 = m0.apply({"params": p0}, x, t, cond,
                    rngs={"style": jax.random.PRNGKey(2)})
    with pltpu.force_tpu_interpret_mode():
        out1 = m1.apply({"params": p0}, x, t, cond,
                        rngs={"style": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(
        np.asarray(out0["output"]), np.asarray(out1["output"]), atol=2e-4
    )


def test_fused_transmlp_fold_ln2_matches_flax(rng_np):
    """fold_ln2=True absorbs LN2's affine into the channel-mix weights;
    with randomized (non-identity) LN2 params the folded kernel must still
    match the Flax backbone."""
    batch, seq, dim, layers = 4, 35, 128, 2
    model = TransMLP(seq_len=seq, num_layers=layers, dim=dim)
    x = jnp.asarray(rng_np.normal(size=(batch, seq, dim)).astype(np.float32))
    t = jnp.asarray(rng_np.integers(0, 1000, size=(batch,)))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    params = jax.tree.map(
        lambda p: p * 50.0 if p.ndim == 2 and p.shape == (dim, dim) else p,
        params,
    )
    # non-trivial LN2 affine so the fold actually moves something
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: (
            p + jnp.asarray(
                rng_np.normal(scale=0.5, size=p.shape).astype(np.float32)
            )
            if any(getattr(k, "key", None) == "ln2" for k in path)
            else p
        ),
        params,
    )

    ref = model.apply({"params": params}, x, t)
    emb = TimestepEmbedder(dim).apply({"params": params["embed_timestep"]}, t)
    folded = pack_transmlp_params(params, layers, fold_ln2=True)
    assert "ln2_scale" not in folded and "ln2_bias" not in folded
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = fused_transmlp(x, emb, folded, batch_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
