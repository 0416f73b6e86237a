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
