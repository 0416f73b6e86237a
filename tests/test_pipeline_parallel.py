"""Pipeline parallelism (GPipe over 'stage') on the virtual 8-device mesh.

Correctness bar: the pipelined program must be *numerically identical* to the
sequential TransMLP forward — same float ops per block, only the schedule
differs — and differentiable (the backward pass pipelines in reverse under
jax.grad).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.models.mlp_backbone import TimestepEmbedder, TransMLP
from livelyspeaker_tpu.parallel import (
    create_pipeline_mesh,
    pipeline_forward,
    stack_block_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

L, T, D = 8, 35, 64


@pytest.fixture(scope="module")
def backbone(rng_np_module=None):
    rng = np.random.default_rng(7)
    model = TransMLP(seq_len=T, num_layers=L, dim=D)
    x = jnp.asarray(rng.normal(size=(16, T, D)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 1000, size=(16,)))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    ref = model.apply({"params": params}, x, t)
    emb = TimestepEmbedder(D).apply(
        {"params": params["embed_timestep"]}, t
    )
    stacked = stack_block_params(params, L)
    return x, emb, stacked, ref


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (8, 2), (4, 8)])
def test_pipeline_matches_sequential(backbone, stages, micro):
    x, emb, stacked, ref = backbone
    mesh = create_pipeline_mesh(n_devices=stages, pipeline_parallel=stages)
    out = pipeline_forward(stacked, x, emb, mesh, num_microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_with_data_parallel(backbone):
    """('data' 2, 'stage' 4): each data-row runs an independent pipeline."""
    x, emb, stacked, ref = backbone
    mesh = create_pipeline_mesh(n_devices=8, pipeline_parallel=4)
    assert dict(mesh.shape) == {"data": 2, "stage": 4}
    out = pipeline_forward(stacked, x, emb, mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_with_tensor_parallel_3axis(backbone):
    """('data' 2, 'stage' 2, 'model' 2): TP column-shards the channel mix
    inside each stage; dp x pp x tp composed in one shard_map program."""
    x, emb, stacked, ref = backbone
    mesh = create_pipeline_mesh(
        n_devices=8, pipeline_parallel=2, model_parallel=2
    )
    assert dict(mesh.shape) == {"data": 2, "stage": 2, "model": 2}
    out = pipeline_forward(stacked, x, emb, mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_backward(backbone):
    """Grads through ppermute+scan match the sequential program's grads."""
    x, emb, stacked, ref = backbone
    mesh = create_pipeline_mesh(n_devices=4, pipeline_parallel=4)

    def loss_pp(p):
        return jnp.sum(pipeline_forward(p, x, emb, mesh) ** 2)

    def _block_seq(p, h):
        from livelyspeaker_tpu.parallel.pipeline import _block

        return _block(p, h, emb, jax.nn.silu)

    def loss_seq(p):
        def body(h, pl):
            return _block_seq(pl, h), None

        h, _ = jax.lax.scan(body, x, p)
        return jnp.sum(h**2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    for k in stacked:
        np.testing.assert_allclose(
            np.asarray(g_pp[k]),
            np.asarray(g_seq[k]),
            rtol=2e-3,
            atol=2e-4,
            err_msg=k,
        )


def test_pipeline_rejects_indivisible_layers(backbone):
    x, emb, stacked, _ = backbone
    mesh = create_pipeline_mesh(n_devices=3, pipeline_parallel=3)
    with pytest.raises(AssertionError):
        pipeline_forward(stacked, x, emb, mesh)
