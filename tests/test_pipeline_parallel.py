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


def test_pipeline_train_step_matches_plain():
    """The --pipeline_parallel trainer path: make_train_step with the
    pipeline backbone_factory must reproduce the plain step's loss and
    updated params (same RNG => same t/noise/style draws; the pipeline is
    numerically identical to the sequential stack)."""
    from livelyspeaker_tpu.diffusion import DiffusionSchedule
    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )
    from livelyspeaker_tpu.parallel import make_pipeline_backbone_factory
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(3)
    cfg = RAGConfig.ted(latent_dim=64, num_layers=4)
    model = RAG(cfg)
    B = 8
    batch = {
        "motion": jnp.asarray(
            rng.normal(size=(B, 9, 3, 34)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            rng.normal(size=(B, audio_samples_for_frames(34))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, cfg.n_speakers, size=(B,))),
    }
    params = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "style": jax.random.PRNGKey(1),
            "cond_mask": jax.random.PRNGKey(2),
        },
        batch["motion"],
        jnp.zeros((B,), jnp.int32),
        {"audio": batch["audio"], "vid": batch["vid"],
         "origin_x": batch["motion"]},
        train=True,
    )["params"]

    tcfg = TrainConfig(lr=1e-3)
    # SGD, not Adam: Adam's step-1 update is ~lr*sign(g), so float-reorder
    # noise in near-zero grads flips signs and the comparison is
    # ill-conditioned; SGD is linear in g and the tolerance meaningful.
    import optax

    tx = optax.sgd(0.1)
    mesh = create_pipeline_mesh(n_devices=8, pipeline_parallel=2)
    factory = make_pipeline_backbone_factory(cfg, mesh, num_microbatches=2)

    key = jax.random.PRNGKey(11)
    plain = jax.jit(make_train_step(model, sched := DiffusionSchedule.create(
        steps=50, schedule="cosine"), tx, tcfg))
    piped = jax.jit(
        make_train_step(model, sched, tx, tcfg, backbone_factory=factory)
    )
    s0 = init_train_state(params, tx)
    s1p, mp = plain(s0, batch, key)
    s1q, mq = piped(s0, batch, key)
    np.testing.assert_allclose(
        float(mq["loss"]), float(mp["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1q.params), jax.tree.leaves(s1p.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_pipeline_composes_with_fsdp():
    """--pipeline_parallel + --fsdp (round 5): the canonical tree stays
    'data'-sharded (ZeRO memory) while pipeline_forward reshards the
    stacked copies over 'stage'.  Loss must match the replicated-PP step
    and the updated state must STAY 'data'-sharded."""
    import optax

    from livelyspeaker_tpu.diffusion import DiffusionSchedule
    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )
    from livelyspeaker_tpu.parallel import (
        fsdp_param_shardings,
        make_pipeline_backbone_factory,
        preserve_state_shardings,
        replicated,
    )
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(5)
    cfg = RAGConfig.ted(latent_dim=64, num_layers=4)
    model = RAG(cfg)
    B = 8
    batch = {
        "motion": jnp.asarray(
            rng.normal(size=(B, 9, 3, 34)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            rng.normal(size=(B, audio_samples_for_frames(34))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, cfg.n_speakers, size=(B,))),
    }
    params_host = jax.tree.map(
        np.asarray,
        model.init(
            {
                "params": jax.random.PRNGKey(0),
                "style": jax.random.PRNGKey(1),
                "cond_mask": jax.random.PRNGKey(2),
            },
            batch["motion"],
            jnp.zeros((B,), jnp.int32),
            {"audio": batch["audio"], "vid": batch["vid"],
             "origin_x": batch["motion"]},
            train=True,
        )["params"],
    )
    sched = DiffusionSchedule.create(steps=50, schedule="cosine")
    tcfg = TrainConfig(lr=1e-3)
    tx = optax.sgd(0.1)
    mesh = create_pipeline_mesh(n_devices=8, pipeline_parallel=2)
    step = make_train_step(
        model, sched, tx, tcfg,
        backbone_factory=make_pipeline_backbone_factory(
            cfg, mesh, num_microbatches=2
        ),
    )
    key = jax.random.PRNGKey(11)

    rep_state = init_train_state(
        jax.device_put(
            jax.tree.map(jnp.asarray, params_host), replicated(mesh)
        ),
        tx,
    )
    _, m_rep = jax.jit(step)(rep_state, batch, key)

    # min_size=1: the tiny test model's leaves must actually shard
    sh = fsdp_param_shardings(params_host, mesh, min_size=1)
    # the ('data','stage') mesh has no 'model' axis; specs must be valid
    f_state = init_train_state(
        jax.device_put(jax.tree.map(jnp.asarray, params_host), sh), tx
    )
    f2, m_f = jax.jit(
        preserve_state_shardings(step, f_state), donate_argnums=0
    )(f_state, batch, key)
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_rep["loss"]), rtol=1e-5
    )
    n_sharded = sum(
        any(
            "data" in (e if isinstance(e, tuple) else (e,))
            for e in (getattr(l.sharding, "spec", None) or ())
        )
        for l in jax.tree.leaves(f2.params)
    )
    assert n_sharded > 0, "PP+FSDP left every param leaf replicated"
