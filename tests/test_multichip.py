"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_mesh_shapes():
    mesh = create_mesh(n_devices=8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh_dp = create_mesh(n_devices=8)
    assert dict(mesh_dp.shape) == {"data": 8, "model": 1}


def test_param_sharding_rules(rng_np):
    mesh = create_mesh(n_devices=8, model_parallel=2)
    params = {
        "backbone": {
            "block_0": {
                "channel_mix": {
                    "kernel": jnp.zeros((128, 128)),
                    "bias": jnp.zeros((128,)),
                },
                "token_mix_kernel": jnp.zeros((35, 35)),
            }
        },
        "pose_final": {"kernel": jnp.zeros((128, 27))},  # 27 % 2 != 0
    }
    sh = param_shardings(params, mesh)
    ck = sh["backbone"]["block_0"]["channel_mix"]["kernel"]
    assert "model" in str(ck.spec)  # TP-sharded
    tk = sh["backbone"]["block_0"]["token_mix_kernel"]
    assert tk.spec == jax.sharding.PartitionSpec()  # replicated (no rule)
    pf = sh["pose_final"]["kernel"]
    assert pf.spec == jax.sharding.PartitionSpec()  # indivisible -> replicated


def test_data_parallel_batch_math(rng_np):
    """A sharded-batch matmul produces identical results to single-device."""
    mesh = create_mesh(n_devices=8)
    x = jnp.asarray(rng_np.normal(size=(16, 64)).astype(np.float32))
    w = jnp.asarray(rng_np.normal(size=(64, 32)).astype(np.float32))
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda a, b: a @ b)(xs, w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x @ w), rtol=2e-5, atol=1e-5
    )


def test_data_parallel_sampling_matches_single_device(rng_np):
    """The CFG sampling scan runs SPMD over a DP mesh and produces the same
    clips as the unsharded program (the eval/serving scale-out path)."""
    import jax.numpy as jnp

    from livelyspeaker_tpu.diffusion import DiffusionSchedule, sample_loop
    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
        make_cfg_denoiser,
    )

    cfg = RAGConfig(latent_dim=32, num_layers=1, n_speakers=4)
    model = RAG(cfg)
    b, nf = 16, cfg.nframes
    cond = {
        "audio": jnp.asarray(
            rng_np.normal(size=(b, audio_samples_for_frames(nf))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng_np.integers(0, 4, size=(b,))),
        "origin_x": jnp.zeros((b, cfg.njoints, cfg.nfeats, nf)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        cond["origin_x"],
        jnp.zeros((b,), jnp.int32),
        cond,
    )["params"]
    sched = DiffusionSchedule.create(
        steps=50, schedule="cosine", timestep_respacing="ddim5"
    )
    shape = (b, cfg.njoints, cfg.nfeats, nf)
    key = jax.random.PRNGKey(7)

    def run(c):
        den = make_cfg_denoiser(model, params, c, 1.5)
        return sample_loop(den, sched, shape, key, method="ddim")

    ref = jax.jit(run)(cond)

    mesh = create_mesh(n_devices=8)
    bs = batch_sharding(mesh)
    cond_sharded = {k: jax.device_put(v, bs) for k, v in cond.items()}
    out = jax.jit(run)(cond_sharded)
    # the output inherits the batch sharding; values match the single-device
    # program (elementwise math is untouched by DP)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
