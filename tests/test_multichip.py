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


def _tiny_rag_setup(rng_np, b=16, latent=32, layers=1):
    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )

    cfg = RAGConfig(latent_dim=latent, num_layers=layers, n_speakers=4)
    model = RAG(cfg)
    nf = cfg.nframes
    cond = {
        "audio": jnp.asarray(
            rng_np.normal(size=(b, audio_samples_for_frames(nf))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng_np.integers(0, 4, size=(b,))),
        "origin_x": jnp.zeros((b, cfg.njoints, cfg.nfeats, nf)),
        # pin the speaker-VAE noise so fused/XLA and mesh/single programs
        # draw identical style samples regardless of their rng plumbing
        "style_eps": jnp.asarray(
            rng_np.normal(size=(b, 1, latent)).astype(np.float32)
        ),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        cond["origin_x"],
        jnp.zeros((b,), jnp.int32),
        cond,
    )["params"]
    return model, params, cond


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_rag_sampler_mesh_matches_single_device(rng_np, model_parallel):
    """RAGSampler(mesh=...) is a placement decision, not a numerics change:
    the DP (and DPxTP) GSPMD program reproduces the single-device clips."""
    from livelyspeaker_tpu.pipeline import RAGSampler

    model, params, cond = _tiny_rag_setup(rng_np)
    kw = dict(steps=50, timestep_respacing="ddim4", method="ddim")
    key = jax.random.PRNGKey(11)
    ref = RAGSampler(model, params, **kw)(cond, key, guidance=1.5)

    mesh = create_mesh(n_devices=8, model_parallel=model_parallel)
    sharded = RAGSampler(model, params, mesh=mesh, **kw)
    out = sharded(cond, key, guidance=1.5)
    assert "data" in str(out.sharding.spec)  # batch stayed sharded
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_rag_sampler_mesh_rejects_indivisible_batch(rng_np):
    from livelyspeaker_tpu.pipeline import RAGSampler

    model, params, cond = _tiny_rag_setup(rng_np, b=6)
    mesh = create_mesh(n_devices=8)
    sampler = RAGSampler(
        model, params, steps=50, timestep_respacing="ddim2", mesh=mesh
    )
    with pytest.raises(ValueError, match="must divide"):
        sampler(cond, jax.random.PRNGKey(0))


def test_shard_sample_fn_shard_map_folds_keys(rng_np):
    """shard_map mode: each data shard computes fn on its local batch with
    fold_in(key, shard) — exactly the per-shard key contract documented."""
    from livelyspeaker_tpu.parallel.sampling import shard_sample_fn

    mesh = create_mesh(n_devices=8)
    x = jnp.asarray(rng_np.normal(size=(16, 8)).astype(np.float32))

    def fn(params, x, rng):
        return x + jax.random.normal(rng, x.shape)

    wrapped = shard_sample_fn(
        fn, mesh, {}, batched=(True, False), use_shard_map=True, rng_arg=1
    )
    key = jax.random.PRNGKey(3)
    out = np.asarray(wrapped({}, x, key))
    for shard in (0, 5):
        lo = shard * 2
        expect = fn({}, x[lo : lo + 2], jax.random.fold_in(key, shard))
        np.testing.assert_allclose(
            out[lo : lo + 2], np.asarray(expect), rtol=1e-6, atol=1e-6
        )


def test_rag_sampler_fused_mesh_shard_map(rng_np):
    """The fused-Pallas sampler under a DP mesh: every shard runs the whole
    chain locally (pallas is opaque to GSPMD) and matches an unsharded
    fused sampler run on that shard's slice with the folded key."""
    from jax.experimental.pallas import tpu as pltpu

    from livelyspeaker_tpu.pipeline import RAGSampler

    # interpret-mode pallas inside shard_map is expensive on the CPU host:
    # keep this to a 2-device mesh and a 2-step chain — it's the wrapper
    # wiring (specs, rng fold) under test, not the kernel math (covered by
    # test_pallas_kernels.py and the on-device bench gate).
    model, params, cond = _tiny_rag_setup(rng_np, b=4, latent=128)
    kw = dict(steps=50, timestep_respacing="ddim2", method="ddim",
              use_fused=True)
    mesh = create_mesh(n_devices=2)
    key = jax.random.PRNGKey(5)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            RAGSampler(model, params, mesh=mesh, **kw)(cond, key, guidance=1.5)
        )
        local = RAGSampler(model, params, **kw)
        for shard in (0, 1):
            lo = shard * 2
            csl = {k: v[lo : lo + 2] for k, v in cond.items()}
            expect = local(
                csl, jax.random.fold_in(key, shard), guidance=1.5
            )
            np.testing.assert_allclose(
                out[lo : lo + 2], np.asarray(expect), rtol=2e-4, atol=2e-4
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
