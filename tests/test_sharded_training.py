"""shard_map data-parallel training (parallel/training.py): the explicit
DP twin of the GSPMD path, required by the GSPMD-opaque fused Pallas
backbone.  Runs on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from livelyspeaker_tpu.diffusion import DiffusionSchedule
from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.parallel import create_mesh, shard_train_step
from livelyspeaker_tpu.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)

N_DEV = 8
B_LOCAL = 2


def _setup(rng_np, fused=False, **tc_kw):
    cfg = RAGConfig.ted(
        latent_dim=64, num_layers=2, fused_train_backbone=fused
    )
    model = RAG(cfg)
    b = B_LOCAL
    shard = {
        "motion": jnp.asarray(
            rng_np.normal(size=(b, 9, 3, 34)).astype(np.float32) * 0.3
        ),
        "audio": jnp.asarray(
            rng_np.normal(
                size=(b, audio_samples_for_frames(34))
            ).astype(np.float32)
        ),
        "vid": jnp.asarray(rng_np.integers(0, 1400, size=(b,))),
    }
    import contextlib

    # fused init runs the pallas forward: interpret mode on the CPU host
    ctx = (pltpu.force_tpu_interpret_mode() if fused
           else contextlib.nullcontext())
    with ctx:
        params = model.init(
            {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1),
             "cond_mask": jax.random.PRNGKey(2)},
            shard["motion"],
            jnp.zeros((b,), jnp.int32),
            {"audio": shard["audio"], "vid": shard["vid"],
             "origin_x": shard["motion"]},
            train=True,
        )["params"]
    sched = DiffusionSchedule.create(steps=20)
    tcfg = TrainConfig(lr=1e-3, **tc_kw)
    tx = make_optimizer(tcfg)
    state = init_train_state(
        params, tx, cfg=tcfg, num_timesteps=sched.num_timesteps
    )
    return model, sched, tcfg, tx, state, shard


def _tile(shard, n):
    return {k: jnp.concatenate([v] * n) for k, v in shard.items()}


def test_sharded_step_equals_single_device_on_identical_shards(rng_np):
    """With fold_shard_rng=False and the same shard replicated to every
    device, each device computes the identical gradient, pmean is a no-op,
    and the sharded step must reproduce the single-device step on the
    shard batch exactly (same RNG path: the local step sees the raw key)."""
    model, sched, tcfg, tx, state, shard = _setup(rng_np)
    mesh = create_mesh()
    assert mesh.size == N_DEV

    sstep = shard_train_step(
        model, sched, tx, tcfg, mesh, fold_shard_rng=False, donate=False
    )
    ref_step = jax.jit(make_train_step(model, sched, tx, tcfg))

    key = jax.random.PRNGKey(3)
    new_sharded, m_sharded = sstep(state, _tile(shard, N_DEV), key)
    new_ref, m_ref = ref_step(state, shard, key)

    assert float(m_sharded["loss"]) == pytest.approx(
        float(m_ref["loss"]), rel=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(new_sharded.params), jax.tree.leaves(new_ref.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )
    # gathered per-sample arrays cover the global batch
    assert m_sharded["t"].shape == (N_DEV * B_LOCAL,)
    assert m_sharded["loss_per_sample"].shape == (N_DEV * B_LOCAL,)


def test_sharded_step_loss_aware_history_sees_global_batch(rng_np):
    """The loss-second-moment history must ingest the all_gathered global
    (t, loss) pairs — one count per GLOBAL sample, not per local shard."""
    model, sched, tcfg, tx, state, shard = _setup(
        rng_np, schedule_sampler="loss-second-moment"
    )
    mesh = create_mesh()
    sstep = shard_train_step(model, sched, tx, tcfg, mesh, donate=False)
    new_state, m = sstep(state, _tile(shard, N_DEV), jax.random.PRNGKey(4))
    counts = np.asarray(new_state.sampler_state.counts)
    assert counts.sum() == N_DEV * B_LOCAL
    # folded shard keys: shards drew their own timesteps
    assert len(np.unique(np.asarray(m["t"]))) > 1


def test_sharded_fused_train_step(rng_np):
    """The raison d'être: the fused custom-VJP backbone (opaque to GSPMD)
    training data-parallel under shard_map, in interpret mode on the CPU
    mesh.  The step must run, produce a finite loss close to the XLA
    path's, and actually update the replicated params."""
    model, sched, tcfg, tx, state, shard = _setup(rng_np, fused=True)
    # same params, same batch, fused flag off (the param trees are
    # identical by construction — asserted in test_pallas_kernels)
    xmodel = RAG(
        RAGConfig.ted(latent_dim=64, num_layers=2,
                      fused_train_backbone=False)
    )
    xstate = init_train_state(
        state.params, tx, cfg=tcfg, num_timesteps=sched.num_timesteps
    )
    # interpret-mode pallas fwd+bwd inside shard_map is expensive on the
    # 1-core CPU host: a 2-device mesh tests the wiring (specs, pmean,
    # gathers) just as well — the kernel math is covered by
    # test_pallas_kernels and the on-device bench gate.
    mesh = create_mesh(n_devices=2)
    batch = _tile(shard, 2)
    key = jax.random.PRNGKey(5)

    with pltpu.force_tpu_interpret_mode():
        sstep = shard_train_step(
            model, sched, tx, tcfg, mesh, fold_shard_rng=False, donate=False
        )
        new_state, m = sstep(state, batch, key)
        jax.block_until_ready(m["loss"])
    xstep = shard_train_step(
        xmodel, sched, tx, tcfg, mesh, fold_shard_rng=False, donate=False
    )
    _, xm = xstep(xstate, batch, key)

    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) == pytest.approx(float(xm["loss"]), rel=1e-3)
    before = jax.tree.leaves(state.params)
    after = jax.tree.leaves(new_state.params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_fsdp_step_matches_replicated_and_is_sharded(rng_np):
    """FSDP (mesh.py: fsdp_shard_params) is a placement decision: the GSPMD
    train step over fully-sharded params must reproduce the replicated-param
    step, while params/opt-state/EMA actually live sharded over 'data'."""
    from livelyspeaker_tpu.parallel import (
        DATA_AXIS,
        batch_sharding,
        fsdp_param_shardings,
        fsdp_shard_params,
        preserve_state_shardings,
    )

    model, sched, tcfg, _, state, shard = _setup(rng_np, ema_rate=0.999)
    mesh = create_mesh(model_parallel=2)  # data=4 x model=2
    batch = _tile(shard, 4)

    # SGD+momentum, not AdamW: the WavEncoder conv biases feed InstanceNorm,
    # so their true gradient is exactly 0 and what autodiff returns is f32
    # reduction-order noise (~1e-8) that *changes with placement*; Adam
    # normalises any nonzero grad to a ±lr step, amplifying that noise into
    # sign-flipping 1e-3 param deltas.  Under SGD the param delta is
    # lr*grad, so placement-invariance is testable at tight tolerance.
    # (Loss parity below is unaffected either way — the biases are
    # norm-invariant.)  Momentum gives the opt state a param-shaped leaf
    # whose sharding propagation we assert at the end.
    import optax

    tx = optax.sgd(1e-3, momentum=0.9)
    # no donation: ref and FSDP states share the initial param buffers
    step = jax.jit(make_train_step(model, sched, tx, tcfg))
    key = jax.random.PRNGKey(11)

    ref_state = init_train_state(
        state.params, tx, cfg=tcfg, num_timesteps=sched.num_timesteps
    )
    ref_state, ref_m = step(ref_state, batch, key)
    ref_state, ref_m2 = step(ref_state, batch, key)

    # min_size=1: at latent 64 the real threshold would leave everything
    # replicated; force sharding so the test exercises the gather/scatter.
    f_params = fsdp_shard_params(state.params, mesh, min_size=1)
    specs = jax.tree.leaves(fsdp_param_shardings(state.params, mesh,
                                                 min_size=1))
    assert any(DATA_AXIS in (s.spec or ()) for s in specs), (
        "FSDP rules sharded nothing over 'data'"
    )
    f_state = init_train_state(
        f_params, tx, cfg=tcfg, num_timesteps=sched.num_timesteps
    )
    # Pin the output state to the input placement: unconstrained, GSPMD
    # propagation re-replicates the state after one step (the all-gathers
    # at the weights' use sites make replicated outputs locally cheapest).
    f_step = jax.jit(
        preserve_state_shardings(
            make_train_step(model, sched, tx, tcfg), f_state
        )
    )
    bs = batch_sharding(mesh)
    f_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    f_state, f_m = f_step(f_state, f_batch, key)
    f_state, f_m2 = f_step(f_state, f_batch, key)

    for a, b in ((f_m, ref_m), (f_m2, ref_m2)):
        assert float(a["loss"]) == pytest.approx(float(b["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(f_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(f_state.ema_params),
                    jax.tree.leaves(ref_state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # The updated state must STAY fully-sharded (no silent re-replication):
    # the biggest leaves of params, both Adam moments and the EMA shadow
    # each carry 'data' in their post-step sharding.
    def spec_axes(spec):
        # PartitionSpec is a pytree LEAF — iterate its entries (each a mesh
        # axis name, None, or a tuple of names) rather than tree-flatten it.
        for e in spec or ():
            yield from (e if isinstance(e, (tuple, list)) else (e,))

    def data_sharded(tree):
        return any(
            DATA_AXIS in spec_axes(getattr(l.sharding, "spec", None))
            for l in jax.tree.leaves(tree)
        )

    assert data_sharded(f_state.params)
    assert data_sharded(f_state.ema_params)
    assert data_sharded(f_state.opt_state)


def test_trainloop_autopins_fsdp_placement(rng_np):
    """train_rag.py hands TrainLoop FSDP-placed params; the loop must detect
    the non-trivial NamedSharding, wrap its jitted step with
    preserve_state_shardings, and finish run_loop with params + EMA still
    sharded over 'data' (loop.py) — including through its private
    jnp.array param copy."""
    from livelyspeaker_tpu.parallel import DATA_AXIS, fsdp_shard_params
    from livelyspeaker_tpu.training.loop import TrainLoop

    model, sched, tcfg, tx, state, shard = _setup(rng_np)
    mesh = create_mesh()
    f_params = fsdp_shard_params(state.params, mesh, min_size=1)
    batch = _tile(shard, N_DEV)

    loop = TrainLoop(
        model,
        sched,
        f_params,
        [batch, batch],
        cfg=TrainConfig(lr=1e-3, ema_rate=0.99),
        num_epochs=1,
        log_interval=1,
        save_after_epoch=-1,
    )
    loop.run_loop()
    assert loop.step == 2

    def data_sharded(tree):
        def axes(spec):
            for e in spec or ():
                yield from (e if isinstance(e, (tuple, list)) else (e,))

        return any(
            DATA_AXIS in axes(getattr(l.sharding, "spec", None))
            for l in jax.tree.leaves(tree)
        )

    assert data_sharded(loop.state.params), "run_loop re-replicated params"
    assert data_sharded(loop.state.ema_params), "run_loop re-replicated EMA"


def test_fsdp_resume_is_bit_exact_and_stays_sharded(tmp_path, rng_np):
    """Kill-and-resume under FSDP: orbax restores into the TrainLoop's state
    template, whose leaves carry the FSDP NamedShardings — so the resumed
    run must (a) come back data-sharded, and (b) replay the uninterrupted
    trajectory bit-exactly (same fold_in(base, step) key stream)."""
    from livelyspeaker_tpu.parallel import DATA_AXIS, fsdp_shard_params
    from livelyspeaker_tpu.training.loop import TrainLoop

    model, sched, tcfg, tx, state, shard = _setup(rng_np)
    mesh = create_mesh()
    f_params = fsdp_shard_params(state.params, mesh, min_size=1)
    batches = [_tile(shard, N_DEV), _tile(shard, N_DEV)]

    def mk(save_dir, epochs, resume=False):
        return TrainLoop(
            model,
            sched,
            f_params,
            batches,
            cfg=TrainConfig(lr=1e-3, ema_rate=0.99),
            save_dir=save_dir,
            num_epochs=epochs,
            log_interval=1000,
            save_after_epoch=-1,
            save_every_epochs=1,
            seed=7,
            resume=resume,
        )

    full = mk(str(tmp_path / "full"), 2).run_loop()
    mk(str(tmp_path / "split"), 1).run_loop()
    resumed_loop = mk(str(tmp_path / "split"), 2, resume=True)
    assert resumed_loop.start_step == 2
    resumed = resumed_loop.run_loop()

    assert int(resumed.step) == int(full.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        full.params,
        resumed.params,
    )

    def data_sharded(tree):
        def axes(spec):
            for e in spec or ():
                yield from (e if isinstance(e, (tuple, list)) else (e,))

        return any(
            DATA_AXIS in axes(getattr(l.sharding, "spec", None))
            for l in jax.tree.leaves(tree)
        )

    assert data_sharded(resumed.params), "restore dropped the FSDP placement"
    assert data_sharded(resumed.ema_params)
