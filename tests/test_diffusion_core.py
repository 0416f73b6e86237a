"""Numerical tests for the diffusion core: closed-form identities plus
golden-value parity against the reference guided-diffusion fork (torch CPU),
when /root/reference is present."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.diffusion import (
    DiffusionSchedule,
    MeanType,
    VarType,
    get_named_beta_schedule,
    huber,
    masked_l2,
    normal_kl,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
    sample_loop,
    space_timesteps,
    training_losses,
    uniform_sample_t,
)
from conftest import REFERENCE_ROOT, requires_reference


def test_linear_schedule_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_bounded():
    betas = get_named_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert betas.max() <= 0.999 and betas.min() > 0


def test_space_timesteps_ddim():
    s = space_timesteps(1000, "ddim100")
    assert len(s) == 100
    assert min(s) == 0
    assert sorted(s)[1] - sorted(s)[0] == 10


def test_space_timesteps_sections():
    s = space_timesteps(300, [10, 15, 20])
    assert len(s) == 45


def test_schedule_tables_consistency():
    sched = DiffusionSchedule.create(steps=100, schedule="cosine")
    acp = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2, acp, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2, 1 - acp, rtol=1e-4
    )
    # posterior variance at t=0 is clipped in log space
    assert np.isfinite(np.asarray(sched.posterior_log_variance_clipped)).all()


def test_q_sample_moments():
    """q(x_t|x_0) has mean sqrt(acp)*x0 and var (1-acp)."""
    sched = DiffusionSchedule.create(steps=50, schedule="linear")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((4096, 4))
    t = jnp.full((4096,), 30)
    noise = jax.random.normal(rng, x0.shape)
    xt = q_sample(sched, x0, t, noise)
    acp = float(sched.alphas_cumprod[30])
    assert float(jnp.mean(xt)) == pytest.approx(np.sqrt(acp), abs=0.01)
    assert float(jnp.var(xt)) == pytest.approx(1 - acp, abs=0.02)


def test_xstart_eps_roundtrip():
    sched = DiffusionSchedule.create(steps=50, schedule="cosine")
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (8, 3))
    t = jnp.arange(8) % 50
    eps = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    x0 = predict_xstart_from_eps(sched, x, t, eps)
    eps2 = predict_eps_from_xstart(sched, x, t, x0)
    np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), atol=1e-4)


def test_posterior_mean_at_t0_like():
    """With x0 known and t small, posterior mean ≈ x0."""
    sched = DiffusionSchedule.create(steps=1000, schedule="cosine")
    x0 = jnp.full((2, 3), 0.5)
    xt = q_sample(sched, x0, jnp.zeros((2,), jnp.int32), jnp.zeros((2, 3)))
    mean, _, _ = q_posterior_mean_variance(
        sched, x0, xt, jnp.zeros((2,), jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(mean), 0.5, atol=1e-3)


def test_huber_matches_manual():
    a = jnp.array([0.0, 1.0, 0.05])
    b = jnp.array([0.0, 0.0, 0.0])
    # d = (a-b)/0.1 -> [0, 10, 0.5]; losses [0, 9.5, 0.125]; mean*0.1
    expected = (0 + 9.5 + 0.125) / 3 * 0.1
    assert float(huber(a, b)) == pytest.approx(expected, rel=1e-6)


def test_masked_l2_mask_semantics():
    a = jnp.ones((2, 3, 2, 4))
    b = jnp.zeros((2, 3, 2, 4))
    mask = jnp.ones((2, 1, 1, 4)).at[:, :, :, 2:].set(0.0)
    out = masked_l2(a, b, mask)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_normal_kl_zero():
    z = jnp.zeros((3,))
    np.testing.assert_allclose(np.asarray(normal_kl(z, z, z, z)), 0.0, atol=1e-7)


def _perfect_denoiser(sched, x_true):
    """A denoiser that always returns the true x0 — the chain must converge
    to x_true exactly under DDIM (eta=0)."""

    def fn(x, t, rng):
        return jnp.broadcast_to(x_true, x.shape)

    return fn


@pytest.mark.parametrize("method", ["ddpm", "ddim", "plms"])
def test_sample_loop_converges_with_oracle(method):
    sched = DiffusionSchedule.create(steps=50, schedule="cosine")
    x_true = jnp.full((1, 2, 3, 4), 0.25)
    fn = _perfect_denoiser(sched, x_true)
    out = sample_loop(
        fn, sched, (6, 2, 3, 4), jax.random.PRNGKey(0), method=method
    )
    assert out.shape == (6, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-3)


@pytest.mark.parametrize("method", ["ddpm", "ddim", "plms", "dpmpp"])
def test_sample_loop_trajectory_and_dump(method):
    """Reference dump_steps semantics (gd.py:647-670): collect pred_xstart
    (TED) or post-step sample (BEAT) at chosen loop indices."""
    from livelyspeaker_tpu.diffusion import sample_loop_with_dump

    sched = DiffusionSchedule.create(steps=20, schedule="cosine")
    x_true = jnp.full((1, 2, 3, 4), 0.25)
    fn = _perfect_denoiser(sched, x_true)
    final, dumped = sample_loop_with_dump(
        fn,
        sched,
        (3, 2, 3, 4),
        jax.random.PRNGKey(1),
        dump_steps=[0, 5, 19],
        dump_field="pred_xstart",
        method=method,
    )
    assert dumped.shape == (3, 3, 2, 3, 4)
    # with an oracle denoiser, every dumped pred_xstart is exactly x_true
    np.testing.assert_allclose(np.asarray(dumped), 0.25, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), 0.25, atol=1e-3)

    # BEAT semantics: the dumped SAMPLE at the last loop index is the final x
    final2, dumped2 = sample_loop_with_dump(
        fn,
        sched,
        (3, 2, 3, 4),
        jax.random.PRNGKey(1),
        dump_steps=[19],
        dump_field="sample",
        method=method,
    )
    np.testing.assert_array_equal(np.asarray(dumped2[0]), np.asarray(final2))


def test_sample_loop_skip_and_init_image():
    sched = DiffusionSchedule.create(
        steps=1000, schedule="cosine", timestep_respacing="ddim100"
    )
    assert sched.num_timesteps == 100
    x_true = jnp.full((1, 2, 3, 4), -0.1)
    fn = _perfect_denoiser(sched, x_true)
    out = sample_loop(
        fn,
        sched,
        (2, 2, 3, 4),
        jax.random.PRNGKey(3),
        method="ddim",
        skip_timesteps=80,
        init_image=jnp.full((2, 2, 3, 4), -0.1),
    )
    np.testing.assert_allclose(np.asarray(out), -0.1, atol=1e-3)


def test_training_losses_shapes():
    sched = DiffusionSchedule.create(steps=20, schedule="cosine")
    x0 = jnp.zeros((4, 2, 3, 8))

    def model_fn(x_t, t):
        return {
            "output": jnp.zeros_like(x_t),
            "z_mu": jnp.zeros((4, 1, 16)),
            "z_logvar": jnp.zeros((4, 1, 16)),
        }

    t, w = uniform_sample_t(jax.random.PRNGKey(0), 4, 20)
    terms = training_losses(
        model_fn, sched, x0, t, jax.random.PRNGKey(1), loss_type="huber"
    )
    assert set(terms) >= {"rot_mse", "vel_mse", "kld", "loss"}
    # perfect prediction of x0=0 output=0 -> rot_mse = huber(0, 0) = 0
    assert float(terms["rot_mse"]) == pytest.approx(0.0, abs=1e-6)
    assert float(terms["kld"]) == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Golden parity vs the reference implementation (torch CPU)
# ---------------------------------------------------------------------------


def _load_reference_diffusion(respacing=""):
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    gd = importlib.import_module("diffusion.gaussian_diffusion")
    respace = importlib.import_module("diffusion.respace")
    betas = gd.get_named_beta_schedule("cosine", 1000, 1.0)
    use = respace.space_timesteps(1000, respacing or [1000])
    ref = respace.SpacedDiffusion(
        use_timesteps=sorted(use),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.HUBER,
        rescale_timesteps=False,
        lambda_vel=1.0,
    )
    return ref


@requires_reference
@pytest.mark.parametrize("respacing", ["", "ddim100"])
def test_schedule_tables_match_reference(respacing):
    ref = _load_reference_diffusion(respacing)
    ours = DiffusionSchedule.create(
        steps=1000, schedule="cosine", timestep_respacing=respacing or None
    )
    for name in [
        "betas",
        "alphas_cumprod",
        "alphas_cumprod_prev",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(ref, name).astype(np.float64),
            rtol=2e-5,
            atol=1e-7,
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(ours.timestep_map), np.array(ref.timestep_map)
    )


@requires_reference
def test_q_sample_and_posterior_match_reference(rng_np):
    import torch

    ref = _load_reference_diffusion()
    ours = DiffusionSchedule.create(steps=1000, schedule="cosine")
    x0 = rng_np.normal(size=(4, 9, 3, 34)).astype(np.float32)
    noise = rng_np.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 17, 500, 999])

    ref_xt = ref.q_sample(
        torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)
    ).numpy()
    our_xt = np.asarray(q_sample(ours, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(our_xt, ref_xt, rtol=1e-4, atol=1e-5)

    rm, rv, rlv = ref.q_posterior_mean_variance(
        torch.from_numpy(x0), torch.from_numpy(ref_xt), torch.from_numpy(t)
    )
    om, ov, olv = q_posterior_mean_variance(
        ours, jnp.asarray(x0), jnp.asarray(our_xt), jnp.asarray(t)
    )
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(olv), x0.shape),
        rlv.numpy().astype(np.float32),
        rtol=1e-4,
        atol=1e-5,
    )


@requires_reference
def test_p_mean_variance_matches_reference(rng_np):
    import torch

    ref = _load_reference_diffusion("ddim100")
    ours = DiffusionSchedule.create(
        steps=1000, schedule="cosine", timestep_respacing="ddim100"
    )
    x = rng_np.normal(size=(4, 9, 3, 34)).astype(np.float32)
    pred_x0 = rng_np.normal(size=x.shape).astype(np.float32) * 0.3
    t = np.array([0, 5, 50, 99])

    class FakeModel:
        def __call__(self, xx, tt, y=None):
            return torch.from_numpy(pred_x0)

        def parameters(self):
            return iter([torch.zeros(1)])

    ref_out = ref.p_mean_variance(
        FakeModel(),
        torch.from_numpy(x),
        torch.from_numpy(t),
        clip_denoised=False,
        model_kwargs={"y": {}},
    )
    our_out = p_mean_variance(
        ours,
        jnp.asarray(pred_x0),
        jnp.asarray(x),
        jnp.asarray(t),
        mean_type=MeanType.START_X,
        var_type=VarType.FIXED_SMALL,
        clip_denoised=False,
    )
    np.testing.assert_allclose(
        np.asarray(our_out["mean"]), ref_out["mean"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(our_out["log_variance"]), x.shape),
        ref_out["log_variance"].numpy().astype(np.float32),
        rtol=1e-4,
        atol=1e-5,
    )


@requires_reference
def test_huber_loss_matches_reference(rng_np):
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    from diffusion.gaussian_diffusion import compute_huber

    a = rng_np.normal(size=(8, 27)).astype(np.float32)
    b = rng_np.normal(size=(8, 27)).astype(np.float32)
    ref_val = compute_huber(torch.from_numpy(a), torch.from_numpy(b)).item()
    our_val = float(huber(jnp.asarray(a), jnp.asarray(b)))
    assert our_val == pytest.approx(ref_val, rel=1e-5)


@requires_reference
def test_ddim_full_loop_matches_reference(rng_np):
    """Run a 10-step DDIM chain with a deterministic fake denoiser and fixed
    noise: our scan must produce the same trajectory as the reference loop."""
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    gd = importlib.import_module("diffusion.gaussian_diffusion")
    respace = importlib.import_module("diffusion.respace")

    betas = gd.get_named_beta_schedule("cosine", 100, 1.0)
    use = respace.space_timesteps(100, "ddim10")
    ref = respace.SpacedDiffusion(
        use_timesteps=sorted(use),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.HUBER,
        rescale_timesteps=False,
    )
    ours = DiffusionSchedule.create(
        steps=100, schedule="cosine", timestep_respacing="ddim10"
    )

    shape = (2, 3, 2, 5)
    x_init = rng_np.normal(size=shape).astype(np.float32)

    # Deterministic "denoiser": x0_hat = tanh(x) * scaled by t.
    def our_fn(x, t_model, rng):
        return jnp.tanh(x) * (1.0 - t_model[:, None, None, None] / 200.0)

    class RefModel:
        def __call__(self, x, t, y=None):
            return torch.tanh(x) * (1.0 - t[:, None, None, None].float() / 200.0)

        def parameters(self):
            return iter([torch.zeros(1)])

    ref_out = ref.ddim_sample_loop(
        RefModel(),
        shape,
        noise=torch.from_numpy(x_init),
        clip_denoised=False,
        model_kwargs={"y": {}},
        eta=0.0,
    ).numpy()

    our_out = np.asarray(
        sample_loop(
            our_fn,
            ours,
            shape,
            jax.random.PRNGKey(0),
            method="ddim",
            noise=jnp.asarray(x_init),
            eta=0.0,
        )
    )
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-3, atol=1e-4)


@requires_reference
def test_plms_full_loop_matches_reference(rng_np):
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    gd = importlib.import_module("diffusion.gaussian_diffusion")
    respace = importlib.import_module("diffusion.respace")

    betas = gd.get_named_beta_schedule("cosine", 100, 1.0)
    ref = respace.SpacedDiffusion(
        use_timesteps=sorted(respace.space_timesteps(100, "ddim10")),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.HUBER,
        rescale_timesteps=False,
    )
    ours = DiffusionSchedule.create(
        steps=100, schedule="cosine", timestep_respacing="ddim10"
    )
    shape = (2, 3, 2, 5)
    x_init = rng_np.normal(size=shape).astype(np.float32)

    def our_fn(x, t_model, rng):
        return jnp.tanh(x) * 0.5

    class RefModel:
        def __call__(self, x, t, y=None):
            return torch.tanh(x) * 0.5

        def parameters(self):
            return iter([torch.zeros(1)])

    ref_out = ref.plms_sample_loop(
        RefModel(),
        shape,
        noise=torch.from_numpy(x_init),
        clip_denoised=False,
        model_kwargs={"y": {}},
        order=2,
    ).numpy()
    our_out = np.asarray(
        sample_loop(
            our_fn,
            ours,
            shape,
            jax.random.PRNGKey(0),
            method="plms",
            order=2,
            noise=jnp.asarray(x_init),
        )
    )
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-3, atol=1e-4)


def test_classifier_guidance_shifts_samples():
    """cond_fn pulling toward +1 must shift DDPM and DDIM outputs upward
    (condition_mean / condition_score, gd.py:429-505)."""
    sched = DiffusionSchedule.create(steps=30, schedule="cosine")

    def fn(x, t, rng):  # x-dependent so guidance shifts propagate
        return jnp.tanh(x) * 0.5

    def cond_fn(x, t):
        return jnp.ones_like(x) * 2.0  # grad log p(y|x) pointing up

    for method in ("ddpm", "ddim"):
        base = sample_loop(
            fn, sched, (4, 2, 2, 4), jax.random.PRNGKey(0), method=method
        )
        guided = sample_loop(
            fn, sched, (4, 2, 2, 4), jax.random.PRNGKey(0), method=method,
            cond_fn=cond_fn,
        )
        assert float(jnp.mean(guided)) > float(jnp.mean(base)) + 0.05, method


@requires_reference
def test_ddim_cond_fn_matches_reference(rng_np):
    """DDIM with classifier guidance (condition_score) against the reference."""
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    gd = importlib.import_module("diffusion.gaussian_diffusion")
    respace = importlib.import_module("diffusion.respace")
    betas = gd.get_named_beta_schedule("cosine", 100, 1.0)
    ref = respace.SpacedDiffusion(
        use_timesteps=sorted(respace.space_timesteps(100, "ddim10")),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.HUBER,
        rescale_timesteps=False,
    )
    ours = DiffusionSchedule.create(
        steps=100, schedule="cosine", timestep_respacing="ddim10"
    )
    shape = (2, 3, 2, 5)
    x_init = rng_np.normal(size=shape).astype(np.float32)

    def our_fn(x, t_model, rng):
        return jnp.tanh(x) * 0.5

    def our_cond(x, t):
        return 0.3 * jnp.sign(x)

    class RefModel:
        def __call__(self, x, t, y=None):
            return torch.tanh(x) * 0.5

        def parameters(self):
            return iter([torch.zeros(1)])

    def ref_cond(x, t, y=None):
        return 0.3 * torch.sign(x)

    ref_out = ref.ddim_sample_loop(
        RefModel(),
        shape,
        noise=torch.from_numpy(x_init),
        clip_denoised=False,
        model_kwargs={"y": {}},
        cond_fn=ref_cond,
        eta=0.0,
    ).numpy()
    our_out = np.asarray(
        sample_loop(
            our_fn,
            ours,
            shape,
            jax.random.PRNGKey(0),
            method="ddim",
            noise=jnp.asarray(x_init),
            cond_fn=our_cond,
        )
    )
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-3, atol=1e-4)


def test_dpmpp_oracle_convergence():
    """DPM-Solver++ with a perfect x0 oracle converges exactly."""
    sched = DiffusionSchedule.create(steps=50, schedule="cosine")
    x_true = jnp.full((1, 2, 3, 4), 0.3)
    fn = _perfect_denoiser(sched, x_true)
    out = sample_loop(
        fn, sched, (4, 2, 3, 4), jax.random.PRNGKey(0), method="dpmpp"
    )
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-3)


def test_dpmpp_few_steps_tracks_dense_ddim():
    """With a smooth x-dependent model, 10-step DPM-Solver++ should land
    closer to the dense (100-step DDIM) solution than 10-step DDIM does."""

    def fn(x, t, rng):
        return jnp.tanh(x) * 0.8

    shape = (4, 2, 3, 4)
    noise = jax.random.normal(jax.random.PRNGKey(5), shape)

    dense_sched = DiffusionSchedule.create(steps=1000, schedule="cosine",
                                           timestep_respacing="ddim100")
    ref = sample_loop(fn, dense_sched, shape, jax.random.PRNGKey(0),
                      method="ddim", noise=noise)

    few = DiffusionSchedule.create(steps=1000, schedule="cosine",
                                   timestep_respacing="ddim10")
    out_ddim = sample_loop(fn, few, shape, jax.random.PRNGKey(0),
                           method="ddim", noise=noise)
    out_dpmpp = sample_loop(fn, few, shape, jax.random.PRNGKey(0),
                            method="dpmpp", noise=noise)
    err_ddim = float(jnp.abs(out_ddim - ref).mean())
    err_dpmpp = float(jnp.abs(out_dpmpp - ref).mean())
    assert err_dpmpp < err_ddim, (err_dpmpp, err_ddim)


def test_ddim_reverse_roundtrip():
    """Encode x0 -> x_T with reverse_loop, decode back with DDIM: for a
    smooth model the roundtrip approximately recovers x0 (DDIM inversion)."""
    from livelyspeaker_tpu.diffusion import reverse_loop

    sched = DiffusionSchedule.create(
        steps=1000, schedule="cosine", timestep_respacing="ddim50"
    )

    def fn(x, t, rng):
        return jnp.tanh(x) * 0.9

    x0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (2, 2, 3, 4))) * 0.5
    x_t = reverse_loop(fn, sched, x0, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(x_t).all())
    back = sample_loop(
        fn, sched, x0.shape, jax.random.PRNGKey(2), method="ddim",
        noise=x_t,
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=0.15)
