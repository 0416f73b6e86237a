"""End-to-end generation parity: the reference's complete eval path
(ClassifierFreeSampleModel + SpacedDiffusion.ddim_sample_loop with a real
RAG) against our batched-CFG sample_loop with converted weights — identical
initial noise, deterministic style token, eta=0.

This composes every previously-unit-verified piece (weight converter, model
forward, CFG combination, respaced DDIM chain) through the REAL model, so a
match here means a user gets the same clips from both frameworks.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.diffusion import DiffusionSchedule, sample_loop
from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.models.cfg import make_cfg_denoiser
from livelyspeaker_tpu.utils.torch_convert import rag_params_from_torch_state_dict
from conftest import REFERENCE_ROOT, requires_reference

B, T = 2, 34
STEPS, RESPACE = 100, "ddim10"


@requires_reference
def test_full_generation_matches_reference(rng_np):
    import torch

    sys.modules.setdefault("clip", types.ModuleType("clip"))
    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    import importlib

    gd = importlib.import_module("diffusion.gaussian_diffusion")
    respace = importlib.import_module("diffusion.respace")
    ref_rag_mod = importlib.import_module("model.RAG")
    cfg_mod = importlib.import_module("model.cfg_sampler")

    torch.manual_seed(1)
    ref_model = ref_rag_mod.RAG(
        modeltype="", njoints=9, nfeats=3, num_actions=1370, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=512,
        ff_size=1024, num_layers=8, cond_mask_prob=0.1,
    )
    ref_model.eval()
    sd = ref_model.state_dict()

    betas = gd.get_named_beta_schedule("cosine", STEPS, 1.0)
    ref_diff = respace.SpacedDiffusion(
        use_timesteps=sorted(respace.space_timesteps(STEPS, RESPACE)),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.HUBER,
        rescale_timesteps=False,
    )
    guided = cfg_mod.ClassifierFreeSampleModel(ref_model)
    guided.eval()

    audio = rng_np.normal(size=(B, audio_samples_for_frames(T))).astype(
        np.float32
    ) * 0.1
    origin = rng_np.normal(size=(B, 9, 3, T)).astype(np.float32)
    vid = rng_np.integers(0, 1400, size=(B,))
    noise0 = rng_np.normal(size=(B, 9, 3, T)).astype(np.float32)
    scale = 1.5

    # deterministic style token on the reference side
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda a: torch.zeros_like(a)
    try:
        with torch.no_grad():
            cond = {
                "y": {
                    "audio_input": torch.from_numpy(audio),
                    "vid_indices": torch.from_numpy(vid),
                    "origin_x": torch.from_numpy(origin.copy()),
                    "scale": torch.full((B,), scale),
                }
            }
            ref_out = ref_diff.ddim_sample_loop(
                guided,
                (B, 9, 3, T),
                noise=torch.from_numpy(noise0),
                clip_denoised=False,
                model_kwargs=cond,
                eta=0.0,
            ).numpy()
    finally:
        torch.randn_like = orig_randn_like

    # ours: converted weights, same noise, style_eps = 0
    params = rag_params_from_torch_state_dict(sd, num_layers=8)
    model = RAG(RAGConfig.ted())
    our_cond = {
        "audio": jnp.asarray(audio),
        "vid": jnp.asarray(vid),
        "origin_x": jnp.asarray(origin),
        "style_eps": jnp.zeros((B, 1, 512)),
    }
    sched = DiffusionSchedule.create(
        steps=STEPS, schedule="cosine", timestep_respacing=RESPACE
    )
    denoise = make_cfg_denoiser(model, params, our_cond, scale)
    our_out = np.asarray(
        sample_loop(
            denoise,
            sched,
            (B, 9, 3, T),
            jax.random.PRNGKey(0),
            method="ddim",
            noise=jnp.asarray(noise0),
        )
    )

    # 10 chained forwards through 8-block networks accumulate fp error;
    # 2e-3 absolute on O(1) outputs is framework-noise level.
    np.testing.assert_allclose(our_out, ref_out, atol=2e-3)
    # sanity: the chain actually did something model-dependent
    assert np.abs(our_out).mean() > 1e-3
