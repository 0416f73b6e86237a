"""Shared eval-CLI plumbing: SAG / CLIP weight loading and construction of
the two-stage LivelySpeaker composition pipeline.

Factors the loading logic the reference repeats across its eval scripts
(``scripts/test_LivelySpeaker_ted.py:38-54`` ``load_model``,
``scripts_beat/test_LivelySpeaker_beat.py:33-41``) into one place used by
``eval_livelyspeaker_ted.py``, ``eval_livelyspeaker_beat.py`` and
``eval_rag_beat.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from livelyspeaker_tpu.data.clip_tokenizer import CLIPTokenizer, HashTokenizer
from livelyspeaker_tpu.models.clip_text import (
    CLIPTextEncoder,
    clip_text_params_from_torch,
)
from livelyspeaker_tpu.models.sag import SAG
from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline
from livelyspeaker_tpu.training.checkpoints import load_params_npz

__all__ = [
    "load_sag_params",
    "load_clip",
    "load_tokenizer",
    "build_pipeline",
    "mesh_from_args",
    "final_npz",
    "fixture_fgd",
]


def mesh_from_args(args, batch_size=None):
    """('data',)-mesh over the first ``--data_parallel`` local devices, or
    None for the ordinary single-device path (parallel/sampling.py).

    Pass ``batch_size`` when the script clamps the loader batch below
    ``args.batch_size`` (e.g. ``min(batch, len(dataset))``) so the guard
    validates the batch the sampler will actually see."""
    dp = getattr(args, "data_parallel", 1)
    if dp <= 1:
        return None
    from livelyspeaker_tpu.parallel import create_mesh

    eff = batch_size if batch_size is not None else getattr(
        args, "batch_size", None
    )
    if eff and eff % dp:
        raise SystemExit(
            f"batch size {eff} must be a multiple of --data_parallel {dp}"
        )
    return create_mesh(n_devices=dp)


def load_sag_params(path):
    """SAG weights from our .npz export or the released torch .pth
    (test_LivelySpeaker_ted.py:40-47)."""
    if path.endswith(".npz"):
        return load_params_npz(path)
    import torch

    from livelyspeaker_tpu.utils.torch_convert import (
        sag_params_from_torch_state_dict,
    )

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return sag_params_from_torch_state_dict(sd)


def load_clip(args):
    """Frozen CLIP ViT-B/32 text tower (motionclip.py:96-104); random-init
    fallback keeps the pipeline runnable without the released weights."""
    clip_model = CLIPTextEncoder()
    if getattr(args, "clip_path", ""):
        import torch

        sd = torch.load(args.clip_path, map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        clip_params = clip_text_params_from_torch(sd)
    else:
        print("WARNING: random frozen CLIP text tower (no --clip_path)")
        clip_params = clip_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32)
        )["params"]
    return clip_model, clip_params


def load_tokenizer(args):
    return (CLIPTokenizer(args.bpe_path) if getattr(args, "bpe_path", "")
            else HashTokenizer())


def build_pipeline(args, rag, rag_params, njoints, nfeats, mesh=None):
    """Full two-stage composition: SAG semantic sketch -> q_sample to
    T - skip -> RAG refinement under CFG (test_LivelySpeaker_ted.py:85-113,
    test_LivelySpeaker_beat.py:101-130).  ``mesh`` (from
    :func:`mesh_from_args`) shards every stage's batch over chips."""
    sag = SAG(njoints=njoints, nfeats=nfeats,
              latent_dim=512)  # = CLIP text dim (motionclip.py:89)
    if getattr(args, "sag_path", ""):
        sag_params = load_sag_params(args.sag_path)
    else:
        print("WARNING: random-init SAG (no --sag_path)")
        sag_params = sag.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, njoints, nfeats, args.n_poses)),
        )["params"]
    clip_model, clip_params = load_clip(args)
    tokenizer = load_tokenizer(args)
    if (getattr(args, "guidance_param", 1.0) > 1.0
            and not getattr(args, "guidance_schedule", None)):
        # Measured footgun (BASELINE.md, DESIGN §18-19): at guidance > 1
        # constant CFG erodes the SAG sketch's text-borne signal in the
        # low-t refinement steps (TED: recall 0.48 -> 0.27; BEAT: SRGR
        # 1.05 -> 0.54).  The reference's own sweep hits this silently.
        print(
            f"WARNING: composition at guidance={args.guidance_param} with "
            "constant CFG erodes the SAG sketch's semantic contribution; "
            "pass --guidance_schedule cosine to preserve it "
            "(measured: BASELINE.md 'guidance schedules')",
            file=sys.stderr,
        )
    return LivelySpeakerPipeline(
        rag, rag_params, sag, sag_params, clip_model, clip_params, tokenizer,
        steps=args.diffusion_steps,
        timestep_respacing=args.timestep_respacing or "ddim100",
        skip_timesteps=(args.skip_steps
                        or 80),  # test_LivelySpeaker_beat.py:232
        mesh=mesh,
        guidance_schedule=getattr(args, "guidance_schedule", None),
        use_fused=getattr(args, "fused", False),
    )


def xt_boundary_probe(spaced, base_sched, model, params, motion, cond,
                      skip, *, noise_key=5, style_key=6):
    """x_t-sensitivity probe shared by the two semantic-payoff studies.

    q_samples REAL motion to the skip-boundary noise level and returns
    ``(t_boundary, x0_hat)`` — the denoiser's one-shot x0 prediction at the
    first executed refinement step.  If a classifier scores x0_hat ~1.0 the
    denoiser preserves mode content carried by x_t (and a low full-pipeline
    recall means the refinement loop erodes it); if ~chance the model
    memorised x0 ~= f(cond) and NO init_image signal can survive.

    ``spaced`` is the respaced schedule actually executed (its
    ``timestep_map`` converts the respaced boundary index to an
    ORIGINAL-process timestep — sample_loop starts the reverse chain at
    respaced index num_timesteps - skip - 1); ``base_sched`` is the
    unspaced schedule q_sample noises under.  ``skip`` is in respaced-grid
    units, bounds-checked here (the advisor's round-4 finding)."""
    import numpy as np

    from livelyspeaker_tpu.diffusion.sampling import q_sample

    idx = int(spaced.num_timesteps) - int(skip) - 1
    assert 0 <= idx < int(spaced.num_timesteps), (skip, spaced.num_timesteps)
    t_boundary = int(np.asarray(spaced.timestep_map)[idx])
    motion = jnp.asarray(motion)
    t = jnp.full((motion.shape[0],), t_boundary, jnp.int32)
    xb = q_sample(
        base_sched, motion, t,
        jax.random.normal(jax.random.PRNGKey(noise_key), motion.shape),
    )
    x0_hat = model.apply(
        {"params": params}, xb, t, cond, train=False,
        rngs={"style": jax.random.PRNGKey(style_key)},
    )["output"]
    return t_boundary, np.asarray(x0_hat)


def final_npz(save_dir, prefix="model"):
    """Latest ``{prefix}*.npz`` checkpoint in a training save_dir
    (``prefix="model"`` excludes the ``model_ema*`` exports;
    ``prefix="model_ema"`` selects them)."""
    import glob

    paths = sorted(
        p for p in glob.glob(os.path.join(save_dir, f"{prefix}*.npz"))
        if "ema" not in os.path.basename(p) or prefix.endswith("ema")
    )
    assert paths, f"no {prefix}*.npz in {save_dir}"
    return paths[-1]


def fixture_fgd(model, dataset, model_path, fixture, *, batch_size=64,
                timestep_respacing="ddim20", guidance=1.0, seed=233):
    """Sample the whole dataset through a checkpoint and score FGD against
    a frozen fixture embedder — the shared measurement loop of
    ``soak_flagship.py`` and ``measure_audio_bf16.py`` (one copy so the
    sampler setup / loader / reshape cannot drift between them)."""
    import numpy as np

    from livelyspeaker_tpu.data import DataLoader
    from livelyspeaker_tpu.pipeline import RAGSampler

    sampler = RAGSampler(
        model, load_params_npz(model_path), steps=1000,
        timestep_respacing=timestep_respacing, method="ddim",
    )
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=False, drop_last=True,
        seed=seed,
    )
    fixture.reset()
    rng = jax.random.PRNGKey(seed)
    nf = model.cfg.nframes

    def flat(m):  # [B, J, F, T] -> [B, T, J*F]
        m = np.asarray(m)
        return m.transpose(0, 3, 1, 2).reshape(m.shape[0], nf, -1)

    for batch in loader:
        cond = {
            "audio": jnp.asarray(batch["audio"]),
            "vid": jnp.asarray(batch["vid"]),
            "origin_x": jnp.asarray(batch["motion"]),
        }
        if "emo" in batch:  # BEAT conditioning (scripts_beat RAG.py:125-126)
            cond["emo"] = jnp.asarray(batch["emo"])
        rng, srng = jax.random.split(rng)
        sample = sampler(cond, srng, guidance=guidance)
        # TED windows carry the flat vec_seq directly; BEAT's rot6d motion
        # flattens the same way the FID protocol does (test_RAG_beat.py).
        real = batch["vec_seq"] if "vec_seq" in batch else flat(
            batch["motion"]
        )
        fixture.push_samples(flat(sample), real)
    fgd, _ = fixture.get_scores()
    return float(fgd)
