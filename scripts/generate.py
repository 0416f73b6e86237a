#!/usr/bin/env python
"""Generate a gesture clip from audio (+ optional transcript) and export it.

The user-facing demo path: load a trained RAG (and optionally SAG + CLIP for
the full LivelySpeaker composition), condition on a waveform, sample, and
write a rendered GIF/mp4 (TED) plus the raw motion npz.

Examples:
    # RAG-only from a wav-like npy waveform (16 kHz float)
    python scripts/generate.py --model_path rag.npz --audio my16k.npy \
        --out /tmp/clip

    # full composition with text
    python scripts/generate.py --model_path rag.npz --sag_path sag.npz \
        --text 'we should protect the oceans' --audio my16k.npy --skip_steps 80
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from livelyspeaker_tpu.data.ted import PROMPT, make_audio_fixed_length
from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline, RAGSampler
from livelyspeaker_tpu.utils.config import add_all_groups, apply_saved_args
from livelyspeaker_tpu.utils.visualize import render_ted_clip


def parse_args():
    p = argparse.ArgumentParser()
    add_all_groups(p, training=False)
    g = p.add_argument_group("generate")
    g.add_argument("--audio", type=str, default="",
                   help="16 kHz waveform .npy (random if omitted)")
    g.add_argument("--text", type=str, default="")
    g.add_argument("--speaker", type=int, default=0)
    g.add_argument("--emotion", type=int, default=0,
                   help="emotion id for BEAT emotion-conditioned models "
                        "(--num_emotions > 0); ignored for TED")
    g.add_argument("--out", type=str, default="/tmp/generated_clip")
    g.add_argument("--render", action="store_true", default=True)
    g.add_argument("--long", action="store_true",
                   help="long-form: stitch windows over the FULL audio via "
                        "seed-frame conditioning (pipeline.generate_long_form)")
    return apply_saved_args(p.parse_args(), p)


def main():
    args = parse_args()
    from eval_rag_ted import load_rag_params

    cfg = RAGConfig(
        njoints=args.njoints, nfeats=args.nfeats, nframes=args.n_poses,
        latent_dim=args.latent_dim, num_layers=args.layers,
        mlpact=args.mlpact, n_speakers=args.n_speakers,
        num_emotions=args.num_emotions, cond_mask_prob=args.cond_mask_prob,
    )
    model = RAG(cfg)
    params = load_rag_params(args.model_path, args)

    n_samples = audio_samples_for_frames(args.n_poses)
    if args.audio:
        full_wav = np.load(args.audio).astype(np.float32).reshape(-1)
    else:
        print("no --audio given; using noise")
        full_wav = (
            np.random.default_rng(0).normal(size=n_samples) * 0.1
        ).astype(np.float32)
    wav = make_audio_fixed_length(full_wav, n_samples)

    cond = {
        "audio": jnp.asarray(wav)[None],
        "vid": jnp.asarray([args.speaker]),
        "origin_x": jnp.zeros((1, cfg.njoints, cfg.nfeats, cfg.nframes)),
    }
    if cfg.num_emotions:
        cond["emo"] = jnp.asarray([args.emotion])

    if args.sag_path:
        from eval_livelyspeaker_ted import load_sag_params
        from livelyspeaker_tpu.data.clip_tokenizer import (
            CLIPTokenizer,
            HashTokenizer,
        )
        from livelyspeaker_tpu.models.clip_text import (
            CLIPTextEncoder,
            clip_text_params_from_torch,
        )
        from livelyspeaker_tpu.models.sag import SAG

        sag = SAG(njoints=cfg.njoints, nfeats=cfg.nfeats,
                  latent_dim=512)  # = CLIP text dim
        sag_params = load_sag_params(args.sag_path)
        clip_model = CLIPTextEncoder()
        if args.clip_path:
            import torch

            sd = torch.load(args.clip_path, map_location="cpu",
                            weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            clip_params = clip_text_params_from_torch(sd)
        else:
            clip_params = clip_model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32)
            )["params"]
        tok = CLIPTokenizer(args.bpe_path) if args.bpe_path else HashTokenizer()
        pipe = LivelySpeakerPipeline(
            model, params, sag, sag_params, clip_model, clip_params, tok,
            steps=args.diffusion_steps,
            timestep_respacing=args.timestep_respacing or "ddim100",
            skip_timesteps=args.skip_steps or 80,
            guidance_schedule=args.guidance_schedule,
            use_fused=args.fused,
        )
        sentence = PROMPT + '"' + (args.text or "hello world") + '"'
        if args.long:
            from livelyspeaker_tpu.pipeline import generate_long_form

            long_motion = generate_long_form(
                pipe.rag_sampler, full_wav, args.speaker,
                jax.random.PRNGKey(0), guidance=args.guidance_param,
                emotion=args.emotion, pipeline=pipe, sentences=[sentence],
            )
            sample = long_motion[None]
        else:
            sample = pipe([sentence], cond, jax.random.PRNGKey(0),
                          guidance=args.guidance_param)
    else:
        sampler = RAGSampler(
            model, params,
            steps=args.diffusion_steps,
            timestep_respacing=args.timestep_respacing or "ddim100",
            use_fused=args.fused,
            guidance_schedule=args.guidance_schedule,
        )
        if args.long:
            from livelyspeaker_tpu.pipeline import generate_long_form

            sample = generate_long_form(
                sampler, full_wav, args.speaker, jax.random.PRNGKey(0),
                guidance=args.guidance_param, emotion=args.emotion,
            )[None]
        else:
            sample = sampler(cond, jax.random.PRNGKey(0),
                             guidance=args.guidance_param)

    n_frames_out = np.asarray(sample).shape[-1]
    motion = np.asarray(sample)[0].reshape(-1, n_frames_out).T  # [T, J*F]
    out_wav = full_wav if args.long else wav
    np.savez(args.out + ".npz", motion=motion, audio=out_wav)
    print(f"wrote {args.out}.npz  motion shape {motion.shape}")
    if args.render and cfg.njoints == 9:
        path = render_ted_clip(motion, args.out + ".mp4", title=args.text,
                               audio=out_wav)
        print(f"rendered {path}")


if __name__ == "__main__":
    main()
