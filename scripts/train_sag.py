#!/usr/bin/env python
"""Train the SAG (MotionCLIP) semantic generator
(reference: tmp/train_SAG.py + tmp/SAG_trainer.py:26-235).

Loss per batch (motionclip.py:23-64): recon MSE + velocity MSE +
lam_cos * (1 - cos(motion_z, clip_text_z)), with the CLIP text encoder
frozen.  Without --clip_path the text tower is randomly initialised and
frozen (useful for smoke runs; semantics obviously untrained).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
from livelyspeaker_tpu.data.clip_tokenizer import CLIPTokenizer, HashTokenizer
from livelyspeaker_tpu.models.clip_text import (
    CLIPTextEncoder,
    clip_text_params_from_torch,
)
from livelyspeaker_tpu.models.sag import SAG, sag_losses
from livelyspeaker_tpu.training.checkpoints import save_args, save_params_npz
from livelyspeaker_tpu.training.logging import KVLogger
from livelyspeaker_tpu.utils.config import add_all_groups


def parse_args():
    import argparse

    p = argparse.ArgumentParser()
    add_all_groups(p, training=True)
    g = p.add_argument_group("sag")
    g.add_argument("--lam_cos_loss", type=float, default=1.0)
    g.add_argument("--clip_path", type=str, default="")
    g.add_argument("--bpe_path", type=str, default="")
    g.add_argument("--clip_layers", type=int, default=12,
                   help="text-tower depth; lower for smoke runs")
    g.add_argument("--eval_model_path", type=str, default="",
                   help="frozen gesture-autoencoder ckpt for the FGD hook "
                        "(random evaluator if absent)")
    g.add_argument("--eval_interval", type=int, default=100,
                   help="epochs between in-training FGD evaluations with "
                        "the frozen evaluator (SAG_trainer.py:153-163,"
                        "218-235); 0 disables")
    args = p.parse_args()
    if args.ema_rate or args.ema_warmup:
        p.error("--ema_rate/--ema_warmup apply to the RAG trainer only; "
                "this loop keeps no EMA shadow")
    if args.pipeline_parallel:
        p.error("--pipeline_parallel applies to the RAG trainer only")
    return args


def main():
    args = parse_args()
    if args.dataset == "synthetic":
        from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_synth")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            build_synthetic_ted_records(data_dir, n_clips=8, clip_seconds=20)
        args.data_dir = data_dir

    dataset = TedWindowDataset(args.data_dir)
    loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, max(len(dataset) // 2, 1)),
        shuffle=True,
        seed=args.seed,
    )

    tokenizer = (
        CLIPTokenizer(args.bpe_path) if args.bpe_path else HashTokenizer()
    )
    from livelyspeaker_tpu.models.clip_text import CLIPTextConfig

    # With real OpenAI weights the text embed dim is fixed at 512 (== the
    # reference SAG latent); a random smoke tower follows --latent_dim so
    # the cos loss is well-shaped at any size.
    clip_model = CLIPTextEncoder(CLIPTextConfig(
        layers=args.clip_layers,
        embed_dim=512 if args.clip_path else args.latent_dim,
    ))
    if args.clip_path:
        import torch

        sd = torch.load(args.clip_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        clip_params = clip_text_params_from_torch(sd)
        print(f"loaded CLIP text tower from {args.clip_path}")
    else:
        clip_params = clip_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
        )["params"]
        print("WARNING: random frozen CLIP text tower (no --clip_path)")
    encode_text = jax.jit(
        lambda toks: clip_model.apply({"params": clip_params}, toks)
    )

    model = SAG(
        njoints=args.njoints,
        nfeats=args.nfeats,
        latent_dim=args.latent_dim,
        n_pre_poses=args.n_pre_poses,
    )
    x0 = jnp.zeros((2, args.njoints, args.nfeats, args.n_poses))
    params = model.init(jax.random.PRNGKey(args.seed), x0)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Total params: {n_params / 1e6:.2f}M")

    tx = optax.adam(args.lr)  # SAG_trainer.py uses Adam (:28-35)
    opt_state = tx.init(params)
    logger = KVLogger(args.save_dir)
    os.makedirs(args.save_dir, exist_ok=True)
    save_args(args.save_dir, vars(args))

    @jax.jit
    def train_step(params, opt_state, motion, text_feats, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, motion, deterministic=False,
                rngs={"dropout": rng},
            )
            losses = sag_losses(
                motion, out["output"], out["z"], text_feats,
                lam_cos=args.lam_cos_loss,
            )
            return losses["sum"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, losses

    # In-training FGD tracking (SAG_trainer.py:153-163,218-235): every
    # --eval_interval epochs autoencode an eval pass, embed decoded vs real
    # clips with the frozen evaluator, log the FGD, and keep the best
    # checkpoint as sag_best.npz.
    evaluator = None
    if args.eval_interval:
        from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator
        from livelyspeaker_tpu.models.embedding_net import TedEmbeddingEncoder

        if args.eval_model_path and os.path.exists(args.eval_model_path):
            evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(
                args.eval_model_path
            )
        else:
            pose_dim = args.njoints * args.nfeats
            enc = TedEmbeddingEncoder(pose_dim=pose_dim,
                                      n_frames=args.n_poses)
            evaluator = EmbeddingSpaceEvaluator(
                enc.init(
                    jax.random.PRNGKey(1),
                    jnp.zeros((1, args.n_poses, pose_dim)),
                )["params"],
                pose_dim=pose_dim,
                n_frames=args.n_poses,
            )
            print("WARNING: random frozen FGD evaluator "
                  "(no --eval_model_path)")

    eval_loader = DataLoader(
        dataset,
        batch_size=min(args.batch_size, max(len(dataset) // 2, 1)),
        shuffle=False,
        seed=args.seed,
    )
    autoencode = jax.jit(
        lambda p, m: model.apply({"params": p}, m)["output"]
    )

    def eval_fgd(p) -> float:
        evaluator.reset()
        for batch in eval_loader:
            real = np.asarray(batch["motion"])  # [B, J, F, T]
            gen = np.asarray(autoencode(p, jnp.asarray(real)))
            to_eval = lambda m: m.transpose(0, 3, 1, 2).reshape(
                m.shape[0], args.n_poses, -1
            )
            evaluator.push_samples(to_eval(gen), to_eval(real))
        fgd, _ = evaluator.get_scores()
        return float(fgd)

    rng = jax.random.PRNGKey(args.seed)
    step = 0
    best_fgd = float("inf")
    for epoch in range(args.epochs):
        for batch in loader:
            toks = jnp.asarray(tokenizer(batch["sentence"]))
            text_feats = encode_text(toks)
            rng, srng = jax.random.split(rng)
            params, opt_state, losses = train_step(
                params, opt_state, jnp.asarray(batch["motion"]), text_feats, srng
            )
            if step % args.log_interval == 0:
                for k, v in losses.items():
                    logger.logkv_mean(k, float(v))
                logger.logkv("step", step)
                logger.dumpkvs()
            step += 1
        if evaluator is not None and (
            epoch % args.eval_interval == 0 or epoch == args.epochs - 1
        ):
            fgd = eval_fgd(params)
            logger.logkv("eval_fgd", fgd)
            logger.logkv("step", step)
            logger.dumpkvs()
            if fgd < best_fgd:
                best_fgd = fgd
                save_params_npz(
                    os.path.join(args.save_dir, "sag_best.npz"), params
                )
                print(f"epoch {epoch}: new best FGD {fgd:.6g} -> sag_best.npz")
        if epoch % args.save_interval == 0 or epoch == args.epochs - 1:
            save_params_npz(
                os.path.join(args.save_dir, f"sag{step:09d}.npz"), params
            )
    print(f"done at step {step}; best FGD "
          f"{best_fgd if best_fgd < float('inf') else 'n/a'}")


if __name__ == "__main__":
    main()
