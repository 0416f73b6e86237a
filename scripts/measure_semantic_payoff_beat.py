#!/usr/bin/env python
"""BEAT twin of the semantic-payoff study, scored with SRGR.

The reference composes SAG->RAG on BEAT exactly as on TED
(test_LivelySpeaker_beat.py:119-130) and, unlike TED, ships a
purpose-built *semantic* metric: SRGR — per-frame gesture recall weighted
by the per-frame semantic relevance track
(scripts_beat/utils/metric.py:27-51).  This study measures whether the
composition carries the text-borne archetype through refinement on a BEAT
fixture where text is the ONLY mode-identifying signal
(data/synthetic.py: build_semantic_beat_records — audio, speaker, emotion
and the seed frames are mode-blind by construction; the per-frame `sem`
track marks exactly the archetype frames, so SRGR weighs exactly the
semantically relevant part of the clip, its design intent).

Protocol (all on device, mirrors scripts/measure_semantic_payoff.py):
  1. train a flagship BEAT RAG (latent 512 / 8 blocks, rot6d 47x6,
     emotion-conditioned, kld 0) on the fixture;
  2. train a flagship SAG against a frozen random CLIP-layout text tower;
  3. on a fresh-seed test split generate with (a) RAG-only ddim100 and
     (b) SAG sketch + skip=80 refinement, guidance 1.0/1.5 (the
     reference's sweep, test_LivelySpeaker_beat.py:234-237), plus
     optional --schedule_sweep guidance schedules;
  4. score: SRGR (threshold 4.0, 47 joints, euler degrees — the
     BaseTrainer protocol, scripts_beat/train.py:65), archetype mode
     RECALL (nearest-centroid on rot6d frames >= BEAT_SEM_ONSET),
     marginal FID and per-mode conditional FID with a frozen
     BeatEmbeddingEncoder.

Results: BASELINE.md (round 5).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", type=int, default=4)
    p.add_argument("--train_clips", type=int, default=64)
    p.add_argument("--test_clips", type=int, default=64)
    p.add_argument("--rag_steps", type=int, default=12000,
                   help="past the x_t phase transition (see the TED study)")
    p.add_argument("--sag_steps", type=int, default=2000)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--clip_layers", type=int, default=4)
    p.add_argument("--sag_latent", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--sag_lr", type=float, default=3e-4)
    p.add_argument("--respacing", type=str, default="ddim100")
    p.add_argument("--skip", type=int, default=80)
    p.add_argument("--samples_per_window", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--audio_pool", type=int, default=8)
    p.add_argument("--artifacts", type=str, default="",
                   help="cache trained RAG/SAG params between runs")
    p.add_argument("--schedule_sweep", type=str, nargs="*", default=[],
                   help="guidance schedules to score the full path with")
    args = p.parse_args()

    import optax

    from livelyspeaker_tpu.data import DataLoader
    from livelyspeaker_tpu.data.beat import (
        BeatWindowDataset,
        rot6d_to_euler_deg,
    )
    from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
    from livelyspeaker_tpu.data.loader import DeviceDataLoader
    from livelyspeaker_tpu.data.synthetic import (
        BEAT_SEM_ONSET,
        build_semantic_beat_records,
        semantic_mode_of_sentence_prefix,
    )
    from livelyspeaker_tpu.eval import SRGR
    from livelyspeaker_tpu.eval.fgd import frechet_from_samples
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from livelyspeaker_tpu.models.embedding_net import BeatEmbeddingEncoder
    from livelyspeaker_tpu.models.sag import SAG, sag_losses
    from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline, RAGSampler
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from livelyspeaker_tpu.training.checkpoints import (
        load_params_npz,
        save_params_npz,
    )

    K = args.modes
    J, F, T = 47, 6, 34

    def fixture(tag, n_clips, seed):
        d = os.path.join(
            tempfile.gettempdir(),
            f"ls_sembeat_{tag}_k{K}_n{n_clips}_s{seed}_p{args.audio_pool}",
        )
        if not os.path.exists(os.path.join(d, "meta.json")):
            build_semantic_beat_records(
                d, n_clips=n_clips, modes=K, seed=seed,
                audio_pool=args.audio_pool,
            )
        return BeatWindowDataset(d)

    train_ds = fixture("train", args.train_clips, 233)
    test_ds = fixture("test", args.test_clips, 777)
    print(
        f"fixture: train={len(train_ds)} test={len(test_ds)} windows, K={K}",
        file=sys.stderr,
    )

    def cached(name, train_fn):
        if args.artifacts:
            path = os.path.join(args.artifacts, f"{name}.npz")
            if os.path.exists(path):
                print(f"loading cached {name} from {path}", file=sys.stderr)
                return load_params_npz(path)
            params = train_fn()
            os.makedirs(args.artifacts, exist_ok=True)
            save_params_npz(path, params)
            return params
        return train_fn()

    # ---- 1. train RAG (emotion-conditioned, kld 0 — the BEAT TrainLoop
    # contract, scripts_beat/train_RAG.py) --------------------------------
    cfg = RAGConfig.beat(
        latent_dim=args.latent_dim, num_layers=args.layers, n_speakers=30
    )
    model = RAG(cfg)
    first = train_ds.batch([0], fields=("motion", "audio", "vid", "emo"))
    from livelyspeaker_tpu.diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create(steps=1000, schedule="cosine")

    def train_rag():
        loader = DeviceDataLoader(
            train_ds,
            batch_size=min(args.batch_size, len(train_ds)),
            shuffle=True,
            seed=233,
            fields=("motion", "audio", "vid", "emo"),
        )
        params = model.init(
            {"params": jax.random.PRNGKey(10),
             "style": jax.random.PRNGKey(11),
             "cond_mask": jax.random.PRNGKey(12)},
            jnp.asarray(first["motion"]),
            jnp.zeros((1,), jnp.int32),
            {"audio": jnp.asarray(first["audio"]),
             "vid": jnp.asarray(first["vid"]),
             "emo": jnp.asarray(first["emo"]),
             "origin_x": jnp.asarray(first["motion"])},
            train=True,
        )["params"]
        tcfg = TrainConfig(lr=args.lr, kld_weight=0.0)
        tx = make_optimizer(tcfg)
        state = init_train_state(params, tx, cfg=tcfg, num_timesteps=1000)
        step = jax.jit(
            make_train_step(model, sched, tx, tcfg), donate_argnums=0
        )
        key, done, t0 = jax.random.PRNGKey(0), 0, time.time()
        m = None
        while done < args.rag_steps:
            for batch in loader:
                if done >= args.rag_steps:
                    break
                state, m = step(state, batch, jax.random.fold_in(key, done))
                done += 1
        jax.block_until_ready(m["loss"])
        print(
            f"RAG trained: {done} steps loss={float(m['loss']):.4f} "
            f"({time.time() - t0:.0f}s)",
            file=sys.stderr,
        )
        return state.params

    rag_params = cached("rag", train_rag)

    # ---- 2. frozen text tower + SAG -------------------------------------
    tokenizer = HashTokenizer()
    clip_model = CLIPTextEncoder(
        CLIPTextConfig(layers=args.clip_layers, embed_dim=args.sag_latent)
    )
    clip_params = clip_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    encode_text = jax.jit(
        lambda toks: clip_model.apply({"params": clip_params}, toks)
    )

    sag = SAG(njoints=J, nfeats=F, latent_dim=args.sag_latent)

    def train_sag():
        sag_params = sag.init(
            jax.random.PRNGKey(20), jnp.asarray(first["motion"])
        )["params"]
        stx = optax.adam(args.sag_lr)
        sopt = stx.init(sag_params)

        @jax.jit
        def sag_step(sp, so, motion, text_feats, rng):
            def loss_fn(pp):
                out = sag.apply(
                    {"params": pp}, motion, deterministic=False,
                    rngs={"dropout": rng},
                )
                losses = sag_losses(
                    motion, out["output"], out["z"], text_feats, lam_cos=1.0
                )
                return losses["sum"], losses

            (loss, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(sp)
            updates, so2 = stx.update(grads, so, sp)
            return optax.apply_updates(sp, updates), so2, losses

        sag_loader = DataLoader(
            train_ds,
            batch_size=min(args.batch_size, len(train_ds)),
            shuffle=True,
            seed=34,
            fields=("motion", "sentence"),
        )
        done, t0 = 0, time.time()
        sl = None
        while done < args.sag_steps:
            for batch in sag_loader:
                if done >= args.sag_steps:
                    break
                toks = jnp.asarray(tokenizer(list(batch["sentence"])))
                tf = encode_text(toks)
                sag_params, sopt, sl = sag_step(
                    sag_params, sopt, jnp.asarray(batch["motion"]), tf,
                    jax.random.fold_in(jax.random.PRNGKey(3), done),
                )
                done += 1
        jax.block_until_ready(sl["sum"])
        print(
            f"SAG trained: {done} steps loss={float(sl['sum']):.4f} "
            f"(cos={float(sl['clip_loss']):.4f}, {time.time() - t0:.0f}s)",
            file=sys.stderr,
        )
        return sag_params

    sag_params = cached("sag", train_sag)

    # ---- 3. centroid classifier from TRAIN windows ----------------------
    train_all = train_ds.batch(
        list(range(len(train_ds))), fields=("motion", "sentence")
    )
    train_modes = np.asarray(
        [semantic_mode_of_sentence_prefix(s, K)
         for s in train_all["sentence"]]
    )
    feats = np.asarray(train_all["motion"])[:, :, :, BEAT_SEM_ONSET:].reshape(
        len(train_modes), -1
    )
    centroids = np.stack(
        [feats[train_modes == k].mean(axis=0) for k in range(K)]
    )

    def classify(motions):  # [B, J, F, T] -> [B] mode ids
        f = np.asarray(motions)[:, :, :, BEAT_SEM_ONSET:].reshape(
            motions.shape[0], -1
        )
        d = ((f[:, None] - centroids[None]) ** 2).sum(-1)
        return d.argmin(axis=1)

    test_all = test_ds.batch(
        list(range(len(test_ds))),
        fields=("motion", "audio", "vid", "emo", "sem", "sentence"),
    )
    test_modes = np.asarray(
        [semantic_mode_of_sentence_prefix(s, K)
         for s in test_all["sentence"]]
    )
    real_acc = float((classify(test_all["motion"]) == test_modes).mean())
    print(f"classifier on real test windows: {real_acc:.3f}", file=sys.stderr)

    # ---- 4. generate + score ---------------------------------------------
    # Frozen random BeatEmbeddingEncoder: Frechet DELTAS between runs only
    # need a fixed embedding map, not trained weights (same rationale as
    # measure_fid_parity_beat.make_embedder_ckpt).
    enc = BeatEmbeddingEncoder(n_frames=T)
    enc_params = enc.init(
        jax.random.PRNGKey(11), jnp.zeros((1, T, J * F))
    )["params"]
    embed = jax.jit(lambda m: enc.apply({"params": enc_params}, m))

    def to_eval(m):  # [B, J, F, T] -> [B, T, 282]
        return np.asarray(
            embed(jnp.asarray(m).transpose(0, 3, 1, 2).reshape(-1, T, J * F))
        )

    def to_euler(m):  # [B, J, F, T] -> [B, T, 141] euler degrees
        return rot6d_to_euler_deg(
            np.asarray(m).transpose(0, 3, 1, 2).reshape(-1, T, J, F)
        ).reshape(m.shape[0], T, -1)

    real_emb = to_eval(np.asarray(test_all["motion"]))
    tar_euler = to_euler(np.asarray(test_all["motion"]))

    rag_sampler = RAGSampler(
        model, rag_params, steps=1000, timestep_respacing=args.respacing,
        method="ddim",
    )
    pipes = {
        None: LivelySpeakerPipeline(
            model, rag_params, sag, sag_params, clip_model, clip_params,
            tokenizer, steps=1000, timestep_respacing=args.respacing,
            skip_timesteps=args.skip, method="ddim",
        )
    }
    cond = {
        "audio": jnp.asarray(test_all["audio"]),
        "vid": jnp.asarray(test_all["vid"]),
        "emo": jnp.asarray(test_all["emo"]),
        "origin_x": jnp.asarray(test_all["motion"]),
    }
    sentences = list(test_all["sentence"])

    sketch = pipes[None].semantic_sketch(sentences, cond["origin_x"])
    sketch_recall = float(
        (classify(np.asarray(sketch)) == test_modes).mean()
    )
    print(f"sketch recall: {sketch_recall:.3f}", file=sys.stderr)

    # x_t-sensitivity probe at the skip boundary (shared helper — see
    # eval_common.xt_boundary_probe for the mechanism it decides)
    from eval_common import xt_boundary_probe

    t_boundary, x0_hat = xt_boundary_probe(
        pipes[None].rag_sampler.sched, sched, model, rag_params,
        test_all["motion"], cond, args.skip,
    )
    probe_recall = float((classify(x0_hat) == test_modes).mean())
    print(
        f"x0-hat recall at t={t_boundary} (x_t from REAL motion): "
        f"{probe_recall:.3f}",
        file=sys.stderr,
    )

    def run(path, guidance, schedule=None):
        if schedule is not None and schedule not in pipes:
            pipes[schedule] = LivelySpeakerPipeline(
                model, rag_params, sag, sag_params, clip_model, clip_params,
                tokenizer, steps=1000, timestep_respacing=args.respacing,
                skip_timesteps=args.skip, method="ddim",
                guidance_schedule=schedule,
            )
        pipe = pipes[schedule]
        gens = []
        for s in range(args.samples_per_window):
            rng = jax.random.fold_in(jax.random.PRNGKey(99), s)
            if path == "full":
                g = pipe(sentences, cond, rng, guidance=guidance)
            else:
                g = rag_sampler(cond, rng, guidance=guidance)
            gens.append(np.asarray(g))
        gen = np.concatenate(gens)  # [S*B, J, F, T]
        S = args.samples_per_window
        modes_rep = np.tile(test_modes, S)
        recall = float((classify(gen) == modes_rep).mean())
        # SRGR: the BaseTrainer protocol — euler degrees, threshold 4.0,
        # weighted by the per-frame semantic track (metric.py:27-51)
        srgr = SRGR(threshold=4.0, joints=J)
        gen_euler = to_euler(gen)
        sem_rep = np.tile(np.asarray(test_all["sem"]), (S, 1))
        srgr.run(
            gen_euler, np.tile(tar_euler, (S, 1, 1)), sem_rep
        )
        gen_emb = to_eval(gen)
        real_rep = np.tile(real_emb, (S, 1))
        fid = float(frechet_from_samples(gen_emb, real_rep))
        cond_fids = [
            float(
                frechet_from_samples(
                    gen_emb[modes_rep == k], real_emb[test_modes == k]
                )
            )
            for k in range(K)
        ]
        row = {
            "path": path,
            "guidance": guidance,
            "mode_recall": round(recall, 4),
            "srgr": round(srgr.avg(), 4),
            "fid": round(fid, 6),
            "cond_fid_mean": round(float(np.mean(cond_fids)), 6),
        }
        if schedule is not None:
            row["guidance_schedule"] = schedule
        if path == "full":
            row["skip"] = args.skip
        return row

    # SRGR of the raw target vs itself is 1/0.165 * mean(sem); report the
    # real-data ceiling (gen == target) for scale
    ceil = SRGR(threshold=4.0, joints=J)
    ceil.run(tar_euler, tar_euler, np.asarray(test_all["sem"]))
    header = {
        "modes": K,
        "classifier_acc_on_real": round(real_acc, 4),
        "sketch_recall": round(sketch_recall, 4),
        "x0hat_recall_at_boundary": round(probe_recall, 4),
        "chance_recall": round(1.0 / K, 4),
        "srgr_ceiling": round(ceil.avg(), 4),
        "n_test_windows": len(test_ds),
        "samples_per_window": args.samples_per_window,
    }
    print(json.dumps(header))
    for guidance in (1.0, 1.5):
        for path in ("rag", "full"):
            print(json.dumps(run(path, guidance)))
    for schedule in args.schedule_sweep:
        for guidance in (1.0, 1.5):
            print(json.dumps(run("full", guidance, schedule=schedule)))


if __name__ == "__main__":
    main()
