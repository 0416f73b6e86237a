#!/usr/bin/env python
"""The semantic-payoff study: does the SAG->RAG composition actually help?

The reference's defining claim is that the SAG text sketch + skip=80 RAG
refinement IMPROVES on RAG alone (test_LivelySpeaker_ted.py:102-113,212-221
sweeps exactly this).  Every earlier round proved the composition
*mechanically* (clip parity, plumbing); this script measures its *semantic
value* on a fixture where text is the ONLY mode-identifying signal
(data/synthetic.py: build_semantic_ted_records — seed frames and audio are
mode-blind by construction, the sentence template names the archetype).

Protocol (all on device):
  1. train a flagship RAG (latent 512 / 8 blocks) on the semantic fixture;
  2. train a flagship SAG (512-d MotionCLIP) against a FROZEN random CLIP
     text tower (distinct sentences -> distinct frozen embeddings; the real
     released weights are unavailable in-env — the mechanism is identical);
  3. on a fresh-seed test split, generate with (a) RAG-only ddim100 and
     (b) SAG sketch + skip=80 refinement, guidance 1.0 / 1.5 each
     (the reference's exact sweep);
  4. score: mode RECALL (nearest-centroid archetype classifier built from
     TRAIN windows, frames >= 12 where the mode signature lives), marginal
     FGD, and conditional FGD (per-mode Frechet, averaged) with the frozen
     embedding-space evaluator.

RAG-only cannot know the mode (recall ~ 1/K by construction); if the
composition carries the text signal through refinement, full-pipeline
recall and conditional FGD must beat it.  Results: BASELINE.md.
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

from measure_fgd_parity import make_embedder_ckpt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", type=int, default=4)
    p.add_argument("--train_clips", type=int, default=64)
    p.add_argument("--test_clips", type=int, default=64)
    p.add_argument("--rag_steps", type=int, default=12000,
                   help="must be past the x_t phase transition (~7k steps "
                        "at these dims/lr: the denoiser first memorises "
                        "x0~f(cond), then abruptly learns to read x_t — "
                        "probe recall at t=199 jumps 0.27->1.0 between 6.5k "
                        "and 7.5k steps, measured 2026-08-19; at 1500 steps "
                        "the composition shows NO payoff because refinement "
                        "ignores the sketch)")
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
    p.add_argument("--audio_pool", type=int, default=8,
                   help="shared audio streams paired orthogonally to modes "
                        "(anti-memorisation; see synthetic_semantic_clips)")
    p.add_argument("--artifacts", type=str, default="",
                   help="directory to cache trained RAG/SAG params; reuse "
                        "on re-runs (skip sweeps without retraining)")
    p.add_argument("--skip_sweep", type=int, nargs="*", default=[],
                   help="additional skip_timesteps values to score the "
                        "full path at (diagnoses how much refinement "
                        "erodes the sketch's semantic signal)")
    p.add_argument("--schedule_sweep", type=str, nargs="*", default=[],
                   help="guidance schedules (e.g. linear cosine step:100) to "
                        "score the full path at guidance 1.0/1.5 — tests "
                        "whether per-step CFG decay rescues the semantic "
                        "payoff that constant guidance 1.5 erases "
                        "(DESIGN §18 finding 2)")
    p.add_argument("--trajectory", action="store_true",
                   help="per-step erosion curve: classify the denoiser's "
                        "pred_xstart at every refinement step of the "
                        "skip=SKIP full path (return_trajectory of "
                        "sampling.sample_loop) — localises WHERE in the "
                        "20-step chain the sketch signal decays")
    args = p.parse_args()

    import optax

    from livelyspeaker_tpu.data import DataLoader, TedWindowDataset
    from livelyspeaker_tpu.data.loader import DeviceDataLoader
    from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
    from livelyspeaker_tpu.data.synthetic import (
        build_semantic_ted_records,
        semantic_mode_of_sentence,
    )
    from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator
    from livelyspeaker_tpu.eval.fgd import frechet_from_samples
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from livelyspeaker_tpu.models.sag import SAG, sag_losses
    from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline, RAGSampler
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    K = args.modes

    def fixture(tag, n_clips, seed):
        d = os.path.join(
            tempfile.gettempdir(),
            f"ls_sem2_{tag}_k{K}_n{n_clips}_s{seed}_p{args.audio_pool}",
        )
        if not os.path.exists(os.path.join(d, "meta.json")):
            build_semantic_ted_records(
                d, n_clips=n_clips, modes=K, seed=seed,
                audio_pool=args.audio_pool,
            )
        return TedWindowDataset(d)

    train_ds = fixture("train", args.train_clips, 233)
    test_ds = fixture("test", args.test_clips, 777)
    print(
        f"fixture: train={len(train_ds)} test={len(test_ds)} windows, "
        f"K={K}",
        file=sys.stderr,
    )

    from livelyspeaker_tpu.training.checkpoints import (
        load_params_npz,
        save_params_npz,
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

    # ---- 1. train RAG -------------------------------------------------------
    cfg = RAGConfig(latent_dim=args.latent_dim, num_layers=args.layers)
    model = RAG(cfg)
    first = train_ds.batch([0], fields=("motion", "audio", "vid"))
    from livelyspeaker_tpu.diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create(steps=1000, schedule="cosine")

    def train_rag():
        # Device-resident batching (fixture fits HBM; the streaming loader is
        # transfer-bound on remote-dispatch hosts: ~0.3 s/step vs ~0.02).
        # Built here (not at module scope) so cached --artifacts re-runs
        # don't stage the train set into HBM or init flagship params.
        loader = DeviceDataLoader(
            train_ds,
            batch_size=min(args.batch_size, len(train_ds)),
            shuffle=True,
            seed=233,
            fields=("motion", "audio", "vid"),
        )
        params = model.init(
            {"params": jax.random.PRNGKey(10), "style": jax.random.PRNGKey(11),
             "cond_mask": jax.random.PRNGKey(12)},
            jnp.asarray(first["motion"]),
            jnp.zeros((1,), jnp.int32),
            {"audio": jnp.asarray(first["audio"]),
             "vid": jnp.asarray(first["vid"]),
             "origin_x": jnp.asarray(first["motion"])},
            train=True,
        )["params"]
        tcfg = TrainConfig(lr=args.lr)
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

    # ---- 2. frozen text tower + SAG -----------------------------------------
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

    sag = SAG(latent_dim=args.sag_latent)

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

    # ---- 3. centroid classifier from TRAIN windows --------------------------
    train_all = train_ds.batch(
        list(range(len(train_ds))), fields=("motion", "sentence")
    )
    train_modes = np.asarray(
        [semantic_mode_of_sentence(s, K) for s in train_all["sentence"]]
    )
    SIG_FROM = 12  # mode signature fully in by 15fps-frame 12
    feats = np.asarray(train_all["motion"])[:, :, :, SIG_FROM:].reshape(
        len(train_modes), -1
    )
    centroids = np.stack(
        [feats[train_modes == k].mean(axis=0) for k in range(K)]
    )

    def classify(motions):  # [B, J, F, T] -> [B] mode ids
        f = np.asarray(motions)[:, :, :, SIG_FROM:].reshape(
            motions.shape[0], -1
        )
        d = ((f[:, None] - centroids[None]) ** 2).sum(-1)
        return d.argmin(axis=1)

    # sanity: the classifier must be near-perfect on real data
    test_all = test_ds.batch(
        list(range(len(test_ds))),
        fields=("motion", "audio", "vid", "sentence"),
    )
    test_modes = np.asarray(
        [semantic_mode_of_sentence(s, K) for s in test_all["sentence"]]
    )
    real_acc = float((classify(test_all["motion"]) == test_modes).mean())
    print(f"classifier on real test windows: {real_acc:.3f}", file=sys.stderr)

    # ---- 4. generate + score ------------------------------------------------
    evaluator = EmbeddingSpaceEvaluator.from_torch_checkpoint(
        make_embedder_ckpt("/tmp/fgd_embedder.bin")
    )

    def to_eval(m):
        return np.asarray(m).transpose(0, 3, 1, 2).reshape(m.shape[0], 34, -1)

    real_emb = evaluator.embed(to_eval(np.asarray(test_all["motion"])))

    rag_sampler = RAGSampler(
        model, rag_params, steps=1000, timestep_respacing=args.respacing,
        method="ddim",
    )
    pipe = LivelySpeakerPipeline(
        model, rag_params, sag, sag_params, clip_model, clip_params,
        tokenizer, steps=1000, timestep_respacing=args.respacing,
        skip_timesteps=args.skip, method="ddim",
    )
    cond = {
        "audio": jnp.asarray(test_all["audio"]),
        "vid": jnp.asarray(test_all["vid"]),
        "origin_x": jnp.asarray(test_all["motion"]),
    }
    sentences = list(test_all["sentence"])

    # the raw SAG sketch itself — did SAG learn text -> archetype at all?
    sketch = pipe.semantic_sketch(sentences, cond["origin_x"])
    sketch_recall = float((classify(np.asarray(sketch)) == test_modes).mean())
    print(f"sketch recall: {sketch_recall:.3f}", file=sys.stderr)

    # x_t-sensitivity probe at the skip boundary (shared helper — see
    # eval_common.xt_boundary_probe for the mechanism it decides)
    from eval_common import xt_boundary_probe

    t_boundary, x0_hat = xt_boundary_probe(
        pipe.rag_sampler.sched, sched, model, rag_params,
        test_all["motion"], cond, args.skip,
    )
    probe_recall = float((classify(x0_hat) == test_modes).mean())
    print(
        f"x0-hat recall at t={t_boundary} (x_t from REAL motion): "
        f"{probe_recall:.3f}",
        file=sys.stderr,
    )

    def run(path, guidance, skip=None, schedule=None, _pipes={}):
        use_pipe = pipe
        if schedule is not None:
            if schedule not in _pipes:
                _pipes[schedule] = LivelySpeakerPipeline(
                    model, rag_params, sag, sag_params, clip_model,
                    clip_params, tokenizer, steps=1000,
                    timestep_respacing=args.respacing,
                    skip_timesteps=args.skip, method="ddim",
                    guidance_schedule=schedule,
                )
            use_pipe = _pipes[schedule]
        gens = []
        for s in range(args.samples_per_window):
            rng = jax.random.fold_in(jax.random.PRNGKey(99), s)
            if path == "full":
                if skip is not None and skip != use_pipe.skip_timesteps:
                    sk = use_pipe.semantic_sketch(sentences, cond["origin_x"])
                    g = use_pipe.rag_sampler(
                        cond, rng, guidance=guidance,
                        skip_timesteps=skip, init_image=sk,
                    )
                else:
                    g = use_pipe(sentences, cond, rng, guidance=guidance)
            else:
                g = rag_sampler(cond, rng, guidance=guidance)
            gens.append(np.asarray(g))
        gen = np.concatenate(gens)  # [S*B, J, F, T]
        modes_rep = np.tile(test_modes, args.samples_per_window)
        recall = float((classify(gen) == modes_rep).mean())
        gen_emb = evaluator.embed(to_eval(gen))
        real_rep = np.tile(real_emb, (args.samples_per_window, 1))
        fgd = float(frechet_from_samples(gen_emb, real_rep))
        cond_fgds = []
        for k in range(K):
            cond_fgds.append(
                float(
                    frechet_from_samples(
                        gen_emb[modes_rep == k], real_emb[test_modes == k]
                    )
                )
            )
        row = {
            "path": path,
            "guidance": guidance,
            "mode_recall": round(recall, 4),
            "fgd": round(fgd, 6),
            "cond_fgd_mean": round(float(np.mean(cond_fgds)), 6),
            "cond_fgd_per_mode": [round(v, 6) for v in cond_fgds],
        }
        if skip is not None:
            row["skip"] = skip
        if schedule is not None:
            row["guidance_schedule"] = schedule
        return row

    header = {
        "modes": K,
        "classifier_acc_on_real": round(real_acc, 4),
        "sketch_recall": round(sketch_recall, 4),
        "x0hat_recall_at_boundary": round(probe_recall, 4),
        "chance_recall": round(1.0 / K, 4),
        "n_test_windows": len(test_ds),
        "samples_per_window": args.samples_per_window,
    }
    print(json.dumps(header))
    for guidance in (1.0, 1.5):
        for path in ("rag", "full"):
            row = run(path, guidance, skip=args.skip if path == "full"
                      else None)
            print(json.dumps(row))
    for skip in args.skip_sweep:
        print(json.dumps(run("full", 1.0, skip=skip)))
    for schedule in args.schedule_sweep:
        for guidance in (1.0, 1.5):
            print(json.dumps(
                run("full", guidance, skip=args.skip, schedule=schedule)
            ))

    if args.trajectory:
        # Per-step erosion curve: run the skip=SKIP refinement once with
        # return_trajectory='pred_xstart' and classify the denoiser's x0
        # prediction at every step.  Step 0 is the first refinement step
        # (highest t); the curve localises where the 20-step chain loses
        # the sketch's mode signal.
        from livelyspeaker_tpu.diffusion import sample_loop
        from livelyspeaker_tpu.models import make_cfg_denoiser

        spaced = pipe.rag_sampler.sched
        shape = tuple(np.asarray(sketch).shape)

        @jax.jit
        def traj_fn(rng):
            denoise = make_cfg_denoiser(model, rag_params, cond, 1.0)
            return sample_loop(
                denoise, spaced, shape, rng, method="ddim",
                skip_timesteps=args.skip, init_image=jnp.asarray(sketch),
                return_trajectory="pred_xstart",
            )[1]

        traj = np.asarray(traj_fn(jax.random.PRNGKey(99)))  # [S, B, J, F, T]
        curve = [
            round(float((classify(traj[s]) == test_modes).mean()), 4)
            for s in range(traj.shape[0])
        ]
        print(json.dumps({
            "trajectory_skip": args.skip,
            "guidance": 1.0,
            "x0hat_recall_per_step": curve,
        }))


if __name__ == "__main__":
    main()
