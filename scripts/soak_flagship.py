#!/usr/bin/env python
"""Flagship-scale training soak with mid-run kill/resume and raw-vs-EMA eval.

Exercises the whole training harness at the real config on the device —
latent 512, 8 mixer blocks, batch 512, thousands of steps — with EMA,
loss-aware timestep sampling, and quartile logging all ON (reference
TrainLoop protocol, scripts/train_utils/train_loop.py:108-225):

  1. run A ("full"): train EPOCHS epochs uninterrupted;
  2. run B ("split"): same seed, train EPOCHS//2 epochs, then a fresh
     process resumes from the checkpoint and finishes;
  3. assert the two final param sets are BIT-IDENTICAL (trajectory-exact
     resume at flagship scale: fold_in-by-step RNG + epoch-seeded loader);
  4. evaluate FGD vs a frozen fixture embedder from BOTH the raw and the
     EMA params of run A.

Prints one JSON summary line; exits nonzero on any mismatch.

Usage:
    python scripts/soak_flagship.py [--epochs 1500] [--batch_size 512] \
        [--out /tmp/soak]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, **kw):
    print("+", " ".join(args), file=sys.stderr, flush=True)
    t0 = time.time()
    proc = subprocess.run(args, cwd=ROOT, **kw)
    print(f"  -> rc={proc.returncode} in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    assert proc.returncode == 0, f"command failed: {args}"
    return proc


def train_cmd(save_dir, epochs, data_dir, a, resume=False):
    cmd = [
        sys.executable, "scripts/train_rag.py",
        "--dataset", a.dataset, "--data_dir", data_dir,
        "--latent_dim", str(a.latent_dim), "--layers", str(a.layers),
        "--batch_size", str(a.batch_size), "--epochs", str(epochs),
        "--save_dir", save_dir, "--save_interval", str(a.save_interval),
        "--log_interval", str(a.log_interval),
        "--schedule_sampler", "loss-second-moment",
        # EMA horizon must fit the run: at rate r the init keeps weight
        # r^steps (0.9999^3000 = 0.74 -> EMA still ~3/4 random init, FGD
        # ~16; 0.999^3000 = 0.05 -> EMA tracks the trained model). The
        # reference's 0.9999 presumes 100k+-step runs.
        "--ema_rate", str(a.ema_rate),
        "--device_resident", "1",
        "--seed", "233",
    ]
    if a.ema_warmup:
        cmd.append("--ema_warmup")
    if a.fused_train:
        cmd.append("--fused_train")
    if a.audio_bf16:
        cmd.append("--audio_bf16")
    if resume:
        cmd += ["--resume_checkpoint", "1"]
    return cmd


from eval_common import final_npz  # noqa: E402 (shared checkpoint glob)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--save_interval", type=int, default=100)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--n_clips", type=int, default=40)
    p.add_argument("--ema_rate", type=float, default=0.999)
    p.add_argument("--ema_warmup", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="warmed-up EMA decay (trainer.py; fixes the "
                        "EMA-horizon pitfall of DESIGN.md §13).  ON by "
                        "default since round 5: a soak whose EMA artifact "
                        "scores far off raw validates nothing — the EMA "
                        "checkpoint is what a user deploys "
                        "(--no-ema_warmup reproduces the raw-decay lag)")
    p.add_argument("--ema_fgd_factor", type=float, default=5.0,
                   help="fail the soak unless fgd_ema <= factor * "
                        "max(fgd_raw, 1e-3): the exported EMA params must "
                        "be a deployable artifact, not a lagging shadow")
    p.add_argument("--fused_train", action="store_true",
                   help="soak the production fast path: fused custom-VJP "
                        "backbone (resume bit-exactness must hold there too)")
    p.add_argument("--audio_bf16", action="store_true",
                   help="soak with the bf16 WavEncoder (DESIGN §16)")
    p.add_argument("--out", type=str, default="/tmp/soak_flagship")
    p.add_argument("--dataset", type=str, default="ted",
                   choices=["ted", "beat"],
                   help="beat soaks the scripts_beat protocol: 47x6 rot6d, "
                        "seq 36, emotion token, kld weight 0 "
                        "(scripts_beat/train_RAG.py)")
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    data_dir = os.path.join(a.out, f"records_{a.dataset}")
    if not os.path.exists(os.path.join(data_dir, "meta.json")):
        print(f"building {a.n_clips}-clip synthetic records...",
              file=sys.stderr)
        # Build in a CPU-pinned subprocess: the builders route rot6d /
        # resampling math through jax, and on remote-dispatch (tunneled)
        # backends that turns a seconds-long preprocessing job into a
        # many-minute stall of tiny device round-trips. Preprocessing is
        # host work; only the training subprocesses below need the TPU.
        if a.dataset == "beat":
            build_src = (
                "from livelyspeaker_tpu.data.synthetic import "
                "build_synthetic_beat_records as b; "
                f"b({data_dir!r}, n_clips={a.n_clips}, clip_seconds=20)"
            )
        else:
            # PCM16 records (the production storage format): half the
            # staging bytes; audio decodes on device in WavEncoder
            build_src = (
                "from livelyspeaker_tpu.data.synthetic import "
                "build_synthetic_ted_records as b; "
                "from livelyspeaker_tpu.data.ted import TedConfig; "
                f"b({data_dir!r}, n_clips={a.n_clips}, clip_seconds=20, "
                "cfg=TedConfig(audio_dtype='int16'))"
            )
        env = dict(os.environ, LS_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
        sh([sys.executable, "-c",
            "from livelyspeaker_tpu.utils.jax_setup import setup; setup(); "
            + build_src], env=env)

    t0 = time.time()
    full_dir, split_dir = f"{a.out}/full", f"{a.out}/split"
    sh(train_cmd(full_dir, a.epochs, data_dir, a))
    t_full = time.time() - t0
    sh(train_cmd(split_dir, a.epochs // 2, data_dir, a))
    sh(train_cmd(split_dir, a.epochs, data_dir, a, resume=True))

    # --- trajectory-exactness at flagship scale -------------------------
    import numpy as np

    pa = np.load(final_npz(full_dir))
    pb = np.load(final_npz(split_dir))
    assert sorted(pa.files) == sorted(pb.files)
    max_delta = 0.0
    for k in pa.files:
        d = float(np.max(np.abs(pa[k] - pb[k]))) if pa[k].size else 0.0
        max_delta = max(max_delta, d)
    bit_exact = max_delta == 0.0
    print(f"resume exactness: max|delta|={max_delta}", file=sys.stderr)

    # --- FGD from raw vs EMA params (frozen fixture embedder) -----------
    from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()

    import jax
    import jax.numpy as jnp

    from eval_common import fixture_fgd
    from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.models.embedding_net import TedEmbeddingEncoder

    if a.dataset == "beat":
        from livelyspeaker_tpu.data.beat import BeatWindowDataset

        dataset = BeatWindowDataset(data_dir)
        cfg = RAGConfig.beat(
            njoints=dataset.cfg.njoints,
            latent_dim=a.latent_dim,
            num_layers=a.layers,
        )
    else:
        from livelyspeaker_tpu.data import TedWindowDataset

        dataset = TedWindowDataset(data_dir)
        cfg = RAGConfig.ted(latent_dim=a.latent_dim, num_layers=a.layers)
    model = RAG(cfg)
    pose_dim = cfg.njoints * cfg.nfeats
    enc = TedEmbeddingEncoder(pose_dim=pose_dim)
    fixture = EmbeddingSpaceEvaluator(
        enc.init(
            jax.random.PRNGKey(11), jnp.zeros((1, cfg.nframes, pose_dim))
        )["params"],
        pose_dim=pose_dim,
    )

    fgd_raw = fixture_fgd(model, dataset, final_npz(full_dir), fixture)
    fgd_ema = fixture_fgd(
        model, dataset, final_npz(full_dir, prefix="model_ema"), fixture
    )

    print(json.dumps({
        "epochs": a.epochs,
        "batch_size": a.batch_size,
        "full_run_seconds": round(t_full, 1),
        "resume_bit_exact": bit_exact,
        "resume_max_param_delta": max_delta,
        "fgd_raw": fgd_raw,
        "fgd_ema": fgd_ema,
        "ema_warmup": a.ema_warmup,
    }))
    assert bit_exact, "flagship-scale resume is not bit-exact"
    if a.ema_warmup:
        lim = a.ema_fgd_factor * max(fgd_raw, 1e-3)
        assert fgd_ema <= lim, (
            f"EMA checkpoint unusable: fgd_ema={fgd_ema:.4g} > "
            f"{a.ema_fgd_factor} x max(fgd_raw, 1e-3) = {lim:.4g}"
        )


if __name__ == "__main__":
    main()
