#!/usr/bin/env python
"""Does --ema_warmup fix the EMA-horizon pitfall? Measured, not assumed.

DESIGN.md §13 finding: with plain EMA at the guided-diffusion default rate
0.9999, a short run's shadow params are mostly the random init (weight
r^N — 0.9999^800 = 0.92), so the EMA checkpoint is useless (FGD ~16 on the
3k-step soak). The warmed-up decay min(rate, (1+t)/(10+t)) is supposed to
remove exactly that init weight.

This script trains the flagship TED config twice from the same seed on the
synthetic records at ema_rate 0.9999 — once plain, once with --ema_warmup —
then evaluates FGD from the raw AND the EMA params of both runs against one
frozen fixture embedder. The fix is real iff:
  plain:  fgd_ema >> fgd_raw   (the pitfall reproduces)
  warmup: fgd_ema ~= fgd_raw   (the shadow tracks the trained model)
while fgd_raw matches across runs (warmup must not perturb training; EMA is
a pure observer of the param trajectory).

Prints one JSON line with all four FGDs.

Usage:
    python scripts/measure_ema_warmup.py [--epochs 400] [--out /tmp/emaw]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def train(save_dir, data_dir, a, warmup: bool) -> None:
    cmd = [
        sys.executable, "scripts/train_rag.py",
        "--dataset", "ted", "--data_dir", data_dir,
        "--latent_dim", str(a.latent_dim), "--layers", str(a.layers),
        "--batch_size", str(a.batch_size), "--epochs", str(a.epochs),
        "--save_dir", save_dir, "--save_interval", "100000",
        "--log_interval", str(a.log_interval),
        "--ema_rate", str(a.ema_rate),
        "--device_resident", "1",
        "--seed", "233",
    ]
    if a.fused_train:
        cmd.append("--fused_train")
    if warmup:
        cmd.append("--ema_warmup")
    print("+", " ".join(cmd), file=sys.stderr, flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-1500:])
    print(f"  -> rc={proc.returncode} in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--n_clips", type=int, default=40)
    p.add_argument("--ema_rate", type=float, default=0.9999,
                   help="the reference/guided-diffusion default — exactly "
                        "the rate the pitfall bites at on short runs")
    p.add_argument("--fused_train", action="store_true", default=True)
    p.add_argument("--no_fused_train", dest="fused_train",
                   action="store_false")
    p.add_argument("--out", type=str, default="/tmp/ema_warmup_study")
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    data_dir = os.path.join(a.out, "records")
    if not os.path.exists(os.path.join(data_dir, "meta.json")):
        from livelyspeaker_tpu.data.synthetic import (
            build_synthetic_ted_records,
        )
        from livelyspeaker_tpu.data.ted import TedConfig

        print(f"building {a.n_clips}-clip synthetic records...",
              file=sys.stderr)
        build_synthetic_ted_records(
            data_dir, n_clips=a.n_clips, clip_seconds=20,
            cfg=TedConfig(audio_dtype="int16"),
        )

    plain_dir, warm_dir = f"{a.out}/plain", f"{a.out}/warmup"
    train(plain_dir, data_dir, a, warmup=False)
    train(warm_dir, data_dir, a, warmup=True)

    from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()

    import jax
    import jax.numpy as jnp

    from eval_common import final_npz, fixture_fgd
    from livelyspeaker_tpu.data import TedWindowDataset
    from livelyspeaker_tpu.eval import EmbeddingSpaceEvaluator
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.models.embedding_net import TedEmbeddingEncoder

    dataset = TedWindowDataset(data_dir)
    model = RAG(RAGConfig.ted(latent_dim=a.latent_dim, num_layers=a.layers))
    enc = TedEmbeddingEncoder()
    fixture = EmbeddingSpaceEvaluator(
        enc.init(jax.random.PRNGKey(11), jnp.zeros((1, 34, 27)))["params"]
    )

    out = {"epochs": a.epochs, "ema_rate": a.ema_rate}
    for name, d in (("plain", plain_dir), ("warmup", warm_dir)):
        out[f"fgd_raw_{name}"] = fixture_fgd(
            model, dataset, final_npz(d), fixture
        )
        out[f"fgd_ema_{name}"] = fixture_fgd(
            model, dataset, final_npz(d, prefix="model_ema"), fixture
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
