#!/usr/bin/env python
"""Does bf16-WavEncoder training converge like f32? Measured, not assumed.

Trains the flagship TED config twice from the same seed on the synthetic
records — once f32 throughout, once with ``--audio_bf16`` (bf16 activations
in the HBM-bound WavEncoder conv stack only; see models/audio_encoder.py) —
then evaluates FGD for both checkpoints against one frozen fixture embedder.
The step-speed win is measured separately (scripts/bench_train.py: 21.8 ->
16.0 ms/step at batch 512 with the fused backbone); THIS script answers the
quality half: the flag is only production-recommendable if the FGD from the
bf16-trained checkpoint matches f32's.

Prints one JSON line:
    {"fgd_f32": ..., "fgd_bf16": ..., "final_loss_f32": ..., ...}

Usage:
    python scripts/measure_audio_bf16.py [--epochs 500] [--out /tmp/abf16]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def train(save_dir, data_dir, a, audio_bf16: bool, seed: int = 233) -> float:
    cmd = [
        sys.executable, "scripts/train_rag.py",
        "--dataset", "ted", "--data_dir", data_dir,
        "--latent_dim", str(a.latent_dim), "--layers", str(a.layers),
        "--batch_size", str(a.batch_size), "--epochs", str(a.epochs),
        "--save_dir", save_dir, "--save_interval", "100000",
        "--log_interval", str(a.log_interval),
        "--device_resident", "1",
        "--seed", str(seed),
    ]
    if a.fused_train:
        cmd.append("--fused_train")
    if audio_bf16:
        cmd.append("--audio_bf16")
    print("+", " ".join(cmd), file=sys.stderr, flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-2000:])
    print(f"  -> rc={proc.returncode} in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # last logged mean loss from the KV logger table (stdout or stderr)
    losses = re.findall(
        r"\|\s*loss\s*\|\s*([0-9.eE+-]+)", proc.stdout + proc.stderr
    )
    return float(losses[-1]) if losses else float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--n_clips", type=int, default=40)
    p.add_argument("--fused_train", action="store_true", default=True)
    p.add_argument("--no_fused_train", dest="fused_train",
                   action="store_false")
    p.add_argument("--noise_floor", action="store_true",
                   help="also train a THIRD run (f32, seed+1) to measure "
                        "the seed-to-seed FGD variance the bf16 delta must "
                        "be compared against")
    p.add_argument("--out", type=str, default="/tmp/audio_bf16_study")
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

    loss_f32 = train(f"{a.out}/f32", data_dir, a, audio_bf16=False)
    loss_bf16 = train(f"{a.out}/bf16", data_dir, a, audio_bf16=True)
    loss_seed2 = (
        train(f"{a.out}/f32_seed2", data_dir, a, audio_bf16=False, seed=234)
        if a.noise_floor else None
    )

    # --- FGD of both checkpoints through one frozen fixture embedder ----
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
    # Eval ALWAYS runs the f32 model graph: audio_bf16 is a train-time
    # throughput option, the checkpoint tree is identical either way.
    cfg = RAGConfig.ted(latent_dim=a.latent_dim, num_layers=a.layers)
    model = RAG(cfg)
    enc = TedEmbeddingEncoder()
    fixture = EmbeddingSpaceEvaluator(
        enc.init(jax.random.PRNGKey(11), jnp.zeros((1, 34, 27)))["params"]
    )

    def eval_fgd(save_dir):
        return fixture_fgd(model, dataset, final_npz(save_dir), fixture)

    fgd_f32 = eval_fgd(f"{a.out}/f32")
    fgd_bf16 = eval_fgd(f"{a.out}/bf16")

    out = {
        "epochs": a.epochs,
        "batch_size": a.batch_size,
        "fused_train": a.fused_train,
        "final_loss_f32": loss_f32,
        "final_loss_bf16": loss_bf16,
        "fgd_f32": fgd_f32,
        "fgd_bf16": fgd_bf16,
        "fgd_rel_delta": abs(fgd_bf16 - fgd_f32) / max(abs(fgd_f32), 1e-12),
    }
    if a.noise_floor:
        fgd_seed2 = eval_fgd(f"{a.out}/f32_seed2")
        out["final_loss_f32_seed2"] = loss_seed2
        out["fgd_f32_seed2"] = fgd_seed2
        out["fgd_seed_rel_delta"] = (
            abs(fgd_seed2 - fgd_f32) / max(abs(fgd_f32), 1e-12)
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
