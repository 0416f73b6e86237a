#!/usr/bin/env python
"""Input-pipeline throughput benchmark.

The training step runs at ~26 ms for 512 clips (19.8k clips/s,
`scripts/bench_train.py`); this measures whether the host-side data path —
record mmap decode, C++ batch gather, background prefetch — can feed it.

Prints one JSON line:
    {"metric": "ted_loader_clips_per_sec", "value": ..., "unit": "clips/s",
     "train_step_demand": 19800, "headroom_x": ...}

Usage: python scripts/bench_data.py [--batch 512] [--epochs 3]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--train_step_demand", type=float, default=19800.0,
                   help="clips/s the train step consumes (bench_train.py)")
    args = p.parse_args()

    from livelyspeaker_tpu.data import DataLoader, TedWindowDataset

    data_dir = args.data_dir
    if not data_dir:
        from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records

        data_dir = os.path.join(tempfile.gettempdir(), "ls_tpu_bench_data")
        if not os.path.exists(os.path.join(data_dir, "meta.json")):
            print("building synthetic records (~2k windows)...", file=sys.stderr)
            build_synthetic_ted_records(data_dir, n_clips=24, clip_seconds=60)

    ds = TedWindowDataset(data_dir)

    def measure(fields, d=None):
        loader = DataLoader(d or ds, batch_size=args.batch, shuffle=True,
                            drop_last=True, seed=0, fields=fields)
        for batch in loader:  # warm: page cache, thread spin-up
            pass
        t0 = time.time()
        clips = 0
        for _ in range(args.epochs):
            for batch in loader:
                clips += batch["motion"].shape[0]
        return clips / (time.time() - t0)

    print(f"dataset: {len(ds)} windows at batch {args.batch}",
          file=sys.stderr)

    # PCM16-audio records (lossless vs 16-bit source WAVs, half the bytes)
    ds16 = None
    if not args.data_dir:
        from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records
        from livelyspeaker_tpu.data.ted import TedConfig

        d16 = os.path.join(tempfile.gettempdir(), "ls_tpu_bench_data_i16")
        if not os.path.exists(os.path.join(d16, "meta.json")):
            build_synthetic_ted_records(
                d16, n_clips=24, clip_seconds=60,
                cfg=TedConfig(audio_dtype="int16"),
            )
        ds16 = TedWindowDataset(d16)

    runs = [
        ("train_fields", ("motion", "audio", "vid"), ds),
        ("all_fields", None, ds),
    ]
    if ds16 is not None:
        runs.append(("train_fields_pcm16", ("motion", "audio", "vid"), ds16))
    for name, fields, d in runs:
        rate = measure(fields, d)
        print(json.dumps({
            "metric": f"ted_loader_clips_per_sec_{name}",
            "value": round(rate, 1),
            "unit": "clips/s",
            "train_step_demand": args.train_step_demand,
            "headroom_x": round(rate / args.train_step_demand, 2),
        }))


if __name__ == "__main__":
    main()
