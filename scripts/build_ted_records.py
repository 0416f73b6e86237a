#!/usr/bin/env python
"""Build TED training records from raw clip data.

Input options (pick one):
  --clips_dir DIR    directory of per-clip .npz files, each containing:
                       vid (str), skeletons [F,10,3], audio (16 kHz f32),
                       words (list of [word, start, end]),
                       start_time, end_time
  --lmdb_dir DIR     the original TED youtube-gesture-dataset LMDB
                     (requires the `lmdb` package AND a pyarrow old enough
                     to still have `pyarrow.deserialize`; modern arrow
                     removed it — see README "Real datasets")

Output: sharded records + speaker vocab under --out, ready for
scripts/train_rag.py --dataset ted --data_dir OUT.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from livelyspeaker_tpu.data.ted import TedConfig, build_ted_records


def clips_from_npz_dir(d):
    for name in sorted(os.listdir(d)):
        if not name.endswith(".npz"):
            continue
        z = np.load(os.path.join(d, name), allow_pickle=True)
        yield {
            "vid": str(z["vid"]),
            "skeletons": z["skeletons"],
            "audio": z["audio"].astype(np.float32),
            "words": z["words"].tolist(),
            "start_time": float(z["start_time"]),
            "end_time": float(z["end_time"]),
        }


def clips_from_reference_lmdb(d):
    """Read the original TED LMDB (video -> clips) if the legacy toolchain
    is available (lmdb_data_loader.py / data_preprocessor.py source format)."""
    try:
        import lmdb
    except ImportError as e:
        raise SystemExit(
            "reading the TED LMDB needs the `lmdb` package; use --clips_dir "
            "with exported npz clips instead"
        ) from e
    try:
        from pyarrow import deserialize  # removed in modern pyarrow
    except ImportError as e:
        raise SystemExit(
            "the TED LMDB uses legacy pyarrow serialization "
            "(pyarrow.deserialize, removed since pyarrow 2.0). Export clips "
            "to npz with an old environment, then use --clips_dir."
        ) from e

    env = lmdb.open(d, readonly=True, lock=False)
    with env.begin() as txn:
        for _, value in txn.cursor():
            video = deserialize(value)
            for clip in video["clips"]:
                yield {
                    "vid": video["vid"],
                    "skeletons": np.asarray(clip["skeletons_3d"]),
                    "audio": np.asarray(clip["audio_raw"], np.float32),
                    "words": clip["words"],
                    "start_time": float(clip["start_time"]),
                    "end_time": float(clip["end_time"]),
                }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips_dir", type=str, default="")
    p.add_argument("--lmdb_dir", type=str, default="")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n_poses", type=int, default=34)
    p.add_argument("--stride", type=int, default=10)
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--disable_filtering", action="store_true")
    p.add_argument("--audio_dtype", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="int16 = PCM16 records: lossless vs 16-bit source "
                        "WAVs, ~2.3x loader throughput (decoded on device)")
    args = p.parse_args()

    if bool(args.clips_dir) == bool(args.lmdb_dir):
        raise SystemExit("give exactly one of --clips_dir / --lmdb_dir")
    clips = (
        clips_from_npz_dir(args.clips_dir)
        if args.clips_dir
        else clips_from_reference_lmdb(args.lmdb_dir)
    )
    cfg = TedConfig(
        n_poses=args.n_poses, subdivision_stride=args.stride, fps=args.fps,
        audio_dtype=args.audio_dtype,
    )
    n, vocab = build_ted_records(
        cfg, clips, args.out, disable_filtering=args.disable_filtering
    )
    print(f"wrote {n} windows, {vocab.n_words} speakers -> {args.out}")


if __name__ == "__main__":
    main()
