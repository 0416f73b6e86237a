"""End-to-end test of scripts/build_beat_records.py on a synthetic raw
BEAT directory (bvh + wav + TextGrid + emo csv + sem txt + facial json),
plus the TextGrid parser."""

import importlib.util
import json
import os
import sys
import wave

import numpy as np
import pytest

from livelyspeaker_tpu.data.beat import (
    BeatConfig,
    BeatWindowDataset,
    SPINE_NECK_141_JOINTS,
)
from livelyspeaker_tpu.data.bvh import BvhData, BvhJoint, write_bvh
from livelyspeaker_tpu.data.textgrid import parse_textgrid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 4.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 4.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 1.0
            text = ""
        intervals [2]:
            xmin = 1.0
            xmax = 2.5
            text = "hello"
        intervals [3]:
            xmin = 2.5
            xmax = 4.0
            text = "world"
"""


def test_parse_textgrid():
    tiers = parse_textgrid(TG)
    assert len(tiers) == 1 and tiers[0].name == "words"
    iv = tiers[0].intervals
    assert [i.mark for i in iv] == ["", "hello", "world"]
    assert iv[1].xmin == 1.0 and iv[2].xmax == 4.0


def _write_raw_beat(root, name="2_scott_0_9_9", seconds=12.0, fps=120):
    """Synthesize one raw BEAT recording: 47-joint BVH chain @120 fps,
    PCM16 wav @16 kHz, TextGrid, emo csv, sem txt, facial json."""
    rng = np.random.default_rng(5)
    sdir = os.path.join(root, name.split("_")[0])
    os.makedirs(sdir, exist_ok=True)
    stem = os.path.join(sdir, name)

    joints = {
        "Hips": BvhJoint(
            "Hips", None, (0, 0, 0),
            ["Xposition", "Yposition", "Zposition",
             "Xrotation", "Yrotation", "Zrotation"], [],
        )
    }
    order = [("Hips", c) for c in joints["Hips"].channels]
    prev = "Hips"
    for jn in SPINE_NECK_141_JOINTS:
        joints[jn] = BvhJoint(
            jn, prev, (0, 1, 0), ["Xrotation", "Yrotation", "Zrotation"], []
        )
        joints[prev].children.append(jn)
        order += [(jn, c) for c in joints[jn].channels]
        prev = jn
    t = int(seconds * fps)
    frames = (rng.normal(size=(t, len(order))) * 10).astype(np.float64)
    write_bvh(
        BvhData(joints, "Hips", 1.0 / fps, frames, order), stem + ".bvh"
    )

    sr, n = 16000, int(seconds * 16000)
    pcm = (rng.normal(size=n) * 3000).astype(np.int16)
    with wave.open(stem + ".wav", "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    with open(stem + ".TextGrid", "w") as f:
        f.write(TG)
    with open(stem + ".csv", "w") as f:
        f.write("happy,0.0,6.0,6.0,3\nneutral,6.0,12.0,6.0,0\n")
    with open(stem + ".txt", "w") as f:
        f.write("s\t0.5\t2.0\t1.5\t0.8\thello\n")
    facial = {
        "names": [f"bs{i}" for i in range(52)],
        "frames": [
            {"time": i / 60.0, "weights": list(np.zeros(52))}
            for i in range(int(seconds * 60))
        ],
    }
    with open(stem + ".json", "w") as f:
        json.dump(facial, f)
    return name


def test_build_beat_records_cli(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "records")
    _write_raw_beat(raw)  # 2_scott_0_9_9: 4h-speaker train recording

    spec = importlib.util.spec_from_file_location(
        "build_beat_cli", os.path.join(ROOT, "scripts", "build_beat_records.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    old_argv = sys.argv
    sys.argv = ["build_beat_records.py", "--raw_dir", raw, "--out", out,
                "--split", "train", "--speakers", "2"]
    try:
        cli.main()
    finally:
        sys.argv = old_argv

    ds = BeatWindowDataset(out)
    cfg = BeatConfig()
    assert len(ds) > 0
    b = ds.batch(np.arange(min(len(ds), 4)))
    assert b["motion"].shape[1:] == (cfg.njoints, 6, cfg.pose_length)
    assert b["audio"].shape[1] == cfg.audio_length
    assert np.isfinite(b["motion"]).all()
    # word ids: the "hello"/"world" frames carry non-PAD indices
    assert (b["word_ids"] > 3).any()
    # emotion: the first window overlaps the 'happy' (label 3) span
    assert (b["emo"] == 3).any() or (b["emo"] == 0).any()
    assert os.path.exists(os.path.join(out, "vocab.pkl"))

    # test split of the same raw dir produces nothing (0_9_9 is train-only)
    out2 = str(tmp_path / "records_test")
    sys.argv = ["build_beat_records.py", "--raw_dir", raw, "--out", out2,
                "--split", "test", "--speakers", "2"]
    try:
        with pytest.raises(Exception):
            cli.main()  # build_beat_records on zero clips raises (no data)
    finally:
        sys.argv = old_argv
