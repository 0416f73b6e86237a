"""BEAT pipeline tests: BVH parse/write round-trip, euler<->rot6d, window
records, dataset contract, and a BEAT-config train step."""

import numpy as np
import jax
import pytest

from livelyspeaker_tpu.data.beat import (
    SPINE_NECK_141_JOINTS,
    BeatConfig,
    BeatWindowDataset,
    beat_official_split,
    build_beat_records,
    bvh_to_joint_channels,
    euler_deg_to_rot6d,
    rot6d_to_euler_deg,
)
from livelyspeaker_tpu.data.bvh import BvhData, BvhJoint, parse_bvh, write_bvh

SIMPLE_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation
  JOINT Spine
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    JOINT Neck
    {
      OFFSET 0.0 12.0 0.0
      CHANNELS 3 Xrotation Yrotation Zrotation
      End Site
      {
        OFFSET 0.0 5.0 0.0
      }
    }
  }
}
MOTION
Frames: 4
Frame Time: 0.00833333
0 0 0 1 2 3 4 5 6 7 8 9
0 0 0 1.1 2.1 3.1 4.1 5.1 6.1 7.1 8.1 9.1
0 0 0 1.2 2.2 3.2 4.2 5.2 6.2 7.2 8.2 9.2
0 0 0 1.3 2.3 3.3 4.3 5.3 6.3 7.3 8.3 9.3
"""


def test_bvh_parse():
    b = parse_bvh(SIMPLE_BVH)
    assert b.root == "Hips"
    assert b.frames.shape == (4, 12)
    assert b.fps == pytest.approx(120.0, rel=1e-3)
    assert b.rotation_order("Spine") == "XYZ"
    np.testing.assert_allclose(b.joint_channels("Neck")[0], [7, 8, 9])


def test_bvh_write_roundtrip():
    b = parse_bvh(SIMPLE_BVH)
    text = write_bvh(b)
    b2 = parse_bvh(text)
    assert b2.channel_order == b.channel_order
    np.testing.assert_allclose(b2.frames, b.frames, atol=1e-5)
    assert b2.joints["Spine"].offset == b.joints["Spine"].offset


def test_bvh_joint_selection_and_downsample():
    b = parse_bvh(SIMPLE_BVH)
    out = bvh_to_joint_channels(b, joints=["Spine", "Neck"], target_fps=60)
    assert out.shape == (2, 6)  # 4 frames @120 -> 2 @60; 2 joints x 3 rot
    np.testing.assert_allclose(out[0], [4, 5, 6, 7, 8, 9])


def test_euler_rot6d_roundtrip(rng_np):
    euler = rng_np.uniform(-60, 60, size=(5, 47, 3)).astype(np.float32)
    d6 = euler_deg_to_rot6d(euler)
    assert d6.shape == (5, 47, 6)
    back = rot6d_to_euler_deg(d6)
    np.testing.assert_allclose(back, euler, atol=1e-2)


def test_official_split_rules():
    """Exact split_rule_english semantics (preprocess_1.py:175-347)."""
    # 4h speaker: whole recordings route by the table
    s = beat_official_split("2_scott_0_9_9.bvh", 120.0)
    assert s["train"] == [(0.0, 120.0)]  # in the 4h train list
    s = beat_official_split("2_scott_0_1_1.bvh", 120.0)
    assert s["test"] == [(0.0, 120.0)] and not s["train"]  # 4h test list
    s = beat_official_split("2_scott_0_57_57.bvh", 120.0)
    assert s["val"] == [(0.0, 120.0)]  # 4h val list
    s = beat_official_split("2_scott_1_1_1.bvh", 400.0)
    assert s["test"] == [(0.0, 400.0)]  # 4h: whole 1_1_1 is test
    # 1h speaker: a/b cut recordings; head->test, tail->val
    s = beat_official_split("5_stewart_0_65_65.bvh", 120.0)
    assert s["test"] == [(0.0, 30.0)] and s["val"] == [(30.0, 120.0)]
    s = beat_official_split("5_stewart_1_1_1.bvh", 400.0)
    assert s["test"] == [(0.0, 300.0)] and s["val"] == [(300.0, 400.0)]
    s = beat_official_split("5_stewart_1_1_1.bvh", 200.0)
    assert s["test"] == [(0.0, 200.0)] and s["val"] == []
    # whole-file val for 1h speakers
    s = beat_official_split("5_stewart_0_5_5.bvh", 60.0)
    assert s["val"] == [(0.0, 60.0)]
    # anything unlisted stays train
    s = beat_official_split("5_stewart_0_33_33.bvh", 60.0)
    assert s["train"] == [(0.0, 60.0)]


@pytest.fixture(scope="module")
def beat_records(tmp_path_factory, request):
    rng = np.random.default_rng(7)
    cfg = BeatConfig()
    clips = []
    for vid in (2, 4):
        t = 120  # 8 s at 15 fps
        clips.append(
            {
                "vid": vid,
                "euler141": rng.uniform(-40, 40, size=(t, 141)).astype(
                    np.float32
                ),
                "audio": rng.normal(size=t * 16000 // 15).astype(np.float32)
                * 0.1,
                "emo": rng.integers(0, 8, size=t),
                "sem": rng.uniform(0, 1, size=t).astype(np.float32),
            }
        )
    d = tmp_path_factory.mktemp("beat") / "records"
    n = build_beat_records(cfg, clips, str(d))
    return str(d), n


def test_beat_vectorized_batch_matches_per_row(beat_records):
    """The C++-gather batch path equals per-row __getitem__ assembly."""
    root, n = beat_records
    ds = BeatWindowDataset(root)
    idx = np.asarray([0, n - 1, 1])
    fast = ds.batch(idx)
    rows = [ds[int(i)] for i in idx]
    for k in rows[0]:
        if k == "sentence":
            assert fast[k] == [r[k] for r in rows]
        else:
            np.testing.assert_array_equal(
                fast[k], np.stack([r[k] for r in rows]), err_msg=k
            )
    lite = ds.batch(idx, fields=("motion", "audio", "vid", "emo"))
    assert set(lite) == {"motion", "audio", "vid", "emo"}


def test_beat_pcm16_records(tmp_path):
    """int16-audio BEAT records flow through the batch path unconverted and
    decode on device in WavEncoder (same contract as the TED twin)."""
    from livelyspeaker_tpu.data.synthetic import build_synthetic_beat_records
    from livelyspeaker_tpu.data.ted import pcm16_decode

    d32, d16 = str(tmp_path / "f32"), str(tmp_path / "i16")
    build_synthetic_beat_records(d32, n_clips=2, clip_seconds=8)
    build_synthetic_beat_records(
        d16, n_clips=2, clip_seconds=8, cfg=BeatConfig(audio_dtype="int16")
    )
    a32 = BeatWindowDataset(d32).batch([0, 1], fields=("audio",))["audio"]
    a16 = BeatWindowDataset(d16).batch([0, 1], fields=("audio",))["audio"]
    assert a16.dtype == np.int16 and a32.dtype == np.float32
    np.testing.assert_allclose(pcm16_decode(a16), a32, atol=1.0 / 32767)


def test_beat_records_and_dataset(beat_records):
    root, n = beat_records
    assert n > 0
    ds = BeatWindowDataset(root)
    assert len(ds) == n
    s = ds[0]
    assert s["motion"].shape == (47, 6, 34)
    assert s["audio"].shape == (BeatConfig().audio_length,)
    assert s["pose"].shape == (34, 141)
    assert 0 <= int(s["emo"]) < 8
    # rot6d columns are valid 6d rotations: converting back gives finite euler
    back = rot6d_to_euler_deg(s["motion"].transpose(2, 0, 1))
    assert np.isfinite(back).all()
    b = ds.batch([0, 1])
    assert b["motion"].shape == (2, 47, 6, 34)


def test_beat_train_step(beat_records):
    """One training step with the BEAT model config (emotion token)."""
    import jax.numpy as jnp

    from livelyspeaker_tpu.diffusion import DiffusionSchedule
    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    root, _ = beat_records
    ds = BeatWindowDataset(root)
    batch = ds.batch([0, 1])
    cfg = RAGConfig.beat(latent_dim=64, num_layers=2, n_speakers=30)
    model = RAG(cfg)
    cond = {
        "audio": jnp.asarray(batch["audio"]),
        "vid": jnp.asarray(batch["vid"]),
        "origin_x": jnp.asarray(batch["motion"]),
        "emo": jnp.asarray(batch["emo"]),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1),
         "cond_mask": jax.random.PRNGKey(2)},
        jnp.asarray(batch["motion"]),
        jnp.zeros((2,), jnp.int32),
        cond,
        train=True,
    )["params"]
    sched = DiffusionSchedule.create(steps=20)
    # BEAT uses kld weight 0 (scripts_beat train_loop.py:246)
    tcfg = TrainConfig(kld_weight=0.0)
    tx = make_optimizer(tcfg)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(model, sched, tx, tcfg))
    dev_batch = {
        "motion": jnp.asarray(batch["motion"]),
        "audio": jnp.asarray(batch["audio"]),
        "vid": jnp.asarray(batch["vid"]),
        "emo": jnp.asarray(batch["emo"]),
    }
    state2, metrics = step(state, dev_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_semantic_beat_fixture_mode_blind_and_separable(tmp_path):
    """The BEAT semantic fixture's contract: text identifies the archetype,
    every other channel is mode-blind, and the euler-space gap straddles
    the SRGR threshold (same-mode < 4 deg/joint, cross-mode >> 4)."""
    from livelyspeaker_tpu.data.beat import (
        BeatWindowDataset,
        rot6d_to_euler_deg,
    )
    from livelyspeaker_tpu.data.synthetic import (
        BEAT_SEM_ONSET,
        build_semantic_beat_records,
        semantic_mode_of_sentence_prefix,
        synthetic_semantic_beat_clips,
    )

    K = 4
    clips = list(synthetic_semantic_beat_clips(n_clips=16, modes=K, seed=3))
    # audio / speaker / emotion: constant within a pool group across modes
    for c in range(0, 12, K):
        np.testing.assert_array_equal(
            clips[c]["audio"], clips[c + 1]["audio"]
        )
        assert clips[c]["vid"] == clips[c + 1]["vid"]
        assert clips[c]["emo"][0] == clips[c + 1]["emo"][0]
    assert clips[0]["vid"] != clips[K]["vid"]
    # pre-onset frames carry no archetype: same group, different modes,
    # identical up to the 25% unique residual (bounded by the wobble scale)
    pre = slice(0, BEAT_SEM_ONSET)
    d_pre = np.abs(clips[0]["euler141"][pre] - clips[1]["euler141"][pre])
    assert d_pre.max() < 10.0, d_pre.max()

    d = str(tmp_path / "sem_beat")
    n = build_semantic_beat_records(d, n_clips=16, modes=K, seed=3)
    assert n == 16  # one window per clip
    ds = BeatWindowDataset(d)
    b = ds.batch(list(range(len(ds))))
    modes = np.asarray(
        [semantic_mode_of_sentence_prefix(s, K) for s in b["sentence"]]
    )
    np.testing.assert_array_equal(modes, np.arange(16) % K)
    # sem marks exactly the post-onset frames
    assert (b["sem"][0][:BEAT_SEM_ONSET] < 0.1).all()
    assert (b["sem"][0][BEAT_SEM_ONSET + 4:] > 0.5).all()

    # SRGR separability in euler space (sum-|diff| over 3 euler dims/joint,
    # threshold 4.0, metric.py:40-44): same-mode pairs mostly under, cross-
    # mode pairs mostly over
    eul = rot6d_to_euler_deg(
        b["motion"].transpose(0, 3, 1, 2).reshape(16, 34, 47, 6)
    )
    sem_frames = slice(BEAT_SEM_ONSET + 4, None)
    same = np.abs(eul[0] - eul[4]).sum(-1)[sem_frames]  # mode 0 vs mode 0
    diff = np.abs(eul[0] - eul[1]).sum(-1)[sem_frames]  # mode 0 vs mode 1
    assert (same < 4.0).mean() > 0.8, (same < 4.0).mean()
    assert (diff < 4.0).mean() < 0.2, (diff < 4.0).mean()
