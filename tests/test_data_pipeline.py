"""Data pipeline tests: records round-trip, TED windowing/filtering semantics,
loader batching, synthetic generator, FK round-trips."""

import numpy as np
import pytest

from livelyspeaker_tpu.data import (
    DataLoader,
    MotionFilter,
    ShardedDataset,
    ShardWriter,
    TedConfig,
    TedWindowDataset,
    Vocab,
    make_audio_fixed_length,
    resample_pose_seq,
)
from livelyspeaker_tpu.data.synthetic import build_synthetic_ted_records
from livelyspeaker_tpu.ops.skeleton import (
    MEAN_DIR_VEC,
    MEAN_POSE,
    convert_dir_vec_to_pose,
    convert_pose_seq_to_dir_vec,
)


def test_records_roundtrip(tmp_path):
    w = ShardWriter(str(tmp_path / "ds"), shard_size=3)
    for i in range(8):
        w.add(x=np.full((2, 2), i, np.float32), label=f"row{i}", idx=np.int32(i))
    w.finish()
    ds = ShardedDataset(str(tmp_path / "ds"))
    assert len(ds) == 8
    assert ds[5]["label"] == "row5"
    np.testing.assert_array_equal(ds[7]["x"], np.full((2, 2), 7))
    b = ds.batch([0, 4, 7])
    assert b["x"].shape == (3, 2, 2)
    assert b["label"] == ["row0", "row4", "row7"]


def test_resample_pose_seq_length():
    poses = np.random.default_rng(0).normal(size=(100, 10, 3))
    out = resample_pose_seq(poses, duration_in_sec=5.0, fps=15)
    assert len(out) == 75
    # endpoints preserved approximately
    np.testing.assert_allclose(out[0], poses[0], atol=1e-6)


def test_make_audio_fixed_length():
    a = np.arange(10, dtype=np.float32)
    assert len(make_audio_fixed_length(a, 15)) == 15
    assert len(make_audio_fixed_length(a, 5)) == 5


def test_motion_filter_rules():
    f = MotionFilter(MEAN_POSE)
    t = 42
    mean_pose = MEAN_POSE.reshape(10, 3)
    # near-mean pose -> rejected as "pose"
    static = np.tile(mean_pose, (t, 1, 1)) + 1e-4
    assert f.check(static) == "pose"
    # moving arms, upright spine -> PASS
    rng = np.random.default_rng(0)
    moving = np.tile(mean_pose, (t, 1, 1))
    moving[:, 4:] += 0.05 * rng.normal(size=(t, 6, 3))  # arms only
    moving[:, 6] += 0.2 * np.sin(np.linspace(0, 6, t))[:, None]
    moving[:, 9] += 0.2 * np.cos(np.linspace(0, 6, t))[:, None]
    assert f.check(moving) == "PASS"
    # tilted spine -> rejected
    tilted = moving.copy()
    tilted[:, 1, 0] = tilted[:, 0, 0] + 1.0  # spine sideways
    assert f.check(tilted) == "spine angle"
    # static wrists -> "motion"
    frozen = np.tile(mean_pose * 1.5, (t, 1, 1))
    assert f.check(frozen) == "motion"


def test_fk_dir_vec_roundtrip():
    rng = np.random.default_rng(1)
    dv = rng.normal(size=(4, 9, 3))
    dv /= np.linalg.norm(dv, axis=-1, keepdims=True)
    pose = np.asarray(convert_dir_vec_to_pose(dv))
    assert pose.shape == (4, 10, 3)
    dv2 = np.asarray(convert_pose_seq_to_dir_vec(pose))
    np.testing.assert_allclose(dv2, dv, atol=1e-5)


@pytest.fixture(scope="module")
def synthetic_records(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth") / "ted"
    n, vocab = build_synthetic_ted_records(str(d), n_clips=3, clip_seconds=10)
    return str(d), n, vocab


def test_synthetic_records_built(synthetic_records):
    root, n, vocab = synthetic_records
    assert n > 0
    assert vocab.n_words >= 2  # speakers indexed


def test_ted_window_dataset(synthetic_records):
    root, n, _ = synthetic_records
    lang = Vocab("words")
    ds = TedWindowDataset(root, lang_model=lang)
    assert len(ds) == n
    s = ds[0]
    assert s["motion"].shape == (9, 3, 34)
    assert s["audio"].shape == (TedConfig().audio_length,)  # 36267
    assert s["word_ids"].shape == (34,)
    assert s["sentence"].startswith('A person is talking: "')
    # motion is mean-subtracted dir vecs: adding mean back gives unit vectors
    dv = s["motion"].transpose(2, 0, 1) + MEAN_DIR_VEC.reshape(9, 3)
    np.testing.assert_allclose(
        np.linalg.norm(dv, axis=-1), 1.0, atol=1e-4
    )


def test_ted_vectorized_batch_matches_per_row(synthetic_records):
    """The C++-gather batch path must produce exactly what per-row
    __getitem__ assembly does, for every field."""
    root, n, _ = synthetic_records
    lang = Vocab("words")
    ds = TedWindowDataset(root, lang_model=lang)
    idx = np.asarray([0, n - 1, 3, 1])
    fast = ds.batch(idx)
    for k in ("motion", "vec_seq", "pose_seq", "audio", "vid", "word_ids"):
        slow = np.stack([ds[int(i)][k] for i in idx])
        np.testing.assert_array_equal(fast[k], slow, err_msg=k)
    assert fast["sentence"] == [ds[int(i)]["sentence"] for i in idx]


def test_ted_batch_field_selection(synthetic_records):
    root, n, _ = synthetic_records
    ds = TedWindowDataset(root)
    b = ds.batch([0, 1], fields=("motion", "audio", "vid"))
    assert set(b) == {"motion", "audio", "vid"}
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                    fields=("motion", "vid"))
    first = next(iter(dl))
    assert set(first) == {"motion", "vid"}


def test_pcm16_records_end_to_end(tmp_path):
    """int16 audio records: lossless-ish round-trip, device-side decode in
    WavEncoder matches the f32-records features."""
    import jax
    import jax.numpy as jnp

    from livelyspeaker_tpu.data.ted import TedConfig, pcm16_decode
    from livelyspeaker_tpu.models import WavEncoder

    d32, d16 = str(tmp_path / "f32"), str(tmp_path / "i16")
    build_synthetic_ted_records(d32, n_clips=2, clip_seconds=8)
    build_synthetic_ted_records(
        d16, n_clips=2, clip_seconds=8, cfg=TedConfig(audio_dtype="int16")
    )
    a32 = TedWindowDataset(d32).batch([0, 1], fields=("audio",))["audio"]
    a16 = TedWindowDataset(d16).batch([0, 1], fields=("audio",))["audio"]
    assert a16.dtype == np.int16 and a32.dtype == np.float32
    np.testing.assert_allclose(pcm16_decode(a16), a32, atol=1.0 / 32767)

    enc = WavEncoder()
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(a32))["params"]
    f32 = enc.apply({"params": params}, jnp.asarray(a32))
    f16 = enc.apply({"params": params}, jnp.asarray(a16))  # int in, casts
    np.testing.assert_allclose(
        np.asarray(f16), np.asarray(f32), atol=5e-3
    )


def test_loader_batching(synthetic_records):
    root, n, _ = synthetic_records
    ds = TedWindowDataset(root)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == n // 4
    b = batches[0]
    assert b["motion"].shape == (4, 9, 3, 34)
    assert len(b["sentence"]) == 4
    # two epochs shuffle differently
    b2 = next(iter(dl))
    assert not np.allclose(b["motion"], b2["motion"])


def test_device_resident_loader_matches_streaming(synthetic_records):
    """DeviceDataLoader (HBM-staged dataset, per-step index gather) must
    yield the exact batch stream of the streaming DataLoader for the same
    (seed, epoch): identical shuffles, identical rows."""
    from livelyspeaker_tpu.data import DeviceDataLoader

    root, n, _ = synthetic_records
    ds = TedWindowDataset(root)
    fields = ("motion", "audio", "vid")
    stream = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        seed=5, fields=fields)
    resident = DeviceDataLoader(ds, batch_size=4, shuffle=True,
                                drop_last=True, seed=5, fields=fields)
    assert len(stream) == len(resident) == n // 4
    for epoch in range(2):
        stream.set_epoch(epoch)
        resident.set_epoch(epoch)
        for bs, br in zip(stream, resident):
            assert set(br) == set(fields)
            for k in fields:
                np.testing.assert_array_equal(
                    np.asarray(bs[k]), np.asarray(br[k])
                )


def test_device_resident_loader_sharded_batches(synthetic_records):
    """With a mesh sharding, gathered batches come out DP-sharded over
    'data' (replicated residents, local slices, no host round-trip) and
    still equal the streaming loader's rows."""
    import jax

    from livelyspeaker_tpu.data import DeviceDataLoader
    from livelyspeaker_tpu.parallel import batch_sharding, create_mesh

    root, n, _ = synthetic_records
    ds = TedWindowDataset(root)
    mesh = create_mesh()  # 8 virtual CPU devices
    bs = batch_sharding(mesh)
    fields = ("motion", "audio", "vid")
    resident = DeviceDataLoader(ds, batch_size=8, shuffle=True,
                                drop_last=True, seed=3, fields=fields,
                                sharding=bs)
    stream = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        seed=3, fields=fields)
    resident.set_epoch(0)
    stream.set_epoch(0)
    br = next(iter(resident))
    bss = next(iter(stream))
    assert br["motion"].sharding.is_equivalent_to(bs, br["motion"].ndim)
    for k in fields:
        np.testing.assert_array_equal(np.asarray(br[k]), np.asarray(bss[k]))
    # the train step can consume it directly on the mesh
    total = jax.jit(lambda m: m.sum())(br["motion"])
    assert np.isfinite(float(total))


def test_loader_multihost_split(synthetic_records):
    root, n, _ = synthetic_records
    ds = TedWindowDataset(root)
    dl0 = DataLoader(ds, batch_size=2, shuffle=False, host_id=0, num_hosts=2)
    dl1 = DataLoader(ds, batch_size=2, shuffle=False, host_id=1, num_hosts=2)
    a = next(iter(dl0))["audio"]
    b = next(iter(dl1))["audio"]
    assert len(dl0) == len(ds) // 2 // 2
    # disjoint index streams -> different windows
    assert not np.array_equal(a, b)


def test_vocab_trim_save_load_and_npz_vectors(tmp_path):
    """Vocab semantics (reference scripts/model/vocab.py:8-130): default
    tokens, counting, trim(min_count), pickle round-trip, npz word vectors
    (the fastText substitute)."""
    v = Vocab("w")
    for w in ["apple", "apple", "banana", "cherry", "cherry", "cherry"]:
        v.index_word(w)
    assert v.get_word_index("apple") == v.word2index["apple"]
    assert v.get_word_index("unknown-token") == v.UNK_token

    v.trim(min_count=2)  # drops banana
    assert v.get_word_index("banana") == v.UNK_token
    assert v.get_word_index("cherry") != v.UNK_token

    p = str(tmp_path / "vocab.pkl")
    v.save(p)
    v2 = Vocab.load(p)
    assert v2.word2index == v.word2index

    vecs = {w: np.random.default_rng(1).normal(size=8).astype(np.float32)
            for w in ("apple", "cherry")}
    npz = str(tmp_path / "vecs.npz")
    np.savez(npz, **vecs)
    v2.load_word_vectors_npz(npz, dim=8)
    assert v2.word_embedding_weights.shape == (v2.n_words, 8)
    np.testing.assert_array_equal(
        v2.word_embedding_weights[v2.word2index["apple"]], vecs["apple"]
    )


def test_mode_blind_fixture_closes_side_channels():
    """mode_blind=True removes every non-motion mode identifier: audio is
    drawn from a pool paired orthogonally to the mode and the speaker id is
    independent of c % modes (which the default cycling makes EQUAL to the
    mode when n_speakers == modes); default False is byte-identical to the
    historical fixture."""
    from livelyspeaker_tpu.data.synthetic import synthetic_clips

    K = 4
    blind = list(synthetic_clips(n_clips=16, clip_seconds=2.0, modes=K,
                                 mode_blind=True))
    # audio: clips c and c+1 have different modes but the same pool stream
    for c in range(0, 16 - K, K):
        np.testing.assert_array_equal(blind[c]["audio"],
                                      blind[c + 1]["audio"])
    # speaker: within one pool group the speaker is constant across modes,
    # so speaker does not determine the mode
    assert blind[0]["vid"] == blind[1]["vid"]
    assert blind[0]["vid"] != blind[K]["vid"]

    # default path unchanged: unique audio per clip, vid cycles with c
    legacy = list(synthetic_clips(n_clips=8, clip_seconds=2.0, modes=K))
    assert not np.array_equal(legacy[0]["audio"], legacy[1]["audio"])
    assert legacy[0]["vid"] == "speaker_000" and legacy[1]["vid"] == "speaker_001"
    legacy2 = list(synthetic_clips(n_clips=8, clip_seconds=2.0, modes=K))
    np.testing.assert_array_equal(legacy[3]["audio"], legacy2[3]["audio"])
    np.testing.assert_array_equal(legacy[3]["skeletons"], legacy2[3]["skeletons"])
