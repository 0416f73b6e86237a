"""Serving layer: dynamic batcher + HTTP front-end (tiny model, CPU)."""

import importlib.util
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from livelyspeaker_tpu.models import RAG, RAGConfig, audio_samples_for_frames
from livelyspeaker_tpu.serving import ServeConfig, build_rag_server

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_server(max_batch=4, max_wait_ms=100.0, data_parallel=1,
                 pipeline_depth=1):
    cfg = RAGConfig(latent_dim=64, num_layers=2, n_speakers=4)
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    cond = {
        "audio": np.zeros((2, audio_samples_for_frames(nf)), np.float32),
        "vid": np.zeros((2,), np.int64),
        "origin_x": np.zeros((2, cfg.njoints, cfg.nfeats, nf), np.float32),
    }
    x = rng.normal(size=(2, cfg.njoints, cfg.nfeats, nf)).astype(np.float32)
    t = rng.integers(0, 50, size=(2,))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x,
        t,
        {k: np.asarray(v) for k, v in cond.items()},
    )["params"]
    serve_cfg = ServeConfig(
        max_batch=max_batch,
        max_wait_ms=max_wait_ms,
        steps=50,
        timestep_respacing="ddim5",
        sampler="ddim",
        use_fused=False,  # Pallas fast path is TPU-only; XLA path on CPU
        data_parallel=data_parallel,
        pipeline_depth=pipeline_depth,
    )
    return build_rag_server(model, params, serve_cfg), cfg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_batcher_serves_over_dp_mesh():
    """data_parallel=8: the batcher's padded max_batch batch shards over the
    mesh and requests come back finite and correctly shaped — the serving
    scale-out path end to end."""
    batcher, cfg = _tiny_server(max_batch=8, data_parallel=8)
    try:
        audio = np.random.default_rng(2).normal(size=16000).astype(np.float32)
        reqs = [batcher.submit(audio, speaker=i % 4) for i in range(3)]
        outs = [r.wait(timeout=600) for r in reqs]
        for o in outs:
            assert o.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
            assert np.isfinite(o).all()
        assert batcher.sampler.mesh is not None
        assert dict(batcher.sampler.mesh.shape) == {"data": 8, "model": 1}
    finally:
        batcher.close()


def test_batcher_coalesces_and_pads():
    batcher, cfg = _tiny_server()
    try:
        audio = np.random.default_rng(1).normal(size=16000).astype(np.float32)
        reqs = [
            batcher.submit(audio, speaker=i % 4, guidance=1.0 + 0.5 * i)
            for i in range(3)
        ]
        outs = [r.wait(timeout=600) for r in reqs]
        for o in outs:
            assert o.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
            assert np.isfinite(o).all()
        st = batcher.stats()
        assert st["requests_served"] == 3
        assert st["batches_served"] <= 3
        # different guidance => different clips (per-sample CFG scale works)
        assert not np.allclose(outs[0], outs[1])
    finally:
        batcher.close()


def test_batcher_audio_pad_and_trim():
    batcher, cfg = _tiny_server(max_batch=2)
    try:
        short = batcher.generate(np.ones(100, np.float32), timeout=600)
        long = batcher.generate(np.ones(10**6, np.float32), timeout=600)
        assert short.shape == long.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
    finally:
        batcher.close()


def test_backpressure_rejects_when_queue_full():
    from livelyspeaker_tpu.serving import ServerOverloaded

    import queue as _q
    import time as _t

    batcher, _ = _tiny_server(max_batch=2, max_wait_ms=50.0)
    try:
        batcher.cfg.max_queue = 2
        batcher._q = _q.Queue(maxsize=2)
        # Freeze the worker mid-service by holding the device lock: it
        # dequeues the first request, its batching window expires, and it
        # blocks in _dispatch — everything submitted after stays queued.
        # (Setting _stop would conflate this with shutdown, which submit()
        # now rejects at admission.)
        with batcher._device_lock:
            batcher.submit(np.zeros(10, np.float32))
            _t.sleep(0.5)  # worker picks it up + window expires
            batcher.submit(np.zeros(10, np.float32))
            batcher.submit(np.zeros(10, np.float32))
            with pytest.raises(ServerOverloaded):
                batcher.submit(np.zeros(10, np.float32))
            assert batcher.stats()["rejected"] == 1
            assert batcher.stats()["pending"] == 2
    finally:
        batcher.close()


def test_submit_after_close_rejected():
    batcher, _ = _tiny_server(max_batch=2)
    batcher.close()
    with pytest.raises(RuntimeError):
        batcher.submit(np.zeros(10, np.float32))


def test_close_fails_queued_waiters_promptly():
    """Requests still in the pending queue when close() runs must receive a
    prompt 'shutting down' error — not hang until their client timeout."""
    import time as _t

    batcher, _ = _tiny_server(max_batch=1, max_wait_ms=1.0)
    try:
        real = batcher.sampler

        def slow(*a, **k):
            _t.sleep(0.5)
            return real(*a, **k)

        slow.model = real.model
        batcher.sampler = slow
        reqs = [
            batcher.submit(np.zeros(10, np.float32)) for _ in range(5)
        ]
    finally:
        t0 = _t.monotonic()
        batcher.close()
    for r in reqs:
        # every waiter resolves promptly: either served (the batch in
        # flight when close() ran) or failed with the shutdown error
        try:
            out = r.wait(timeout=30)
            assert np.isfinite(out).all()
        except RuntimeError as e:
            assert "shutting down" in str(e)
    assert _t.monotonic() - t0 < 60


def test_latency_percentiles_populate():
    batcher, _ = _tiny_server(max_batch=2)
    try:
        for _ in range(3):
            batcher.generate(np.zeros(10, np.float32), timeout=600)
        st = batcher.stats()
        assert st["latency_ms_p50"] > 0
        assert st["latency_ms_p99"] >= st["latency_ms_p50"]
    finally:
        batcher.close()


def test_batcher_error_propagates():
    batcher, _ = _tiny_server(max_batch=2)
    try:
        # Poison the sampler; the waiter must receive the exception.
        def boom(*a, **k):
            raise RuntimeError("kaboom")

        batcher.sampler = type("S", (), {"__call__": staticmethod(boom),
                                         "model": batcher.sampler.model})()
        req = batcher.submit(np.zeros(10, np.float32))
        with pytest.raises(RuntimeError, match="kaboom"):
            req.wait(timeout=60)
    finally:
        batcher.close()


def test_batcher_composition_with_text():
    """Requests carrying text route through the SAG composition (sketch ->
    skip-step refinement); text-less requests keep the plain path (batches
    are text-homogeneous — see test_mixed_text_plain_batches_split)."""
    import jax.numpy as jnp

    from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
    from livelyspeaker_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from livelyspeaker_tpu.models.sag import SAG
    from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline

    cfg = RAGConfig(latent_dim=64, num_layers=2, n_speakers=4)
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    x = rng.normal(size=(2, cfg.njoints, cfg.nfeats, nf)).astype(np.float32)
    cond = {
        "audio": np.zeros((2, audio_samples_for_frames(nf)), np.float32),
        "vid": np.zeros((2,), np.int64),
        "origin_x": x,
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x, rng.integers(0, 50, size=(2,)),
        {k: np.asarray(v) for k, v in cond.items()},
    )["params"]

    sag = SAG(njoints=cfg.njoints, nfeats=cfg.nfeats, latent_dim=32,
              ff_size=64, num_layers=1, num_heads=2)
    sag_params = sag.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    clip_model = CLIPTextEncoder(
        CLIPTextConfig(width=32, layers=1, heads=2, embed_dim=32)
    )
    clip_params = clip_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    pipe = LivelySpeakerPipeline(
        model, params, sag, sag_params, clip_model, clip_params,
        HashTokenizer(), steps=50, timestep_respacing="ddim5",
        skip_timesteps=2,
    )
    serve_cfg = ServeConfig(max_batch=2, max_wait_ms=100.0, steps=50,
                            timestep_respacing="ddim5", sampler="ddim",
                            use_fused=False)
    # production topology (serve.py/build_rag_server): the batcher's plain
    # sampler and the composition's refinement sampler are DISTINCT
    # RAGSampler objects — required below so the reload assertions can't
    # pass through object aliasing
    batcher = build_rag_server(model, params, serve_cfg, composition=pipe)
    assert batcher.sampler is not pipe.rag_sampler
    try:
        r_text = batcher.submit(np.zeros(100, np.float32),
                                text="waves both hands")
        r_plain = batcher.submit(np.zeros(100, np.float32))
        a = r_text.wait(timeout=600)
        b = r_plain.wait(timeout=600)
        assert a.shape == b.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
        assert np.isfinite(a).all() and np.isfinite(b).all()

        # Hot-reload with a composition attached must swap the refinement
        # stage's weights too (serving.reload_params), and text requests
        # must keep working on the new tree. Compare a leaf that is
        # non-zero at init (tree_leaves[0] is an all-zeros bias, which
        # would make the check vacuous).
        new_params = jax.tree_util.tree_map(lambda p: p * 1.5, params)
        batcher.reload_params(new_params)
        leaf_old = np.asarray(params["pose_final"]["kernel"])
        assert np.abs(leaf_old).max() > 0
        leaf_new = np.asarray(
            pipe.rag_sampler.params["pose_final"]["kernel"]
        )
        assert np.allclose(leaf_new, leaf_old * 1.5), (
            "composition refinement weights did not swap on reload"
        )
        a2 = batcher.submit(
            np.zeros(100, np.float32), text="waves both hands"
        ).wait(timeout=600)
        assert np.isfinite(a2).all()
    finally:
        batcher.close()


def test_long_form_admission_and_device_serialisation():
    """Long-form chains are admission-capped (ServerOverloaded beyond
    max_long_concurrent) and interleave with batched requests on the device
    lock instead of racing them."""
    from livelyspeaker_tpu.serving import ServerOverloaded

    batcher, cfg = _tiny_server(max_batch=2, max_wait_ms=5.0)
    batcher.cfg.max_long_concurrent = 1
    try:
        audio = np.zeros(int(80 / 15 * 16000), np.float32)
        gen = batcher.long_form_stream(audio, speaker=0)
        first = next(gen)  # admission taken; one window generated
        assert first[0] == 0
        assert batcher.stats()["long_active"] == 1

        # second chain must be rejected while the first is in flight
        gen2 = batcher.long_form_stream(audio, speaker=1)
        with pytest.raises(ServerOverloaded):
            next(gen2)

        # a batched request still completes between windows (device lock
        # is per-window, not per-chain)
        short = batcher.generate(
            np.zeros(batcher.n_samples, np.float32), timeout=120.0
        )
        assert np.isfinite(short).all()

        rest = list(gen)  # finish the chain -> admission released
        assert batcher.stats()["long_active"] == 0
        total = first[1].shape[-1] + sum(c.shape[-1] for _, c in rest)
        assert total == int(len(audio) * 15 / 16000)

        # a new chain is admitted now
        out = batcher.long_form(audio, speaker=2)
        assert out.shape[-1] == int(len(audio) * 15 / 16000)
    finally:
        batcher.close()


def test_beat_model_serving_with_emotion():
    """BEAT-family deployments: the batcher threads the per-request emotion
    id into the conditioning (num_emotions > 0), including long-form."""
    from livelyspeaker_tpu.serving import ServeConfig, build_rag_server

    cfg = RAGConfig.beat(njoints=5, latent_dim=32, num_layers=1,
                         n_speakers=4)
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    cond = {
        "audio": np.zeros((2, audio_samples_for_frames(nf)), np.float32),
        "vid": np.zeros((2,), np.int64),
        "emo": np.zeros((2,), np.int64),
        "origin_x": np.zeros((2, cfg.njoints, cfg.nfeats, nf), np.float32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        rng.normal(size=(2, cfg.njoints, cfg.nfeats, nf)).astype(np.float32),
        rng.integers(0, 50, size=(2,)),
        {k: np.asarray(v) for k, v in cond.items()},
    )["params"]
    srv = build_rag_server(model, params, ServeConfig(
        max_batch=2, max_wait_ms=5.0, steps=50, timestep_respacing="ddim4",
        sampler="ddim", use_fused=False,
    ))
    try:
        # a BEAT RAG forward requires cond["emo"]: the pre-fix server (TED
        # cond only) crashes here with a KeyError inside the worker
        out = srv.generate(np.zeros(srv.n_samples, np.float32),
                           speaker=1, emotion=3, timeout=300.0)
        assert out.shape == (cfg.njoints, cfg.nfeats, nf)
        assert np.isfinite(out).all()
        long_audio = np.zeros(int(70 / 15 * 16000), np.float32)
        long_out = srv.long_form(long_audio, emotion=2)
        assert long_out.shape[-1] == int(len(long_audio) * 15 / 16000)
        assert np.isfinite(long_out).all()
    finally:
        srv.close()


def test_concurrent_long_chains_share_batches():
    """Long-form windows ride the ordinary batch queue: two concurrent
    chains coalesce into shared executables (occupancy > 1) and both
    reproduce the exact-audio-coverage contract."""
    batcher, cfg = _tiny_server(max_batch=4, max_wait_ms=40.0)
    batcher.cfg.max_long_concurrent = 2
    try:
        audio = np.zeros(int(80 / 15 * 16000), np.float32)
        results = {}

        def run(tag, speaker):
            results[tag] = batcher.long_form(audio, speaker=speaker)

        threads = [
            threading.Thread(target=run, args=(t, s))
            for t, s in (("a", 1), ("b", 2))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        total = int(len(audio) * 15 / 16000)
        assert results["a"].shape[-1] == total
        assert results["b"].shape[-1] == total
        stats = batcher.stats()
        # chains are sequential with themselves but batch with each other
        assert stats["mean_batch_occupancy"] > 1.0, stats
    finally:
        batcher.close()


def test_http_server_roundtrip():
    spec = importlib.util.spec_from_file_location(
        "serve_cli", os.path.join(ROOT, "scripts", "serve.py")
    )
    serve_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_cli)

    batcher, cfg = _tiny_server(max_batch=2, max_wait_ms=10.0)
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        serve_cli.make_handler(batcher, reload_token="sekrit"),
    )
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"] is True

        body = json.dumps(
            {"audio": [0.1] * 1000, "speaker": 1, "guidance": 1.5}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out["shape"] == [cfg.njoints, cfg.nfeats, cfg.nframes]
        assert out["batch_size"] >= 1
        assert out["latency_ms"] > 0

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            assert json.loads(r.read())["requests_served"] >= 1

        # zero-downtime checkpoint hot-swap via the admin endpoint
        import tempfile

        from livelyspeaker_tpu.training.checkpoints import save_params_npz

        ckpt = os.path.join(tempfile.mkdtemp(), "model_v2.npz")
        save_params_npz(
            ckpt,
            jax.tree_util.tree_map(lambda p: p * 2.0, batcher.sampler.params),
        )
        # missing/wrong token -> 403, no swap
        for tok in ({}, {"token": "wrong"}):
            noauth = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/reload",
                data=json.dumps({"model_path": ckpt, **tok}).encode(),
            )
            try:
                urllib.request.urlopen(noauth, timeout=60)
                assert False, "expected HTTP 403"
            except urllib.error.HTTPError as e:
                assert e.code == 403

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/reload",
            data=json.dumps(
                {"model_path": ckpt, "token": "sekrit"}
            ).encode(),
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["ok"] is True and out["param_version"] == 1

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/reload",
            data=json.dumps(
                {"model_path": "/nonexistent.npz", "token": "sekrit"}
            ).encode(),
        )
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            assert json.loads(r.read())["param_version"] == 1

        # Prometheus exposition mirrors /stats
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE livelyspeaker_requests_served counter" in text
        assert "livelyspeaker_param_version 1.0" in text
        assert "# TYPE livelyspeaker_latency_ms_p99 gauge" in text
    finally:
        srv.shutdown()
        batcher.close()


def test_http_streaming_long_request():
    """'long' + 'stream' responds with chunked NDJSON, one line per window."""
    spec = importlib.util.spec_from_file_location(
        "serve_cli2", os.path.join(ROOT, "scripts", "serve.py")
    )
    serve_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_cli)

    batcher, cfg = _tiny_server(max_batch=2, max_wait_ms=5.0)
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0), serve_cli.make_handler(batcher))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        audio = [0.01] * int(80 / 15 * 16000)  # ~80 frames -> 3 windows
        body = json.dumps(
            {"audio": audio, "speaker": 1, "long": True, "stream": True}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(l) for l in r.read().splitlines() if l.strip()]
        assert [l["window"] for l in lines] == list(range(len(lines)))
        assert lines[0]["frames"] == cfg.nframes
        hop = cfg.nframes - cfg.n_pre_seq
        # middle windows are full hops; the last may be cropped so the
        # total matches the audio duration exactly
        assert all(l["frames"] == hop for l in lines[1:-1])
        total = sum(l["frames"] for l in lines)
        assert total == int(len(audio) * 15 / 16000)
        m0 = np.asarray(lines[0]["motion"])
        assert m0.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
        assert np.isfinite(m0).all()

        # text on a long request against a composition-less server must be
        # flagged, not silently dropped (short path already does this)
        body = json.dumps(
            {"audio": audio, "long": True, "stream": True, "text": "hi"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            lines = [json.loads(l) for l in r.read().splitlines() if l.strip()]
        assert lines[0].get("text_ignored") is True

        body = json.dumps(
            {"audio": audio, "long": True, "text": "hi"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate", data=body
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out.get("text_ignored") is True

        # /v1/reload 403 (this server has no token) must consume the body:
        # an unread body desyncs the NEXT request on a keep-alive connection
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        payload = json.dumps({"model_path": "/x.npz"})
        conn.request("POST", "/v1/reload", body=payload,
                     headers={"Content-Type": "application/json"})
        r1 = conn.getresponse()
        assert r1.status == 403
        r1.read()
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()  # would be 400 Bad request syntax pre-fix
        assert r2.status == 200 and json.loads(r2.read())["ok"] is True
        conn.close()
    finally:
        srv.shutdown()
        batcher.close()


def test_reload_params_hot_swaps_weights():
    """Checkpoint hot-reload: the swap reuses the compiled executable (params
    are traced args), takes effect for subsequent batches, bumps
    param_version, and rejects mismatched trees without disturbing service."""
    batcher, cfg = _tiny_server(max_batch=2, max_wait_ms=5.0)
    try:
        audio = np.random.default_rng(3).normal(size=10).astype(np.float32)
        out_v0 = batcher.generate(audio, timeout=300.0, speaker=1)
        assert batcher.stats()["param_version"] == 0

        # same tree, different values: scale every leaf
        old_params = batcher.sampler.params
        new_params = jax.tree_util.tree_map(lambda p: p * 1.5, old_params)
        n_exec_before = len(batcher.sampler._jitted)
        version = batcher.reload_params(new_params)
        assert version == 1
        assert batcher.stats()["param_version"] == 1
        out_v1 = batcher.generate(audio, timeout=300.0, speaker=1)
        assert len(batcher.sampler._jitted) == n_exec_before, (
            "reload must reuse the compiled executables"
        )
        assert out_v1.shape == out_v0.shape
        assert np.isfinite(out_v1).all()
        assert not np.allclose(out_v1, out_v0), (
            "new weights must change the output"
        )

        # wrong tree structure -> eager failure, service unaffected
        with pytest.raises(ValueError):
            batcher.reload_params({"bogus": np.zeros(3)})
        # wrong leaf shape, same structure -> eager failure too
        bad = jax.tree_util.tree_map(
            lambda p: np.zeros(p.shape + (2,), p.dtype), old_params
        )
        with pytest.raises(ValueError):
            batcher.reload_params(bad)
        assert batcher.stats()["param_version"] == 1
        assert np.isfinite(batcher.generate(audio, timeout=300.0)).all()
    finally:
        batcher.close()


def test_reload_concurrent_with_traffic():
    """Hot-swapping while requests stream must never produce an error or a
    half-updated tree: every response is finite and service stats stay
    consistent across multiple reloads."""
    batcher, cfg = _tiny_server(max_batch=2, max_wait_ms=5.0,
                                pipeline_depth=2)
    try:
        base = batcher.sampler.params
        audio = np.random.default_rng(5).normal(size=10).astype(np.float32)
        # warm the executable so the traffic below is steady-state
        batcher.generate(audio, timeout=300.0)

        errors = []

        def client(n):
            for i in range(n):
                try:
                    out = batcher.generate(audio, timeout=300.0, speaker=i % 4)
                    assert np.isfinite(out).all()
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

        threads = [threading.Thread(target=client, args=(6,))
                   for _ in range(3)]
        for t in threads:
            t.start()
        for v in range(4):
            batcher.reload_params(
                jax.tree_util.tree_map(lambda p: p * (1.0 + 0.1 * v), base)
            )
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        st = batcher.stats()
        assert st["param_version"] == 4
        assert st["requests_served"] >= 19
    finally:
        batcher.close()


def test_pipelined_dispatch_overlaps_readback():
    """pipeline_depth >= 1: the worker dispatches batch N+1 while batch N's
    readback is still in the collector's hands; depth 0 is the synchronous
    round-trip worker (dispatch N+1 strictly after N finishes)."""
    import time

    class _SlowReadback:
        def __init__(self, arr, delay, finish_times):
            self._arr = arr
            self._delay = delay
            self._finish = finish_times

        def __array__(self, dtype=None):
            time.sleep(self._delay)
            self._finish.append(time.monotonic())
            a = self._arr
            return a.astype(dtype) if dtype is not None else a

    class _FakeSampler:
        """Instant dispatch, slow readback — models the async device."""

        def __init__(self, model, shape, delay):
            self.model = model
            self._shape = shape
            self._delay = delay
            self.dispatch_times = []
            self.finish_times = []

        def __call__(self, cond, rng, *, guidance):
            self.dispatch_times.append(time.monotonic())
            b = int(np.asarray(cond["vid"]).shape[0])
            return _SlowReadback(
                np.zeros((b,) + self._shape, np.float32),
                self._delay,
                self.finish_times,
            )

    # depth 8 = the swept serving throughput optimum (BASELINE.md)
    for depth, want_overlap in ((0, False), (1, True), (2, True), (8, True)):
        batcher, cfg = _tiny_server(
            max_batch=1, max_wait_ms=1.0, pipeline_depth=depth
        )
        try:
            fake = _FakeSampler(
                batcher.sampler.model,
                (cfg.njoints, cfg.nfeats, cfg.nframes),
                delay=0.25,
            )
            batcher.sampler = fake
            reqs = [
                batcher.submit(np.zeros(10, np.float32), speaker=i % 4)
                for i in range(3)
            ]
            for r in reqs:
                out = r.wait(timeout=60)
                assert out.shape == (cfg.njoints, cfg.nfeats, cfg.nframes)
            assert len(fake.dispatch_times) == 3
            assert len(fake.finish_times) == 3
            overlapped = fake.dispatch_times[1] < fake.finish_times[0]
            assert overlapped == want_overlap, (
                f"depth={depth}: dispatch[1]={fake.dispatch_times[1]:.3f} "
                f"finish[0]={fake.finish_times[0]:.3f}"
            )
            st = batcher.stats()
            assert st["requests_served"] == 3
            assert st["batches_served"] == 3
            assert "inflight_batches" in st
        finally:
            batcher.close()


def test_mixed_text_plain_batches_split():
    """With a composition attached, text and plain requests must NOT share
    a batch: the composition warm-starts EVERY row from the SAG sketch, so
    a coalesced plain request would silently get composition output. The
    worker carries the odd request into the next (homogeneous) batch."""
    import jax.numpy as jnp

    from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
    from livelyspeaker_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from livelyspeaker_tpu.models.sag import SAG
    from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline
    from livelyspeaker_tpu.serving import GestureBatcher

    cfg = RAGConfig(latent_dim=64, num_layers=1, n_speakers=4)
    model = RAG(cfg)
    nf = cfg.nframes
    x = np.zeros((2, cfg.njoints, cfg.nfeats, nf), np.float32)
    cond = {
        "audio": np.zeros((2, audio_samples_for_frames(nf)), np.float32),
        "vid": np.zeros((2,), np.int64),
        "origin_x": x,
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x, np.zeros((2,), np.int64),
        {k: np.asarray(v) for k, v in cond.items()},
    )["params"]
    sag = SAG(njoints=cfg.njoints, nfeats=cfg.nfeats, latent_dim=32,
              ff_size=64, num_layers=1, num_heads=2)
    sag_params = sag.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    clip_model = CLIPTextEncoder(
        CLIPTextConfig(width=32, layers=1, heads=2, embed_dim=32)
    )
    clip_params = clip_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    pipe = LivelySpeakerPipeline(
        model, params, sag, sag_params, clip_model, clip_params,
        HashTokenizer(), steps=50, timestep_respacing="ddim5",
        skip_timesteps=2,
    )
    serve_cfg = ServeConfig(max_batch=4, max_wait_ms=2000.0, steps=50,
                            timestep_respacing="ddim5", sampler="ddim",
                            use_fused=False)
    batcher = GestureBatcher(pipe.rag_sampler, serve_cfg, composition=pipe)
    try:
        seen = []  # (kind, n_text, n_plain) per dispatched batch

        orig_dispatch = batcher._dispatch

        def spy(batch):
            n_text = sum(1 for r in batch if r.text)
            seen.append((n_text, len(batch) - n_text))
            return orig_dispatch(batch)

        batcher._dispatch = spy
        reqs = [
            batcher.submit(np.zeros(100, np.float32),
                           text=("hello" if i % 2 == 0 else None))
            for i in range(4)
        ]
        for r in reqs:
            assert np.isfinite(r.wait(timeout=600)).all()
        # every dispatched batch is homogeneous and both kinds dispatched
        assert all(t == 0 or p == 0 for t, p in seen), seen
        assert any(t > 0 for t, _ in seen) and any(p > 0 for _, p in seen), (
            seen
        )
    finally:
        batcher.close()

def test_full_bucket_dispatches_before_window():
    """A bucket that reaches max_batch dispatches immediately — the
    batching window bounds latency for PARTIAL batches only, it is not a
    minimum dwell time."""
    import time as _t

    batcher, _ = _tiny_server(max_batch=2, max_wait_ms=60_000.0)
    try:
        t0 = _t.monotonic()
        reqs = [batcher.submit(np.zeros(10, np.float32)) for _ in range(2)]
        for r in reqs:
            assert np.isfinite(r.wait(timeout=120)).all()
        # compile dominates; anywhere under the 60 s window proves the
        # full-bucket fast path fired instead of the expiry timer
        assert _t.monotonic() - t0 < 45.0
    finally:
        batcher.close()


def test_close_resolves_bucketed_waiters_promptly():
    """A request parked in a scheduler bucket (batch not full, window far
    in the future) must resolve promptly when close() runs — served by the
    sentinel drain or failed with the shutdown error — not sleep out its
    60 s batching window."""
    import time as _t

    batcher, _ = _tiny_server(max_batch=4, max_wait_ms=60_000.0)
    try:
        req = batcher.submit(np.zeros(10, np.float32))
        # let the worker move it from the intake queue into its bucket
        deadline = _t.monotonic() + 10.0
        while batcher._stash_len == 0 and _t.monotonic() < deadline:
            _t.sleep(0.01)
        assert batcher._stash_len == 1
    finally:
        t0 = _t.monotonic()
        batcher.close()
    assert _t.monotonic() - t0 < 45.0
    try:
        out = req.wait(timeout=45)
        assert np.isfinite(out).all()
    except RuntimeError as e:
        assert "shutting down" in str(e)
