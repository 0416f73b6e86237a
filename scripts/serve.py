#!/usr/bin/env python
"""HTTP gesture-generation server (production serving front-end).

JSON API over stdlib ThreadingHTTPServer; the device work runs through the
dynamic batcher in ``livelyspeaker_tpu/serving.py`` (fixed-shape batches,
one compiled executable, per-sample guidance).

    POST /v1/generate   {"audio": [f32...] | "audio_b64": base64 f32le,
                         "speaker": 0, "guidance": 1.5, "text": "...",
                         "emotion": 0, "long": false}
        "emotion" conditions BEAT-family models (num_emotions > 0 in the
        checkpoint's args.json); ignored for TED models.
        -> {"motion": [[...]...], "shape": [J, F, T], "batch_size": n,
            "latency_ms": ...}
        "long": true stitches the FULL audio into one continuous stream via
        seed-frame conditioning (generate_long_form) instead of one window;
        add "stream": true for chunked NDJSON (one line per window, so the
        client animates while later windows still sample).
        503 + {"error": ...} when the pending queue is full (backpressure).
    GET  /healthz       {"ok": true, "devices": [...]}
    GET  /stats         occupancy, pending/rejected, latency p50/p95/p99,
                        param_version
    GET  /metrics       the same numbers in Prometheus text exposition
                        format (livelyspeaker_* gauges/counters)
    POST /v1/reload     {"model_path": "ckpts/TED/model_new.npz",
                         "token": "..."}
        Zero-downtime checkpoint hot-swap (e.g. roll serving onto a newer
        or EMA checkpoint): weights are traced arguments of the compiled
        sampler, so the swap reuses every executable — no recompile, no
        dropped requests. Same param tree required (shape mismatch -> 400).
        Admin-gated: disabled unless the server was started with
        --reload_token, and the request must echo the token (403 otherwise).

Example:
    python scripts/serve.py --model_path ckpts/TED/RAG.npz --port 8000
    curl -s localhost:8000/v1/generate -d '{"audio": [0.0], "speaker": 3}'

The reference has no serving path (research eval loops only,
scripts/test_RAG_ted.py:142-193).
"""

import argparse
import base64
import json
import os
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import numpy as np

from livelyspeaker_tpu.serving import ServerOverloaded


def make_handler(batcher, reload_token: str = ""):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # required for chunked streaming

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet access log
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._json(
                    200,
                    {"ok": True, "devices": [str(d) for d in jax.devices()]},
                )
            elif self.path == "/stats":
                self._json(200, batcher.stats())
            elif self.path == "/metrics":
                # Prometheus text exposition of the same numbers /stats
                # serves as JSON, so a standard scraper needs no adapter.
                st = batcher.stats()
                counters = {"batches_served", "requests_served", "rejected"}
                lines = []
                for k, v in st.items():
                    name = f"livelyspeaker_{k}"
                    kind = "counter" if k in counters else "gauge"
                    lines.append(f"# TYPE {name} {kind}")
                    lines.append(f"{name} {float(v)}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/v1/reload":
                # Admin: hot-swap model weights with zero downtime. The
                # endpoint loads weights from a filesystem path, so it is
                # DISABLED unless the operator started the server with
                # --reload_token; requests must echo the token. (The
                # generate port is client-facing — an unauthenticated
                # reload would let any client swap the production model.)
                # The checkpoint must have the same param tree
                # (shapes/dtypes) as the serving model —
                # RAGSampler.update_params validates eagerly and a
                # mismatch is a clean 400, traffic unaffected.
                try:
                    # Read the body BEFORE any early response: an unread
                    # body stays in the socket buffer and desyncs the next
                    # request on a keep-alive connection.
                    length = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(length)
                    if not reload_token:
                        self._json(
                            403, {"error": "reload disabled: start the "
                                           "server with --reload_token"})
                        return
                    req = json.loads(body or b"{}")
                    import hmac

                    if not hmac.compare_digest(
                        str(req.get("token", "")), reload_token
                    ):
                        self._json(403, {"error": "bad reload token"})
                        return
                    from livelyspeaker_tpu.training.checkpoints import (
                        load_params_npz,
                    )
                    new_params = load_params_npz(req["model_path"])
                    version = batcher.reload_params(new_params)
                    self._json(
                        200,
                        {"ok": True, "param_version": version,
                         "model_path": req["model_path"]},
                    )
                except Exception as e:  # noqa: BLE001 — report to client
                    self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path != "/v1/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if "audio_b64" in req:
                    audio = np.frombuffer(
                        base64.b64decode(req["audio_b64"]), np.float32
                    )
                else:
                    audio = np.asarray(req.get("audio", []), np.float32)
                t0 = time.monotonic()
                # Long-form text: forwarded as the sentences track (one
                # sentence reused for every window, matching the short
                # path's single-text semantics); flagged when the server
                # has no composition loaded, like the short path does.
                long_sentences = (
                    [str(req["text"])] if req.get("text") else None
                )
                long_text_ignored = bool(
                    req.get("text") and batcher.composition is None
                )
                if req.get("long") and req.get("stream"):
                    # Chunked streaming: one JSON line per completed window
                    # ({"window": i, "motion": [...], "frames": K}), so the
                    # client can animate while later windows still sample.
                    # Windows ride the ordinary batch queue (concurrent
                    # chains coalesce); admission-controlled
                    # (max_long_concurrent -> 503).
                    gen = batcher.long_form_stream(
                        audio,
                        speaker=int(req.get("speaker", 0)),
                        emotion=int(req.get("emotion", 0)),
                        guidance=(
                            float(req["guidance"]) if "guidance" in req
                            else None
                        ),
                        sentences=long_sentences,
                    )
                    # pull the first window BEFORE committing the status
                    # line: admission rejection must still be a clean 503
                    first = next(gen, None)

                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "application/x-ndjson"
                    )
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def write_chunk(obj):
                        data = (json.dumps(obj) + "\n").encode()
                        self.wfile.write(
                            f"{len(data):X}\r\n".encode() + data + b"\r\n"
                        )
                        self.wfile.flush()

                    import itertools

                    # The 200 + chunked headers are committed: any error
                    # from here on must be reported IN the stream (an
                    # "error" line + the terminating 0-chunk), never via a
                    # second HTTP response into the open body — that would
                    # desync the client's chunked decoder.
                    try:
                        for w, chunk in itertools.chain(
                            [first] if first is not None else [], gen
                        ):
                            line = {
                                "window": w,
                                "frames": int(chunk.shape[-1]),
                                "motion": chunk.tolist(),
                            }
                            if w == 0 and long_text_ignored:
                                line["text_ignored"] = True
                            write_chunk(line)
                    except Exception as e:  # noqa: BLE001
                        try:
                            write_chunk(
                                {"error": f"{type(e).__name__}: {e}"}
                            )
                        except OSError:
                            return  # client went away mid-stream
                    self.wfile.write(b"0\r\n\r\n")
                    return
                if req.get("long"):
                    # Arbitrary-length audio -> one stitched stream. A
                    # chain is sequential with itself but its windows batch
                    # with all other traffic; admission is capped
                    # (max_long_concurrent).
                    motion = batcher.long_form(
                        audio,
                        speaker=int(req.get("speaker", 0)),
                        emotion=int(req.get("emotion", 0)),
                        guidance=(
                            float(req["guidance"]) if "guidance" in req
                            else None
                        ),
                        sentences=long_sentences,
                    )
                    batch_size = 1
                else:
                    r = batcher.submit(
                        audio,
                        speaker=int(req.get("speaker", 0)),
                        emotion=int(req.get("emotion", 0)),
                        guidance=(
                            float(req["guidance"])
                            if "guidance" in req
                            else None
                        ),
                        text=req.get("text"),
                    )
                    motion = r.wait(timeout=float(req.get("timeout", 300.0)))
                    batch_size = r.batch_size
                resp = {
                    "motion": motion.tolist(),
                    "shape": list(motion.shape),
                    "batch_size": batch_size,
                    "latency_ms": (time.monotonic() - t0) * 1e3,
                }
                if req.get("text") and batcher.composition is None:
                    # RAG-only deployment: no SAG/CLIP checkpoints loaded.
                    resp["text_ignored"] = True
                self._json(200, resp)
            except ServerOverloaded as e:
                self._json(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — report to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="dispatched-but-uncollected batches that may queue; "
                        "0 = synchronous round-trip worker; 2 = measured "
                        "best (serving.py: ServeConfig.pipeline_depth)")
    p.add_argument("--max_queue", type=int, default=128,
                   help="pending-request cap; beyond it requests get 503")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--timestep_respacing", type=str, default="ddim20")
    p.add_argument("--sampler", type=str, default="dpmpp",
                   choices=["ddpm", "ddim", "plms", "dpmpp"])
    p.add_argument("--no_fused", action="store_true")
    p.add_argument("--guidance", type=float, default=1.5)
    p.add_argument("--sag_path", type=str, default="",
                   help="SAG checkpoint: enables text-conditioned requests "
                        "(full LivelySpeaker composition, skip=80)")
    p.add_argument("--clip_path", type=str, default="")
    p.add_argument("--bpe_path", type=str, default="")
    p.add_argument("--skip_steps", type=int, default=80)
    p.add_argument("--guidance_schedule", type=str, default=None,
                   help="per-step CFG decay for composition requests "
                        "('const'|'linear'|'cosine'|'step:<t0>'); preserves "
                        "the SAG sketch at guidance>1 (BASELINE.md)")
    p.add_argument("--composition_respacing", type=str, default="ddim100",
                   help="respacing for text-carrying composition requests, "
                        "independent of the fast-path --timestep_respacing: "
                        "--skip_steps is in respaced-grid units, so the "
                        "reference's skip=80 presumes the ddim100 grid "
                        "(test_LivelySpeaker_ted.py:212) and would be out "
                        "of range on the ddim20 fast path")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard each served batch over this many local "
                        "devices (max_batch must be a multiple)")
    p.add_argument("--reload_token", type=str, default="",
                   help="enable POST /v1/reload (zero-downtime checkpoint "
                        "hot-swap); requests must carry this token. Empty "
                        "(default) disables the endpoint — it loads weights "
                        "from a filesystem path, so it must not be open to "
                        "generate-API clients")
    args = p.parse_args()

    from livelyspeaker_tpu.models import RAG, RAGConfig
    from livelyspeaker_tpu.serving import (
        ServeConfig,
        build_rag_server,
        serving_mesh,
    )
    from livelyspeaker_tpu.training.checkpoints import load_args, load_params_npz

    try:
        saved = load_args(args.model_path)  # args.json next to the ckpt
    except FileNotFoundError:
        saved = {}
    cfg = RAGConfig(
        njoints=saved.get("njoints", 9),
        nfeats=saved.get("nfeats", 3),
        nframes=saved.get("n_poses", 34),
        latent_dim=saved.get("latent_dim", 512),
        num_layers=saved.get("layers", 8),
        mlpact=saved.get("mlpact", "silu"),
        n_speakers=saved.get("n_speakers", 1400),
        num_emotions=saved.get("num_emotions", 0),
        cond_mask_prob=saved.get("cond_mask_prob", 0.1),
    )
    model = RAG(cfg)
    params = load_params_npz(args.model_path)

    serve_cfg = ServeConfig(
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue,
        default_guidance=args.guidance,
        steps=args.steps,
        timestep_respacing=args.timestep_respacing or None,
        sampler=args.sampler,
        use_fused=not args.no_fused,
        data_parallel=args.data_parallel,
        pipeline_depth=args.pipeline_depth,
    )

    composition = None
    if args.sag_path:
        # Full LivelySpeaker composition for text-carrying requests:
        # SAG sketch -> q_sample warm start -> skip-step RAG refinement.
        from livelyspeaker_tpu.data.clip_tokenizer import (
            CLIPTokenizer,
            HashTokenizer,
        )
        from livelyspeaker_tpu.models.clip_text import (
            CLIPTextEncoder,
            clip_text_params_from_torch,
        )
        from livelyspeaker_tpu.models.sag import SAG
        from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline

        sag = SAG(njoints=cfg.njoints, nfeats=cfg.nfeats, latent_dim=512)
        sag_params = load_params_npz(args.sag_path)
        clip_model = CLIPTextEncoder()
        if args.clip_path:
            import jax
            import torch

            sd = torch.load(args.clip_path, map_location="cpu",
                            weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            clip_params = clip_text_params_from_torch(sd)
        else:
            import jax
            import jax.numpy as jnp

            clip_params = clip_model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32)
            )["params"]
        tok = (
            CLIPTokenizer(args.bpe_path) if args.bpe_path else HashTokenizer()
        )
        # One shared mesh for the batcher's sampler AND the composition
        # (serving.py: serving_mesh) — text-carrying batches must shard
        # exactly like plain ones.
        composition = LivelySpeakerPipeline(
            model, params, sag, sag_params, clip_model, clip_params, tok,
            steps=args.steps,
            timestep_respacing=args.composition_respacing,
            skip_timesteps=args.skip_steps,
            mesh=serving_mesh(serve_cfg),
            guidance_schedule=args.guidance_schedule,
            use_fused=not args.no_fused,  # same fast path as the batcher
        )
        n_spaced = int(composition.rag_sampler.sched.num_timesteps)
        if not 0 < n_spaced - args.skip_steps:
            raise SystemExit(
                f"--skip_steps {args.skip_steps} leaves no refinement steps "
                f"on the {args.composition_respacing} grid ({n_spaced} "
                f"steps); lower --skip_steps or use a finer "
                f"--composition_respacing"
            )

    batcher = build_rag_server(
        model,
        params,
        composition=composition,
        cfg=serve_cfg,
    )
    # Warm the executable before accepting traffic. First compile of the
    # sampling scan can take minutes on remote-dispatch hosts; don't let the
    # default request timeout kill the server during it.
    batcher.generate(np.zeros(16000, np.float32), timeout=3600.0)
    if composition is not None:
        # Warm the composition executable too, THROUGH the batcher — the
        # real text path pads to max_batch and traces per-sample guidance
        # arrays, so only a batcher-routed request compiles the executable
        # requests will actually hit. Otherwise the first text-carrying
        # request eats the whole compile (measured 50-68 s for the fused
        # pipeline through the tunnel).
        batcher.generate(np.zeros(16000, np.float32), text="warmup",
                         timeout=3600.0)
    print(f"warm; serving on http://{args.host}:{args.port}")

    srv = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(batcher, reload_token=args.reload_token),
    )

    # Graceful termination under orchestration (SIGTERM from k8s etc.):
    # stop accepting, drain in-flight batches, then exit 0.
    import signal
    import threading

    def _shutdown(signum, frame):
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        print("server stopped; batcher drained")


if __name__ == "__main__":
    main()
