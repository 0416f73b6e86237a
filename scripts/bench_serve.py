#!/usr/bin/env python
"""Serving throughput benchmark: sustained burst through the dynamic batcher.

Measures end-to-end served clips/s (submit -> result fanned out) for the
production serving stack (serving.py: GestureBatcher) on the flagship TED
config, at a given ``--pipeline_depth`` — the dispatch/collect split that
overlaps host batch assembly + readback with device execution. The server
was measured host-dispatch-bound at production shapes (docs/DESIGN.md §11:
~70 ms/batch round-trip vs ~10 ms device work at max_batch=16), so the
depth-0 vs depth-1 comparison is the honest measure of that overlap.

The reference has no serving path at all (its eval scripts loop a fixed
dataset, scripts/test_RAG_ted.py:142-193).

Usage:
    python scripts/bench_serve.py --max_batch 16 --burst 256 \
        --pipeline_depth 0   # synchronous baseline
    python scripts/bench_serve.py --max_batch 16 --burst 256 \
        --pipeline_depth 1   # pipelined
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livelyspeaker_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="ted",
                   choices=["ted", "beat"],
                   help="beat serves the 47x6 rot6d / emotion-conditioned "
                        "config (test_RAG_beat.py shape) — a different "
                        "fused-kernel lowering than the TED seq")
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--burst", type=int, default=256)
    p.add_argument("--clients", type=int, default=8,
                   help="submitter threads (avoids the single-client "
                        "submission limiter seen in the round-2 runs)")
    p.add_argument("--pipeline_depth", type=int, default=1)
    p.add_argument("--single", type=int, default=0,
                   help="also measure N sequential single requests (the "
                        "unloaded service-latency SLO: batching window + "
                        "padded chain + readback, no queueing)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--timestep_respacing", type=str, default="ddim20")
    p.add_argument("--sampler", type=str, default="dpmpp")
    p.add_argument("--no_fused", action="store_true")
    p.add_argument("--text_frac", type=float, default=0.0,
                   help="fraction of burst requests carrying text: routes "
                        "them through the SAG->skip-80 composition "
                        "(random-init SAG/CLIP towers — throughput bench, "
                        "not quality); 0 disables the composition")
    p.add_argument("--composition_respacing", type=str, default="ddim100",
                   help="respacing for the composition (skip 80 presumes "
                        "the ddim100 grid; see serve.py)")
    args = p.parse_args()

    import jax

    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
    )
    from livelyspeaker_tpu.serving import ServeConfig, build_rag_server

    print(f"devices: {jax.devices()}", file=sys.stderr)
    if args.dataset == "beat":
        cfg = RAGConfig.beat(
            latent_dim=args.latent_dim, num_layers=args.layers, n_speakers=30
        )
    else:
        cfg = RAGConfig.ted(
            latent_dim=args.latent_dim, num_layers=args.layers
        )
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    nf = cfg.nframes
    n_samples = audio_samples_for_frames(nf)
    import jax.numpy as jnp

    x = jnp.zeros((2, cfg.njoints, cfg.nfeats, nf))
    init_cond = {
        "audio": jnp.zeros((2, n_samples)),
        "vid": jnp.zeros((2,), jnp.int32),
        "origin_x": x,
    }
    if cfg.num_emotions:
        init_cond["emo"] = jnp.zeros((2,), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        x,
        jnp.zeros((2,), jnp.int32),
        init_cond,
    )["params"]

    on_tpu = jax.devices()[0].platform == "tpu"
    serve_cfg = ServeConfig(
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        steps=args.steps,
        timestep_respacing=args.timestep_respacing or None,
        sampler=args.sampler,
        use_fused=on_tpu and not args.no_fused,
        max_queue=max(128, args.burst),
        pipeline_depth=args.pipeline_depth,
    )
    composition = None
    if args.text_frac > 0:
        from livelyspeaker_tpu.data.clip_tokenizer import HashTokenizer
        from livelyspeaker_tpu.models.clip_text import CLIPTextEncoder
        from livelyspeaker_tpu.models.sag import SAG
        from livelyspeaker_tpu.pipeline import LivelySpeakerPipeline

        sag = SAG(njoints=cfg.njoints, nfeats=cfg.nfeats, latent_dim=512)
        sag_params = sag.init(jax.random.PRNGKey(7), x)["params"]
        clip_model = CLIPTextEncoder()
        clip_params = clip_model.init(
            jax.random.PRNGKey(8), jnp.zeros((1, 77), jnp.int32)
        )["params"]
        composition = LivelySpeakerPipeline(
            model, params, sag, sag_params, clip_model, clip_params,
            HashTokenizer(), steps=args.steps,
            timestep_respacing=args.composition_respacing,
            skip_timesteps=80, use_fused=serve_cfg.use_fused,
        )
        n_spaced = int(composition.rag_sampler.sched.num_timesteps)
        if n_spaced - 80 <= 0:
            raise SystemExit(
                f"skip 80 leaves no refinement steps on the "
                f"{args.composition_respacing} grid ({n_spaced} steps); "
                f"use a finer --composition_respacing (see serve.py)"
            )
    batcher = build_rag_server(
        model, params, serve_cfg, composition=composition
    )

    t0 = time.time()
    batcher.generate(np.zeros(n_samples, np.float32), timeout=3600.0)
    if composition is not None:
        batcher.generate(np.zeros(n_samples, np.float32), text="warmup",
                         timeout=3600.0)
    print(f"warm compile: {time.time() - t0:.1f}s", file=sys.stderr)
    # Drop the warm-up from the reported stats: its compile-time latency
    # would otherwise become the p99 and its occupancy-1 batch would
    # understate mean occupancy.
    batcher.reset_stats()

    if args.single:
        lats = []
        wav1 = rng.normal(size=n_samples).astype(np.float32)
        for i in range(args.single):
            t0 = time.time()
            out = batcher.generate(wav1, timeout=600.0, speaker=i % 10)
            lats.append((time.time() - t0) * 1e3)
            assert np.isfinite(out).all()
        lats.sort()
        print(
            f"single-request latency (n={args.single}, max_batch="
            f"{args.max_batch}, wait={args.max_wait_ms}ms): "
            f"p50={lats[len(lats) // 2]:.0f}ms min={lats[0]:.0f}ms "
            f"max={lats[-1]:.0f}ms"
        )
        batcher.reset_stats()

    audio = rng.normal(size=(args.burst, n_samples)).astype(np.float32)
    speakers = rng.integers(0, cfg.n_speakers, size=args.burst)
    guid = rng.choice([1.0, 1.5, 2.0], size=args.burst)

    import threading

    reqs = [None] * args.burst
    idx_lock = threading.Lock()
    next_idx = [0]

    def submit_worker():
        while True:
            with idx_lock:
                i = next_idx[0]
                if i >= args.burst:
                    return
                next_idx[0] += 1
            # Bresenham-spread the text requests evenly through the burst
            # (blocked runs would leave the homogeneous-batch splitter
            # nearly unexercised — the thing this flag measures)
            import math

            with_text = args.text_frac > 0 and (
                math.floor(i * args.text_frac)
                > math.floor((i - 1) * args.text_frac)
            )
            text = "a person waves both hands" if with_text else None
            reqs[i] = batcher.submit(
                audio[i], speaker=int(speakers[i]), guidance=float(guid[i]),
                emotion=int(i % max(cfg.num_emotions, 1)),
                text=text,
            )

    t0 = time.time()
    threads = [
        threading.Thread(target=submit_worker) for _ in range(args.clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    t_submitted = time.time() - t0
    for r in reqs:
        out = r.wait(timeout=3600.0)
        assert np.isfinite(out).all()
    elapsed = time.time() - t0
    st = batcher.stats()
    batcher.close()

    text_tag = (f" text_frac={args.text_frac}" if args.text_frac > 0 else "")
    print(
        f"[{args.dataset}{text_tag}] burst={args.burst} "
        f"max_batch={args.max_batch} "
        f"depth={args.pipeline_depth} sampler={args.sampler}-"
        f"{args.timestep_respacing}: {elapsed:.3f}s "
        f"({args.burst / elapsed:.1f} clips/s), submit drain "
        f"{t_submitted:.3f}s, occupancy "
        f"{st['mean_batch_occupancy']:.1f}/{args.max_batch}, "
        f"p50={st['latency_ms_p50']:.0f}ms p95={st['latency_ms_p95']:.0f}ms "
        f"p99={st['latency_ms_p99']:.0f}ms",
    )


if __name__ == "__main__":
    main()
