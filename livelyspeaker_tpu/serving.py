"""Production serving: dynamic-batching gesture generation.

The reference is research code with no serving story (its eval scripts loop
over a fixed dataset, ``scripts/test_RAG_ted.py:142-193``); a production
deployment needs the opposite shape: requests arrive one at a time, but the
TPU wants large fixed-shape batches. This module bridges the two:

* :class:`GestureBatcher` — a background worker that coalesces concurrent
  requests into one fixed-size batch (pad-to-``max_batch``, so exactly ONE
  executable is ever compiled per server), runs the jitted sampler once, and
  fans results back out. Per-sample guidance scales ride the CFG wrapper's
  [B]-shaped scale support (models/cfg.py:61-63), so requests with different
  guidance share a batch.
* serving defaults favor the measured-best quality/latency point:
  DPM-Solver++(2M) at 20 steps — *better* FGD than the reference's DDIM-100
  eval protocol at 5x fewer denoiser passes (docs/DESIGN.md §9).

The HTTP front-end lives in ``scripts/serve.py`` (stdlib ThreadingHTTPServer,
JSON API); this module is transport-agnostic.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models import audio_samples_for_frames
from .pipeline import LivelySpeakerPipeline, RAGSampler

__all__ = [
    "ServeConfig",
    "ServerOverloaded",
    "GestureRequest",
    "GestureBatcher",
    "build_rag_server",
    "serving_mesh",
]


@dataclass
class ServeConfig:
    max_batch: int = 8
    max_wait_ms: float = 25.0
    default_guidance: float = 1.5
    steps: int = 1000
    timestep_respacing: Optional[str] = "ddim20"
    sampler: str = "dpmpp"  # measured: beats ddim100 FGD at 5x fewer passes
    use_fused: bool = True  # Pallas fused backbone on TPU
    seed: int = 0
    # Backpressure: pending requests beyond this raise ServerOverloaded at
    # submit time (-> HTTP 503) instead of growing latency unboundedly.
    max_queue: int = 128
    # Long-form requests run a sequential window chain on the caller's
    # thread; cap how many may be in flight (each window still serialises
    # on the device lock with the batch worker).
    max_long_concurrent: int = 2
    # Dispatch/collect pipelining: how many dispatched-but-uncollected
    # batches may queue for the collector thread (total in flight is at most
    # depth+2: the queue, plus the one the collector is reading back, plus
    # the one the worker has dispatched and is blocked handing over). JAX
    # dispatch is async, so
    # with depth >= 1 the worker gathers + dispatches batch N+1 while batch
    # N executes and its results ride the host link back — the server was
    # measured host-dispatch-bound (~70 ms/batch round-trip vs ~10 ms of
    # device work at max_batch=16, docs/DESIGN.md §11), so overlapping the
    # two is the throughput lever. Depth 0 restores the fully synchronous
    # round-trip worker. Measured (256-request burst, max_batch=16, v5e):
    # depth 0 = 166 clips/s p50 852 ms, depth 1 = 215/732, depth 2 =
    # 243/614 — deeper also CUTS latency because requests queue less behind
    # the un-overlapped readback; the in-flight buffers are a few hundred
    # KB each, so the default is the measured best.
    pipeline_depth: int = 2
    # Shard each served batch over the first `data_parallel` local devices
    # (parallel/sampling.py). max_batch must be a multiple; the batcher
    # already pads every batch to exactly max_batch rows.
    data_parallel: int = 1


class ServerOverloaded(RuntimeError):
    """Request rejected at admission: the pending queue is full."""


@dataclass
class GestureRequest:
    audio: np.ndarray  # [samples] f32 waveform @ 16 kHz (padded/trimmed)
    speaker: int = 0
    guidance: Optional[float] = None
    text: Optional[str] = None  # routes through the SAG composition if set
    emotion: int = 0  # BEAT models (num_emotions > 0); ignored for TED
    # [njoints, nfeats, n_pre_seq] seed frames for window-chained long-form
    # generation (the reference's seed mechanism, RAG.py:80-96)
    seed_frames: Optional[np.ndarray] = None
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None  # [njoints, nfeats, nframes]
    error: Optional[BaseException] = None
    batch_size: int = 0  # observability: how many requests shared the batch

    def wait(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self.done.wait(timeout):
            raise TimeoutError("gesture generation timed out")
        if self.error is not None:
            raise self.error
        assert self.result is not None
        return self.result


_SHUTDOWN = object()


class GestureBatcher:
    """Coalesce concurrent requests into fixed-shape sampler batches.

    Two stages pipeline the host work against the device (ServeConfig.
    pipeline_depth): the dispatch worker drains the queue up to ``max_batch``
    requests (waiting at most ``max_wait_ms`` after the first), pads the
    batch to exactly ``max_batch`` rows and dispatches the sampler (JAX
    dispatch is async — the call returns while the device still executes);
    the collector thread blocks on the in-flight outputs in order, reads
    them back and fans results out. While batch N executes + rides the host
    link back, the worker is already gathering and dispatching batch N+1 —
    the server is host-dispatch-bound at production shapes (DESIGN §11), so
    this overlap, not device speed, sets throughput. Padding rows reuse
    row 0's conditioning and are discarded — the cost of a padded row is
    already paid by the fixed executable shape.
    """

    def __init__(
        self,
        sampler: RAGSampler,
        cfg: ServeConfig,
        *,
        composition: Optional[LivelySpeakerPipeline] = None,
    ):
        self.sampler = sampler
        self.cfg = cfg
        self.composition = composition
        c = sampler.model.cfg
        self.n_samples = audio_samples_for_frames(c.nframes)
        self._shape = (c.njoints, c.nfeats, c.nframes)
        self._q: "queue.Queue" = queue.Queue(maxsize=cfg.max_queue)
        self._stop = threading.Event()
        self._key = jax.random.PRNGKey(cfg.seed)
        self._batches_served = 0
        self._requests_served = 0
        self._rejected = 0
        # worker-owned count of stash-held requests (single writer; read
        # by stats() — a stale read is fine, a missing one is not)
        self._stash_len = 0
        self._latencies_ms: List[float] = []  # rolling, last 512
        # One lock owns the device: the batch worker and every long-form
        # chain acquire it per sampler call, so concurrent requests
        # interleave at window granularity instead of racing dispatches.
        self._device_lock = threading.Lock()
        # Counters/latency list are touched by worker + handler threads.
        self._stats_lock = threading.Lock()
        self._long_active = 0
        self._param_version = 0  # bumps on each reload_params
        # Dispatch->collect handoff: dispatched-but-unread batches. The
        # bounded depth is the in-flight cap — a full queue blocks the
        # dispatch worker, bounding device memory and queueing latency.
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=max(1, cfg.pipeline_depth)
        )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._worker.start()
        self._collector.start()

    # ------------------------------------------------------------- client
    def submit(
        self,
        audio: np.ndarray,
        *,
        speaker: int = 0,
        guidance: Optional[float] = None,
        text: Optional[str] = None,
        emotion: int = 0,
        seed_frames: Optional[np.ndarray] = None,
        block: bool = False,
    ) -> GestureRequest:
        """Enqueue one window. ``block=False`` (external requests) rejects
        with :class:`ServerOverloaded` when the queue is full; ``block=True``
        (already-admitted long-form chains submitting their next window)
        waits for space instead, so a chain can't be killed mid-stream by
        transient bursts."""
        if self._stop.is_set():
            # A request accepted after close() would sit unserved until the
            # client times out; fail it at admission instead.
            raise RuntimeError("server is shutting down")
        a = np.zeros((self.n_samples,), np.float32)
        src = np.asarray(audio, np.float32).reshape(-1)[: self.n_samples]
        a[: src.shape[0]] = src
        req = GestureRequest(
            audio=a, speaker=speaker, guidance=guidance, text=text,
            emotion=emotion, seed_frames=seed_frames,
        )
        req._t_submit = time.monotonic()
        if block:
            while not self._stop.is_set():
                try:
                    self._q.put(req, timeout=0.2)
                    return req
                except queue.Full:
                    continue
            raise RuntimeError("server shutting down")
        try:
            self._q.put_nowait(req)
        except queue.Full:
            with self._stats_lock:
                self._rejected += 1
            raise ServerOverloaded(
                f"pending queue full ({self.cfg.max_queue}); retry later"
            ) from None
        if self._stop.is_set():
            # check-then-act race with close(): the put may have landed
            # after the worker exited (and possibly after close()'s queue
            # drain ran), so nothing would ever serve it. Fail it here —
            # double-failing a request close() also drained is harmless
            # (error assignment + done.set() are idempotent).
            req.error = RuntimeError("server is shutting down")
            req.done.set()
            raise RuntimeError("server is shutting down")
        return req

    def generate(self, audio: np.ndarray, timeout: float = 300.0, **kw) -> np.ndarray:
        return self.submit(audio, **kw).wait(timeout)

    def reload_params(self, params) -> int:
        """Hot-swap model weights with zero downtime (checkpoint reload).

        Weights are traced arguments of the compiled sampler (see
        RAGSampler.update_params), so the swap reuses every executable;
        batches dispatched before the swap finish on the old weights,
        everything after uses the new ones.  The swap serialises on the
        device lock with dispatch, so no batch sees a half-updated tree.
        When a composition pipeline is attached, its RAG refinement stage is
        swapped too (SAG/CLIP towers are frozen conditioners — redeploy to
        change those).  Returns the new params version (1-based)."""
        with self._device_lock:
            self.sampler.update_params(params)
            if self.composition is not None:
                self.composition.rag_sampler.update_params(params)
            # Version bump INSIDE the device lock: with concurrent reloads
            # the returned version must name the swap that actually won
            # (bumping outside would let the later swap return the earlier
            # number, misattributing which checkpoint is live).
            with self._stats_lock:
                self._param_version += 1
                return self._param_version

    def reset_stats(self) -> None:
        """Zero the counters and the latency window (param_version is
        deployment state, not a counter — it survives).  Benchmarks call
        this after their warm-up request so compile latency and the
        occupancy-1 warm batch don't contaminate the reported numbers."""
        with self._stats_lock:
            self._batches_served = 0
            self._requests_served = 0
            self._rejected = 0
            self._latencies_ms.clear()

    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            lat = sorted(self._latencies_ms)
            batches = self._batches_served
            requests = self._requests_served
            rejected = self._rejected
            long_active = self._long_active
            param_version = self._param_version
        pct = lambda p: (
            lat[min(int(p * len(lat)), len(lat) - 1)] if lat else 0.0
        )
        return {
            "batches_served": batches,
            "requests_served": requests,
            "rejected": rejected,
            # stashed = mismatched-kind requests the worker is holding for
            # the next text-homogeneous batch: they are pending too (an
            # operator alerting on queue depth must see them — they have
            # the WORST latency of any waiting request)
            "pending": self._q.qsize() + self._stash_len,
            "inflight_batches": self._inflight.qsize(),
            "long_active": long_active,
            "param_version": param_version,
            "mean_batch_occupancy": (
                requests / batches if batches else 0.0
            ),
            "latency_ms_p50": round(pct(0.50), 2),
            "latency_ms_p95": round(pct(0.95), 2),
            "latency_ms_p99": round(pct(0.99), 2),
        }

    # ---------------------------------------------------------- long-form
    def next_key(self) -> jax.Array:
        """Thread-safe draw from the server's key stream."""
        with self._stats_lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    def long_form_stream(
        self,
        audio: np.ndarray,
        *,
        speaker: int = 0,
        guidance: Optional[float] = None,
        emotion: int = 0,
        sentences: Optional[Sequence[str]] = None,
        fps: int = 15,
        sr: int = 16000,
        window_timeout: float = 300.0,
    ):
        """Admission-controlled long-form generation THROUGH the batcher.

        Yields ``(window_index, new_frames)`` with the exact audio-coverage
        semantics of :func:`pipeline.generate_long_form_stream` (seed-frame
        chaining, tail window zero-padded then cropped so the totals match
        the audio duration). Each window is submitted as an ordinary
        :class:`GestureRequest`, so M concurrent long chains and any
        short requests coalesce into shared ``max_batch`` executables — a
        chain is sequential with itself but batches with everything else.
        At most ``max_long_concurrent`` chains may be in flight (excess
        raises :class:`ServerOverloaded` -> HTTP 503); window submissions
        from admitted chains block (never 503 mid-stream).
        """
        with self._stats_lock:
            if self._long_active >= self.cfg.max_long_concurrent:
                self._rejected += 1
                raise ServerOverloaded(
                    f"{self._long_active} long-form requests already in "
                    "flight; retry later"
                )
            self._long_active += 1
        try:
            from .pipeline import long_form_window_grid

            c = self.sampler.model.cfg
            nf, pre = c.nframes, c.n_pre_seq
            n_windows, excess, _, _, offsets = long_form_window_grid(
                len(audio), nf, pre, fps=fps, sr=sr
            )
            seed = None
            for w in range(n_windows):
                s0 = offsets[w]
                text = (
                    sentences[w % len(sentences)] if sentences else None
                )
                req = self.submit(
                    np.asarray(audio[s0 : s0 + self.n_samples]),
                    speaker=speaker,
                    guidance=guidance,
                    text=text,
                    emotion=emotion,
                    seed_frames=seed,
                    block=True,
                )
                clip = req.wait(window_timeout)  # [J, F, nf]
                out = clip if w == 0 else clip[:, :, pre:]
                if w == n_windows - 1 and excess:
                    out = out[:, :, :-excess]
                yield w, out
                seed = clip[:, :, -pre:]
        finally:
            with self._stats_lock:
                self._long_active -= 1

    def long_form(self, audio: np.ndarray, **kw) -> np.ndarray:
        """Blocking form of :meth:`long_form_stream` -> [J, F, total]."""
        chunks = [c for _, c in self.long_form_stream(audio, **kw)]
        return np.concatenate(chunks, axis=-1)

    def close(self) -> None:
        self._stop.set()
        try:
            # non-blocking: with a full queue (overload shutdown) the
            # sentinel is undeliverable, but then intake get()s return
            # immediately, so the worker reaches its stop-flag check
            # without delay; a LONG intake wait implies an empty queue,
            # where this put always lands
            self._q.put_nowait(_SHUTDOWN)
        except queue.Full:
            pass
        self._worker.join(timeout=10)
        # The worker exits at its next loop check without draining the
        # pending queue — fail every still-queued request NOW so its waiter
        # gets a prompt "shutting down" error instead of hanging until the
        # client's own timeout (SIGTERM drains would otherwise stall every
        # queued HTTP client for minutes).
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not _SHUTDOWN:
                req.error = RuntimeError("server is shutting down")
                req.done.set()
        # Nothing dispatches anymore; drain the collector with a sentinel.
        # put() may momentarily block on a full in-flight queue, which the
        # collector is actively draining; the timeout covers the
        # pathological case of a dead collector (close() must never hang).
        try:
            self._inflight.put(_SHUTDOWN, timeout=10)
        except queue.Full:
            pass
        self._collector.join(timeout=10)

    # ------------------------------------------------------------- worker
    def _run(self) -> None:
        # Per-kind buckets of (arrival, request) awaiting a batch slot
        # (bounded by max_batch; FIFO within each kind).
        buckets: Dict[bool, List] = {False: [], True: []}
        try:
            self._run_loop(buckets)
        finally:
            # the worker owns the buckets: on any exit (shutdown sentinel,
            # stop flag, crash) their waiters must fail promptly like
            # close() fails the still-queued ones
            for b in buckets.values():
                for _, r in b:
                    r.error = RuntimeError("server is shutting down")
                    r.done.set()
            self._stash_len = 0

    def _run_loop(self, buckets: Dict[bool, List]) -> None:
        """Two-bucket batch scheduler.

        Batches must be text-homogeneous when a composition is attached:
        the composition applies its skip-step sketch warm start to EVERY
        row of the batch, so a plain request coalesced with a text request
        would silently get composition output (its result would depend on
        batch co-occupants). Intake drains into a per-kind bucket; a
        bucket dispatches when FULL, or when its oldest request's batching
        window (max_wait_ms) expires. Under deep interleaved traffic both
        buckets fill to max_batch before dispatching, so occupancy stays
        near-full — a carry-one splitter measured a 2x throughput loss and
        a dispatch-on-first-mismatch stash 32% (BASELINE.md); FIFO holds
        per kind. ``buckets`` is owned by :meth:`_run`, whose ``finally``
        fails any still-bucketed waiters on worker exit.

        Without a composition there is only one kind, and the scheduler
        reduces to the classic single-queue window batcher.
        """
        wait_s = self.cfg.max_wait_ms / 1000.0

        def pop_batch(kind):
            take = buckets[kind][: self.cfg.max_batch]
            buckets[kind] = buckets[kind][len(take):]
            self._stash_len = len(buckets[False]) + len(buckets[True])
            return [r for _, r in take]

        while not self._stop.is_set():
            # 1) a full bucket dispatches immediately
            batch = None
            for kind in (False, True):
                if len(buckets[kind]) >= self.cfg.max_batch:
                    batch = pop_batch(kind)
                    break
            if batch is None:
                # 2) earliest window-expiry among non-empty buckets
                nearest = min(
                    ((b[0][0] + wait_s, kind)
                     for kind, b in buckets.items() if b),
                    default=None,
                )
                now = time.monotonic()
                if nearest is not None and nearest[0] <= now:
                    batch = pop_batch(nearest[1])
                else:
                    # 3) pull intake until the nearest deadline
                    timeout = nearest[0] - now if nearest else 0.1
                    try:
                        item = self._q.get(timeout=max(timeout, 1e-3))
                    except queue.Empty:
                        continue
                    if item is _SHUTDOWN:
                        # drain what's waiting before exiting: these
                        # requests were admitted, serve them
                        for kind in (False, True):
                            while buckets[kind]:
                                self._emit(pop_batch(kind))
                        return
                    kind = (
                        bool(item.text) if self.composition is not None
                        else False
                    )
                    buckets[kind].append((time.monotonic(), item))
                    self._stash_len += 1
                    continue
            self._emit(batch)

    def _emit(self, batch: List[GestureRequest]) -> None:
        """Dispatch a formed batch and route it to the collector."""
        try:
            out = self._dispatch(batch)
        except BaseException as e:  # propagate to every waiter
            for r in batch:
                r.error = e
                r.done.set()
            return
        if self.cfg.pipeline_depth <= 0:  # synchronous round-trip mode
            self._finish(batch, out)
            return
        # Hand to the collector; a full in-flight queue blocks here,
        # which is the pipeline-depth cap doing its job.
        while not self._stop.is_set():
            try:
                self._inflight.put((batch, out), timeout=0.2)
                return
            except queue.Full:
                continue
        # shutting down with the pipe full: finish inline
        self._finish(batch, out)

    def _dispatch(self, batch: Sequence[GestureRequest]):
        """Build the padded batch and dispatch the sampler (async). Returns
        the still-executing device array; the collector thread reads it."""
        n, bsz = len(batch), self.cfg.max_batch
        audio = np.zeros((bsz, self.n_samples), np.float32)
        vid = np.zeros((bsz,), np.int64)
        guidance = np.full((bsz,), self.cfg.default_guidance, np.float32)
        origin = np.zeros((bsz,) + self._shape, np.float32)
        for i, r in enumerate(batch):
            audio[i] = r.audio
            vid[i] = r.speaker
            if r.guidance is not None:
                guidance[i] = r.guidance
            if r.seed_frames is not None:
                pre = r.seed_frames.shape[-1]
                origin[i, :, :, :pre] = r.seed_frames
        # Padding rows replicate row 0 (fixed shapes; results discarded).
        if n < bsz:
            audio[n:] = audio[0]
            vid[n:] = vid[0]

        cond = {
            "audio": jnp.asarray(audio),
            "vid": jnp.asarray(vid),
            "origin_x": jnp.asarray(origin),
        }
        if self.sampler.model.cfg.num_emotions:  # BEAT conditioning
            emo = np.zeros((bsz,), np.int64)
            for i, r in enumerate(batch):
                emo[i] = r.emotion
            if n < bsz:
                emo[n:] = emo[0]
            cond["emo"] = jnp.asarray(emo)
        sub = self.next_key()

        texts = [r.text for r in batch]
        with self._device_lock:
            if self.composition is not None and any(t for t in texts):
                sentences = [(t or "") for t in texts] + [""] * (bsz - n)
                out = self.composition(
                    sentences, cond, sub, guidance=jnp.asarray(guidance)
                )
            else:
                out = self.sampler(cond, sub, guidance=jnp.asarray(guidance))
        return out

    def _collect(self) -> None:
        while True:
            item = self._inflight.get()
            if item is _SHUTDOWN:
                return
            batch, out = item
            self._finish(batch, out)

    def _finish(self, batch: Sequence[GestureRequest], out) -> None:
        n = len(batch)
        try:
            out_np = np.asarray(jax.block_until_ready(out))
        except BaseException as e:
            for r in batch:
                r.error = e
                r.done.set()
            return

        now = time.monotonic()
        with self._stats_lock:
            self._batches_served += 1
            self._requests_served += n
            for r in batch:
                t0 = getattr(r, "_t_submit", None)
                if t0 is not None:
                    self._latencies_ms.append((now - t0) * 1e3)
            if len(self._latencies_ms) > 512:
                del self._latencies_ms[:-512]
        for i, r in enumerate(batch):
            r.result = out_np[i]
            r.batch_size = n
            r.done.set()


def serving_mesh(cfg: ServeConfig):
    """The ONE device mesh every server component must share.

    Both the batcher's plain sampler and any attached composition pipeline
    shard served batches over this mesh — built here (with the
    divisibility check; every served batch is padded to exactly
    ``max_batch``) so the two code paths cannot drift."""
    if cfg.data_parallel <= 1:
        return None
    from .parallel import create_mesh

    assert cfg.max_batch % cfg.data_parallel == 0, (
        f"max_batch {cfg.max_batch} must be a multiple of "
        f"data_parallel {cfg.data_parallel}"
    )
    return create_mesh(n_devices=cfg.data_parallel)


def build_rag_server(
    model,
    params,
    cfg: Optional[ServeConfig] = None,
    *,
    composition: Optional[LivelySpeakerPipeline] = None,
) -> GestureBatcher:
    """Wire a RAG model + params into a ready-to-serve batcher."""
    cfg = cfg or ServeConfig()
    mesh = serving_mesh(cfg)
    sampler = RAGSampler(
        model,
        params,
        steps=cfg.steps,
        timestep_respacing=cfg.timestep_respacing,
        method=cfg.sampler,
        use_fused=cfg.use_fused,
        mesh=mesh,
    )
    return GestureBatcher(sampler, cfg, composition=composition)
