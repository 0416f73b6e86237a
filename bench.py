"""Headline benchmark: TED gesture clips/sec/chip at 1000-step DDPM.

Matches the reference's heaviest eval configuration (p_sample_loop over 1000
cosine-schedule steps with 2x-CFG denoiser passes per step,
scripts/test_RAG_ted.py:176-178 + cfg_sampler.py:24-31) on the flagship TED
RAG model (latent 512, 8 mixer blocks), batch sized for the MXU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}
vs_baseline is against the 50 clips/s/chip north star in BASELINE.md.
"""

import json
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 50.0
BATCH = 256
STEPS = 1000


def main():
    import os

    import jax

    # Persistent compilation cache: the 100-1000-step scans are expensive to
    # compile (worse under remote-compile contention); cache across runs.
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp

    from livelyspeaker_tpu.diffusion import DiffusionSchedule, sample_loop
    from livelyspeaker_tpu.models import (
        RAG,
        RAGConfig,
        audio_samples_for_frames,
        make_cfg_denoiser,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = RAGConfig.ted()
    model = RAG(cfg)
    rng = np.random.default_rng(0)
    cond = {
        "audio": jnp.asarray(
            rng.normal(size=(BATCH, audio_samples_for_frames(34))).astype(
                np.float32
            )
        ),
        "vid": jnp.asarray(rng.integers(0, 1400, size=(BATCH,))),
        "origin_x": jnp.asarray(
            rng.normal(size=(BATCH, 9, 3, 34)).astype(np.float32)
        ),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)},
        jnp.zeros((BATCH, 9, 3, 34)),
        jnp.zeros((BATCH,), jnp.int32),
        cond,
    )["params"]

    sched = DiffusionSchedule.create(steps=STEPS, schedule="cosine")

    def timed(denoise, label):
        @jax.jit
        def generate(key):
            return sample_loop(
                denoise, sched, (BATCH, 9, 3, 34), key, method="ddpm"
            )

        def run_synced(key):
            # On tunneled TPU backends block_until_ready can return before
            # the execute drains; a scalar fetch is a true device sync
            # (measured 2026-08-18: block returned in 3 ms with 15.8 s of
            # queued work outstanding). Cost: one ~25 ms RTT per call,
            # <2% of a 1000-step chain.
            out = generate(key)
            jax.block_until_ready(out)
            float(jnp.asarray(out[0, 0, 0, 0]))
            return out

        t0 = time.time()
        out = run_synced(jax.random.PRNGKey(0))
        compile_s = time.time() - t0
        assert bool(jnp.isfinite(out).all()), "non-finite samples"
        times = []
        for i in range(3):
            t0 = time.time()
            run_synced(jax.random.PRNGKey(i + 1))
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{label}: compile={compile_s:.1f}s steady={best:.3f}s "
            f"batch={BATCH} ({BATCH / best:.1f} clips/s)",
            file=sys.stderr,
        )
        return best

    from livelyspeaker_tpu.models.fast_rag import make_fused_cfg_denoiser

    # --- on-device correctness gate (default ON; skip with --no-verify) ---
    # The headline number rides on the Mosaic-compiled fused kernel, whose
    # parity is otherwise asserted only in CPU interpret mode
    # (tests/test_pallas_kernels.py). Before timing, run a short DDPM chain
    # through BOTH denoisers with identical keys on the real device and fail
    # the bench if they diverge — interpret mode does not exercise Mosaic's
    # tiling/layout decisions, this does.
    # Whether the fused path may be timed as the headline: it must pass the
    # on-device gate below (or the user must explicitly skip verification).
    fused_usable = True
    if "--no-verify" not in sys.argv:
        vb = 16
        vcond = {k: v[:vb] for k, v in cond.items()}
        # Pin the speaker-VAE noise via the documented determinism hatch:
        # the two closures derive their per-step style keys differently
        # (flax make_rng("style") vs the raw scan key), which is a sampler-
        # stream difference, not a kernel one — this gate isolates the
        # kernel math.
        vcond["style_eps"] = jnp.asarray(
            np.random.default_rng(9).normal(
                size=(vb, 1, cfg.latent_dim)
            ).astype(np.float32)
        )
        vsched = DiffusionSchedule.create(
            steps=STEPS, schedule="cosine", timestep_respacing="10"
        )
        vshape = (vb, 9, 3, 34)

        def chain(denoise):
            return jax.jit(
                lambda k: sample_loop(
                    denoise, vsched, vshape, k, method="ddpm"
                )
            )(jax.random.PRNGKey(7))

        ref = jax.block_until_ready(
            chain(make_cfg_denoiser(model, params, vcond, 1.5))
        )
        try:
            fused = jax.block_until_ready(
                chain(make_fused_cfg_denoiser(model, params, vcond, 1.5))
            )
        except Exception as e:
            # A fused path that can't RUN the gate is a fused path that
            # hasn't been verified on device — it must not become the
            # headline number either (Mosaic lowering is shape-dependent,
            # so "fails at the gate shape, compiles at BATCH" is real).
            print(f"verify: fused path failed to run: {e}", file=sys.stderr)
            fused = None
            fused_usable = False
        if fused is not None:
            delta = float(jnp.max(jnp.abs(fused - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            rel = delta / max(scale, 1e-12)
            print(
                f"verify: fused-vs-XLA 10-step DDPM chain max|delta|="
                f"{delta:.3e} (ref max|x|={scale:.3f}, rel={rel:.2e})",
                file=sys.stderr,
            )
            # Both paths run TPU-default bf16-precision matmuls with
            # different groupings (split input projection, in-kernel pose
            # proj), so per-call reorder noise is ~1e-3 relative and the
            # 10-step chain compounds to ~5e-3; measured 2026-08-17. A real
            # semantic divergence (e.g. the style-RNG mismatch this gate
            # first caught) shows up at rel ~2.5e-1.
            assert rel <= 2e-2, (
                f"fused kernel diverges from XLA on device: rel={rel:.3e}"
            )

    # The fused Pallas path is the production sampler; measure it by default.
    # (`--both` additionally times the XLA path — compiles are expensive on
    # this host and the remote-compile cache is ineffective, so the default
    # keeps the driver's bench run short.)
    best = None
    if fused_usable:
        try:
            best = timed(
                make_fused_cfg_denoiser(model, params, cond, 1.0),
                "pallas-fused",
            )
        except Exception as e:  # fused is an optimization, not a dependency
            print(f"pallas-fused path failed: {e}", file=sys.stderr)
    else:
        print("pallas-fused path unverified (gate failed to run it); "
              "timing the XLA path instead", file=sys.stderr)
    if best is None or "--both" in sys.argv:
        best_xla = timed(make_cfg_denoiser(model, params, cond, 1.0), "xla")
        best = min(best, best_xla) if best is not None else best_xla

    clips_per_sec = BATCH / best
    print(
        json.dumps(
            {
                "metric": "ted_rag_ddpm1000_cfg_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
