"""Process-level JAX setup used by the CLI entry points.

Enables the persistent compilation cache (the 100-1000-step sampling scans
and transformer backward passes are expensive to compile, especially on
single-core hosts / remote-compile setups) and exposes a helper to pin the
platform despite boot hooks that override ``JAX_PLATFORMS``.
"""

from __future__ import annotations

import os

__all__ = ["setup", "force_cpu"]

_DEFAULT_CACHE = os.path.expanduser("~/.cache/livelyspeaker_tpu/jax_cache")


def setup(cache_dir: str | None = None, min_compile_secs: float = 5.0) -> None:
    import jax

    # Boot hooks on managed hosts force jax_platforms past the
    # JAX_PLATFORMS env var; LS_TPU_PLATFORM is honoured here instead
    # (subprocess tests and CPU-only smoke runs set it to "cpu").
    platform = os.environ.get("LS_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    cache_dir = cache_dir or os.environ.get(
        "LS_TPU_JAX_CACHE", _DEFAULT_CACHE
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass  # older jax without the persistent cache


def force_cpu(host_device_count: int | None = None) -> None:
    """Pin to CPU even when a boot hook force-registers an accelerator
    backend (must run before first jax computation)."""
    if host_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{host_device_count}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
