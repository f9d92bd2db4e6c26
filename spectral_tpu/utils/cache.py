"""Persistent XLA compilation cache.

First-time compiles on a TPU (especially over a tunneled/axon connection) cost
tens of seconds; the reference tool has no analogous cost. Enabling JAX's
persistent compilation cache makes every program after the first process run
load in milliseconds. On by default; opt out with SPECTRAL_TPU_NO_CACHE=1 or
point SPECTRAL_TPU_CACHE_DIR somewhere else.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> bool:
    """Idempotently enable the persistent compilation cache. Returns whether
    the cache is active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("SPECTRAL_TPU_NO_CACHE"):
        return False
    cache_dir = os.environ.get(
        "SPECTRAL_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "spectral_tpu", "xla"))
    try:
        import jax
        # Only persist accelerator programs. Caching XLA:CPU AOT blobs
        # across processes trips machine-feature mismatch checks (and risks
        # SIGILL per XLA's own warning), and CPU compiles are cheap anyway.
        if jax.default_backend() == "cpu":
            return False
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist only programs whose compile was actually expensive. This
        # keeps the slow tunneled-TPU compiles while skipping the small
        # host-CPU HMM programs, whose cross-process AOT reload trips XLA's
        # machine-feature mismatch warnings.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return True
    except Exception:
        return False


def compilation_cache_dir() -> str | None:
    """The active persistent-cache directory, or None when caching is off.

    Bench artifacts record this so a slow `warmup_s` can be attributed
    (cold cache vs tunnel compile-service slowness)."""
    if not _enabled:
        return None
    import jax
    return jax.config.jax_compilation_cache_dir
