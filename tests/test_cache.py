"""utils/cache.py: the persistent XLA compilation cache gate.

Covlite r5 flagged this as the second-least-covered module (41.7%): the
suite runs on the CPU backend, where enable_compilation_cache() bails
before the enable path. These tests drive every branch with the backend
probe monkeypatched — no real TPU (or real cache writes) involved.
"""

import jax
import pytest

from spectral_tpu.utils import cache


@pytest.fixture(autouse=True)
def reset_cache_state(monkeypatch):
    """Each test starts from the not-yet-enabled state and leaves the
    process-global jax config untouched."""
    monkeypatch.setattr(cache, "_enabled", False)
    orig_dir = jax.config.jax_compilation_cache_dir
    orig_min = jax.config.jax_persistent_cache_min_compile_time_secs
    orig_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    yield
    jax.config.update("jax_compilation_cache_dir", orig_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", orig_min)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", orig_size)


def test_cpu_backend_declines():
    # the suite's real backend IS cpu: caching XLA:CPU AOT blobs across
    # processes risks machine-feature mismatches, so the gate declines
    assert cache.enable_compilation_cache() is False
    assert cache.compilation_cache_dir() is None


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("SPECTRAL_TPU_NO_CACHE", "1")
    assert cache.enable_compilation_cache() is False


def test_enables_on_accelerator_backend(monkeypatch, tmp_path):
    monkeypatch.setenv("SPECTRAL_TPU_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cache.enable_compilation_cache() is True
    assert (tmp_path / "xla").is_dir()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    # only expensive compiles persist (tunnel compiles, not host HMMs)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 3.0
    assert cache.compilation_cache_dir() == str(tmp_path / "xla")
    # idempotent: the second call short-circuits on _enabled
    monkeypatch.setattr(jax, "default_backend",
                        lambda: pytest.fail("probed twice"))
    assert cache.enable_compilation_cache() is True


def test_backend_probe_failure_is_contained(monkeypatch):
    # backend init can raise over a dead tunnel (CLAUDE.md: UNAVAILABLE
    # after ~25 min) — the cache gate must decline, not propagate
    def boom():
        raise RuntimeError("backend init failed")
    monkeypatch.setattr(jax, "default_backend", boom)
    assert cache.enable_compilation_cache() is False
    assert cache.compilation_cache_dir() is None
