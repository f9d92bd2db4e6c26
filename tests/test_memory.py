"""Bounded-memory backstop (utils/memory.py) + serve wiring.

The soak evidence (tools/soak.py): randomized configs grow RSS via
JAX's per-shape executable caching while fixed shapes stay flat, so the
guard drops compiled programs (and serve's cached sessions) when RSS
crosses a threshold.
"""

import io
import json

import numpy as np
import pytest

from spectral_tpu.utils import memory


@pytest.fixture(autouse=True)
def _reset_hysteresis():
    """Each test starts as if no trim had ever fired (the anti-thrash
    hysteresis otherwise suppresses trims for the rest of the process)."""
    memory._post_trim_rss = 0.0
    yield
    memory._post_trim_rss = 0.0


def test_rss_and_disabled_threshold(monkeypatch):
    assert memory.rss_mb() > 10.0        # a live JAX process is > 10 MB
    monkeypatch.delenv("SPECTRAL_TPU_MAX_RSS_MB", raising=False)
    assert memory.maybe_trim_caches() is False          # disabled
    assert memory.maybe_trim_caches(0) is False
    assert memory.maybe_trim_caches(1e9) is False       # under limit
    monkeypatch.setenv("SPECTRAL_TPU_MAX_RSS_MB", "not-a-number")
    assert memory.maybe_trim_caches() is False          # bad env = off


def test_trim_fires_and_clears_plot_programs():
    from spectral_tpu.api.session import (AnalysisSession, _plot_program)
    from spectral_tpu.config import SpecConfig, ViewSettings
    from spectral_tpu.io.registry import SweepEntry

    s = AnalysisSession(warm_detection=False)
    x = np.sin(np.linspace(0, 60, 4000)).astype(np.float32)
    s.registry.register("m_sweep0", SweepEntry("m", 0, 100.0, 100.0, x,
                                               None))
    s.plot_sweeps(["m_sweep0"], SpecConfig.scipy_default(256),
                  ViewSettings())
    assert _plot_program.cache_info().currsize >= 1
    assert memory.maybe_trim_caches(1.0) is True        # 1 MB: always over
    assert _plot_program.cache_info().currsize == 0
    # anti-thrash hysteresis: RSS barely moved since the trim, so an
    # immediate re-check does NOT trim again (would recompile every call)
    assert memory.maybe_trim_caches(1.0) is False
    # the session still works after a trim (programs recompile)
    r = s.plot_sweeps(["m_sweep0"], SpecConfig.scipy_default(256),
                      ViewSettings())
    assert r is not None and r.image is not None


def test_session_plot_honors_env_knob(monkeypatch):
    from spectral_tpu.api.session import (AnalysisSession, _plot_program)
    from spectral_tpu.config import SpecConfig, ViewSettings
    from spectral_tpu.io.registry import SweepEntry

    monkeypatch.setenv("SPECTRAL_TPU_MAX_RSS_MB", "1")  # force a trim
    s = AnalysisSession(warm_detection=False)
    x = np.sin(np.linspace(0, 60, 4000)).astype(np.float32)
    s.registry.register("m_sweep0", SweepEntry("m", 0, 100.0, 100.0, x,
                                               None))
    r = s.plot_sweeps(["m_sweep0"], SpecConfig.scipy_default(256),
                      ViewSettings())
    assert r is not None
    # the post-plot hook trimmed the program cache
    assert _plot_program.cache_info().currsize == 0


def test_serve_trims_and_keeps_answering(tmp_path):
    from spectral_tpu.cli import _serve
    from spectral_tpu.io.wav import write_wav

    fs = 1000.0
    t = np.arange(int(20 * fs)) / fs
    x = (0.02 * np.random.RandomState(0).randn(t.size)
         + 0.5 * np.sin(2 * np.pi * 6 * t) * ((t > 5) & (t < 9)))
    p = str(tmp_path / "s.wav")
    write_wav(p, x.astype(np.float32), fs)
    reqs = [{"cmd": "bands", "files": [p],
             "config": {"nperseg": 256}} for _ in range(3)]
    reqs.append({"cmd": "shutdown"})
    stdin = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    stdout = io.StringIO()
    # 1 MB cap: the trim fires after EVERY request; the worker must keep
    # rebuilding sessions and answering correctly
    assert _serve(stdin, stdout, max_rss_mb=1.0) == 0
    out = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert [o["ok"] for o in out] == [True, True, True, True]
    assert all("bands" in o for o in out[:3])


def test_rss_mb_proc_read_failure_returns_zero(monkeypatch):
    """A container without /proc visibility must degrade to 0.0 (which
    disables the trim heuristics), never raise."""
    import builtins
    real_open = builtins.open

    def no_proc(path, *a, **k):
        if str(path).startswith("/proc/"):
            raise OSError("denied")
        return real_open(path, *a, **k)
    monkeypatch.setattr(builtins, "open", no_proc)
    assert memory.rss_mb() == 0.0
    # and the trim gate treats the unreadable RSS as under-threshold
    assert memory.maybe_trim_caches(max_rss_mb=1.0) is False
