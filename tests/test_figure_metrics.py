"""Decorated-figure rendering and observability utilities."""

import logging
import os

import numpy as np
import pytest

from spectral_tpu.api.session import AnalysisSession
from spectral_tpu.config import SpecConfig, ViewSettings
from spectral_tpu.io.registry import SweepEntry
from spectral_tpu.utils.metrics import (ThroughputMeter, configure_logging,
                                        timed, trace_annotation, logger)


def _session():
    s = AnalysisSession()
    rng = np.random.RandomState(0)
    x = rng.randn(20000).astype(np.float32) * 0.1
    s.registry.register("rec_sweep0", SweepEntry(
        filepath="rec", sweep_idx=0, fs=1000.0, fs_raw=1000.0,
        raw=x, processed=x * 0.5))
    s.plot_sweeps(["rec_sweep0"],
                  SpecConfig.scipy_default(512, fmin=0.0, fmax=100.0,
                                           log_scale=True),
                  ViewSettings(mode_proc="Spectrogram"))
    return s


def test_render_session_figure(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    from spectral_tpu.render.figure import render_session_figure
    s = _session()
    s.last_detected_events = [(3.0, 5.0)]
    p = str(tmp_path / "fig.png")
    fig = render_session_figure(s, path=p, dpi=72)
    assert os.path.exists(p) and os.path.getsize(p) > 1000
    # two axes: signal over spectrogram (+ colorbar axis)
    assert len(fig.axes) >= 2
    # burst overlay landed on both main axes
    assert any(len(ax.patches) for ax in fig.axes[:2])


def test_render_transparent_strips_legend(tmp_path):
    pytest.importorskip("matplotlib")
    from spectral_tpu.render.figure import render_session_figure
    s = _session()
    # positive control first: the default render HAS a legend (reference
    # PlotEngine.py:90) — without this, deleting the legend() call entirely
    # would keep the transparent assertion green vacuously
    fig_default = render_session_figure(s, dpi=72)
    assert fig_default.axes[0].get_legend() is not None
    fig = render_session_figure(s, dpi=72, transparent=True)
    assert fig.axes[0].get_legend() is None


def test_throughput_meter():
    m = ThroughputMeter()
    m.add(16000 * 10, 16000.0, n_frames=622)
    r = m.report()
    assert r["audio_hours"] == pytest.approx(10 / 3600.0, abs=1e-4)
    assert r["frames_per_s"] > 0
    assert r["audio_hours_per_min"] > 0


def test_timed_and_logging(caplog):
    configure_logging()
    with caplog.at_level(logging.INFO, logger="spectral_tpu"):
        with timed("unit-test-op") as t:
            pass
    assert "seconds" in t
    assert any("unit-test-op" in r.message for r in caplog.records)


def test_trace_annotation_noop():
    with trace_annotation("x"):
        pass  # must never raise, with or without a profiler backend


def test_figure_spectrogram_gated_on_mode_combos(tmp_path):
    """The decorated figure draws the spectrogram pane only when a mode
    combo requests it (reference plot_extra:96-103) — the session still
    computes an image headlessly, but Signal/Signal must not display it."""
    from spectral_tpu.render.figure import SessionFigureView
    s = _session()
    s.plot_sweeps(["rec_sweep0"],
                  SpecConfig.scipy_default(512, fmin=0.0, fmax=100.0,
                                           log_scale=True),
                  ViewSettings())          # mode_raw = mode_proc = 'Signal'
    assert s.last_image is not None        # headless compute still happened
    view = SessionFigureView()
    view.rebuild(s)
    assert view.mesh is None               # but the figure shows no mesh
    s.plot_sweeps(["rec_sweep0"], view=ViewSettings(mode_proc="Spectrogram"))
    view.rebuild(s)
    assert view.mesh is not None


def test_xlim_policy_combine_vs_single():
    """The stretch-x-to-signal-duration axis policy is combine-only: the
    reference's last_raw_t is set by the combine branch alone
    (PlotEngine.py:200), so non-combined plots clip x to the spectrogram's
    t[-1] (:139-143) while combined plots pin (0, (n-1)/fs) on the signal
    axis too (:91-92)."""
    pytest.importorskip("matplotlib")
    from spectral_tpu.render.figure import render_session_figure
    s = AnalysisSession()
    rng = np.random.RandomState(1)
    x = rng.randn(20000).astype(np.float32)
    for i in range(2):
        s.registry.register(f"rec_sweep{i}", SweepEntry(
            filepath="rec", sweep_idx=i, fs=1000.0, fs_raw=1000.0,
            raw=x, processed=x * 0.5))
    cfg = SpecConfig.scipy_default(512, log_scale=True)

    # non-combined: x clips to the spectrogram's last frame center, which
    # is strictly inside the 20 s signal
    s.plot_sweeps(["rec_sweep0"], cfg, ViewSettings(mode_proc="Spectrogram"))
    assert s.last_signal_t_end is None
    fig = render_session_figure(s, dpi=72)
    assert fig.axes[1].get_xlim()[1] == pytest.approx(s.last_t[-1])
    assert s.last_t[-1] < 19.999  # the clip is observable

    # combined: x stretches to the combined signal's last sample time
    s.plot_sweeps(["rec_sweep0", "rec_sweep1"], cfg,
                  ViewSettings(combine=True, mode_proc="Spectrogram"))
    dur = (2 * 20000 - 1) / 1000.0
    assert s.last_signal_t_end == pytest.approx(dur)
    fig = render_session_figure(s, dpi=72)
    assert fig.axes[1].get_xlim()[1] == pytest.approx(dur)

    # combined with Signal-only modes: no spectrogram pane, but the signal
    # axis still pins (0, dur) like plot_extra:91-92
    s.plot_sweeps(["rec_sweep0", "rec_sweep1"], cfg, ViewSettings(combine=True))
    fig = render_session_figure(s, dpi=72)
    assert fig.axes[0].get_xlim() == pytest.approx((0.0, dur))


def test_render_single_signal_parity(tmp_path):
    """PlotEngine.plot_single_signal (:215-227) equivalent: labeled axes,
    t = arange/fs, optional log y-scale, PNG written when a path is given."""
    from spectral_tpu.render.figure import render_single_signal
    x = np.sin(np.linspace(0, 20, 2000)).astype(np.float32) + 2.0
    p = tmp_path / "single.png"
    fig = render_single_signal("rec_sweep0", x, 1000.0, path=str(p))
    ax = fig.axes[0]
    assert ax.get_xlabel() == "Time (s)" and ax.get_ylabel() == "Amplitude"
    assert ax.get_yscale() == "linear"
    line_x = ax.lines[0].get_xdata()
    assert line_x[-1] == (len(x) - 1) / 1000.0
    assert p.exists() and p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    fig2 = render_single_signal("n", x, 1000.0, use_log=True)
    assert fig2.axes[0].get_yscale() == "log"


def test_profiler_trace_hooks_roundtrip(tmp_path):
    """The jax.profiler wrappers (aux tracing subsystem) actually start
    and stop a trace and leave artifacts on disk (works on CPU too)."""
    import jax.numpy as jnp
    from spectral_tpu.utils.metrics import (start_profiler_trace,
                                            stop_profiler_trace)
    d = str(tmp_path / "trace")
    assert start_profiler_trace(d)
    jnp.square(jnp.arange(128.0)).block_until_ready()
    stop_profiler_trace()
    import os
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(d) for f in fs]
    assert found, "profiler trace produced no artifacts"
    # idempotent stop: never raises even with no active trace
    stop_profiler_trace()
