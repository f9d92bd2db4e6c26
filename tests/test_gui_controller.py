"""Headless tests for the GUI interaction controllers (gui/controller.py).

Every reference button/mouse behavior has a client equivalent exercised here
without a display: drag-draw ROI spans, hover highlight, right-click
Delete/Merge, the editing gate on Learn/Refine, Refine Model delegation,
the band-powers dialog, persistent combine registration and batch export
(reference behaviors: PlotEngine.py:480-667, GUI.py:226-276, :278-323,
:529-586).
"""

import os

import numpy as np
import pytest

from spectral_tpu.api.session import AnalysisSession
from spectral_tpu.config import SpecConfig, ViewSettings
from spectral_tpu.gui.controller import (COLOR_HOVER, COLOR_NORMAL,
                                         RoiEditorController,
                                         WindowController)
from spectral_tpu.io.registry import SweepEntry, SweepRegistry


def _bursty_session(fs=1000.0, seconds=60.0, plot=True):
    """Session over a synthetic EEG-like sweep with two 6 Hz bursts."""
    rng = np.random.RandomState(0)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = 0.05 * rng.randn(n).astype(np.float32)
    for a, b in ((10.0, 15.0), (30.0, 38.0)):
        m = (t >= a) & (t < b)
        x[m] += np.sin(2 * np.pi * 6.0 * t[m]).astype(np.float32)
    reg = SweepRegistry()
    reg.register("synth_sweep0", SweepEntry(
        filepath="<synth>", sweep_idx=0, fs=fs, fs_raw=fs, raw=x,
        processed=None))
    reg.register("synth_sweep1", SweepEntry(
        filepath="<synth>", sweep_idx=1, fs=fs, fs_raw=fs, raw=x[:n // 2],
        processed=None))
    s = AnalysisSession(registry=reg)
    if plot:
        s.plot_sweeps(["synth_sweep0"],
                      SpecConfig.scipy_default(512, fmin=0.0, fmax=30.0),
                      ViewSettings(draw_raw=True, draw_proc=False,
                                   mode_raw="Both"))
    return s


# ---------------------------------------------------------------------------
# RoiEditorController
# ---------------------------------------------------------------------------

def test_editing_gate_blocks_all_handlers():
    s = _bursty_session(plot=False)
    c = RoiEditorController(s)
    assert c.on_press(1.0, 1) is None
    assert c.on_motion(1.0) is False
    assert c.on_release(2.0) is None
    assert s.rois == []


def test_drag_draw_commits_span_and_preview():
    s = _bursty_session()
    c = RoiEditorController(s)
    c.set_editing_enabled(True)
    assert c.on_press(10.0, 1) == "drag"
    c.on_motion(12.5)
    assert c.drag_span == (10.0, 12.5)
    c.on_motion(8.0)                       # dragging left of the origin
    assert c.drag_span == (8.0, 10.0)
    added = c.on_release(14.0)
    assert added == (10.0, 14.0)
    assert (10.0, 14.0) in s.rois and (10.0, 14.0) in s.last_detected_events
    assert c.drag_origin is None and c.drag_span is None


def test_drag_below_min_width_is_dropped():
    s = _bursty_session()
    c = RoiEditorController(s)
    c.set_editing_enabled(True)
    c.on_press(5.0, 1)
    # fs=1000 -> min width 1 ms (PlotEngine.py:627-631)
    assert c.on_release(5.0 + 1e-4) is None
    assert s.rois == []


def test_hover_highlight_and_colors():
    s = _bursty_session()
    s.add_roi(1.0, 2.0)
    s.add_roi(4.0, 6.0)
    c = RoiEditorController(s)
    c.set_editing_enabled(True)
    assert c.on_motion(1.5) is True
    assert c.hover == 0
    assert c.patch_colors() == [COLOR_HOVER, COLOR_NORMAL]
    assert c.on_motion(5.0) is True and c.hover == 1
    assert c.on_motion(3.0) is True and c.hover is None
    assert c.patch_colors() == [COLOR_NORMAL, COLOR_NORMAL]


def test_rightclick_menu_delete():
    s = _bursty_session()
    s.add_roi(1.0, 2.0)
    s.add_roi(4.0, 6.0)
    c = RoiEditorController(s)
    c.set_editing_enabled(True)
    assert c.on_press(4.5, 3) == "menu"
    assert c.context_actions() == ["Delete", "Merge"]
    assert c.delete_hovered() is True
    assert s.last_detected_events == [(1.0, 2.0)]
    assert c.hover is None
    # right-click on empty space opens nothing
    assert c.on_press(3.0, 3) is None
    assert c.context_actions() == []


def test_rightclick_merge_contained():
    s = _bursty_session()
    s.add_roi(2.0, 3.0)
    s.add_roi(4.0, 5.0)
    s.add_roi(1.0, 10.0)                   # container drawn around both
    c = RoiEditorController(s)
    c.set_editing_enabled(True)
    assert c.on_press(1.5, 3) == "menu"    # hovered patch = (1, 10)
    assert c.patches()[c.hover] == (1.0, 10.0)
    assert c.merge_hovered() is True
    assert s.last_detected_events == [(2.0, 5.0)]   # union of contained


def test_disabling_editing_cancels_drag_and_hover():
    s = _bursty_session()
    s.add_roi(1.0, 2.0)
    c = RoiEditorController(s)
    c.set_editing_enabled(True)
    c.on_press(5.0, 1)
    c.on_motion(1.5)                       # still dragging: no hover change
    assert c.drag_origin is not None
    c.set_editing_enabled(False)
    assert c.drag_origin is None and c.drag_span is None and c.hover is None
    assert c.on_release(9.0) is None       # nothing commits after disarm
    assert s.rois == [(1.0, 2.0)]


def test_on_change_fires_on_mutations():
    s = _bursty_session()
    calls = []
    c = RoiEditorController(s, on_change=lambda: calls.append(1))
    c.set_editing_enabled(True)
    c.on_press(1.0, 1)
    c.on_motion(2.0)
    c.on_release(3.0)
    assert len(calls) >= 2                 # preview + commit


# ---------------------------------------------------------------------------
# WindowController
# ---------------------------------------------------------------------------

def test_learn_refine_gating():
    s = _bursty_session()
    w = WindowController(s)
    assert not w.can_learn() and not w.can_refine()
    w.set_editing_enabled(True)
    assert not w.can_learn()               # editing on but no patches yet
    s.add_roi(9.0, 16.0)
    assert w.can_learn() and w.can_refine()
    w.set_editing_enabled(False)
    assert not w.can_learn()               # gate follows the toggle


def test_refine_model_learns_from_patches():
    s = _bursty_session()
    w = WindowController(s)
    w.set_editing_enabled(True)
    s.add_roi(9.0, 16.0)
    s.add_roi(29.0, 39.0)
    events = w.refine_model()
    assert s.detector.is_model_refined
    assert len(events) >= 2
    # detected bursts must overlap the true burst windows
    assert any(e[0] < 15.0 and e[1] > 10.0 for e in events)
    assert any(e[0] < 38.0 and e[1] > 30.0 for e in events)


def test_refine_without_patches_raises():
    s = _bursty_session()
    w = WindowController(s)
    with pytest.raises(ValueError, match="No regions"):
        w.refine_model()


def test_band_powers_report():
    s = _bursty_session()
    w = WindowController(s)
    report = w.band_powers_report()
    assert "Theta" in report and "%" in report
    assert "Total absolute power" in report
    # theta (4-8 Hz) dominates a 6 Hz burst recording
    theta_line = [ln for ln in report.splitlines() if "Theta" in ln][0]
    assert float(theta_line.split(":")[1].replace("%", "")) > 50.0


def test_band_powers_requires_plot():
    s = _bursty_session(plot=False)
    w = WindowController(s)
    with pytest.raises(ValueError, match="plot"):
        w.band_powers_report()


def test_register_combined_and_validation():
    s = _bursty_session(plot=False)
    w = WindowController(s)
    with pytest.raises(ValueError, match="at least two"):
        w.register_combined(["synth_sweep0"])
    name = w.register_combined(["synth_sweep0", "synth_sweep1"])
    assert name == "combine0"
    sig, fs = s.registry.get_signal(name, processed=False)
    assert fs == 1000.0
    n0 = len(s.registry.data["synth_sweep0"].raw)
    n1 = len(s.registry.data["synth_sweep1"].raw)
    assert len(sig) == n0 + n1
    # the processed stream is also combined, filled by the raw fallback
    # where a sweep has no processed data (GUI.py:239-240, 248-266)
    sig_p, _ = s.registry.get_signal(name, processed=True)
    assert len(sig_p) == n0 + n1


def test_export_batch(tmp_path):
    s = _bursty_session(plot=False)
    w = WindowController(s)
    with pytest.raises(ValueError, match="Select sweeps"):
        w.export_batch(str(tmp_path), [], use_proc=False, use_raw=True)
    msg = w.export_batch(str(tmp_path), ["synth_sweep0", "synth_sweep1"],
                         use_proc=False, use_raw=True)
    assert "2" in msg
    files = sorted(os.listdir(tmp_path))
    assert files == ["synth_sweep0.png", "synth_sweep1.png"]


def test_disable_editing_when_already_disabled_is_silent():
    """plot_selected calls set_editing_enabled(False) around every plot;
    a no-op disarm must not fire a full overlay reconcile + draw."""
    s = _bursty_session(plot=False)
    calls = []
    c = RoiEditorController(s, on_change=lambda: calls.append(1))
    c.set_editing_enabled(False)
    assert calls == []
    c.set_editing_enabled(True)
    c.set_editing_enabled(False)           # real disarm still notifies
    assert calls == [1]
