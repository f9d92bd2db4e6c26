"""Execute the real Qt shell (gui/app.py) against the Qt-compatible stub.

Round 1's GUI wiring had never run (PyQt5 absent). These tests construct the
actual MainWindow through `build_window()` with tests/qt_stub.py installed
and drive every action end to end: settings round-trip, plotting, detection,
the editing gate, canvas mouse events (drag-draw / hover / right-click
Delete-Merge), Refine Model, band powers, combine registration, CSV/PNG and
batch export with scripted dialogs.
"""

import importlib
import os
import sys

import numpy as np
import pytest

import qt_stub
from spectral_tpu.io.registry import SweepEntry

FS = 1000.0


@pytest.fixture()
def win():
    qtw = qt_stub.install()
    # (re)import the app with the stub active
    sys.modules.pop("spectral_tpu.gui.app", None)
    app_mod = importlib.import_module("spectral_tpu.gui.app")
    qt_stub.QSettings._stores.clear()
    qt_stub.QMessageBox.calls.clear()
    w = app_mod.build_window()
    # synthetic bursty sweeps straight into the session registry
    rng = np.random.RandomState(0)
    n = int(FS * 60)
    t = np.arange(n) / FS
    x = 0.05 * rng.randn(n).astype(np.float32)
    for a, b in ((10.0, 15.0), (30.0, 38.0)):
        m = (t >= a) & (t < b)
        x[m] += np.sin(2 * np.pi * 6.0 * t[m]).astype(np.float32)
    w.session.registry.register("s_sweep0", SweepEntry(
        filepath="<synth>", sweep_idx=0, fs=FS, fs_raw=FS, raw=x,
        processed=None))
    w.session.registry.register("s_sweep1", SweepEntry(
        filepath="<synth>", sweep_idx=1, fs=FS, fs_raw=FS, raw=x[:n // 2],
        processed=None))
    for name in ("s_sweep0", "s_sweep1"):
        w._add_tree_item(name)
    w.tree.topLevelItem(0).setSelected(True)
    yield w
    qt_stub.uninstall()
    sys.modules.pop("spectral_tpu.gui.app", None)


def _plot(win):
    win.chk_raw.setChecked(True)
    win.chk_proc.setChecked(False)
    win.combo_raw.setCurrentText("Both")
    win.spin_nperseg.setValue(512)
    win.spin_fmin.setValue(0.0)
    win.spin_fmax.setValue(30.0)
    win.plot_selected()


def test_settings_roundtrip_and_write_through(win):
    # widget changes write through to QSettings (GUI.py:190-224)
    win.spin_nperseg.setValue(2048)
    win.chk_log.setChecked(True)
    win.combo_proc.setCurrentText("Spectrogram")
    s = qt_stub.QSettings._stores[("spectral_tpu", "SpectrogramGenerator")]
    assert s["nperseg"] == 2048 and s["logScale"] is True
    assert s["modeProc"] == "Spectrogram"


def test_plot_detect_and_status(win):
    _plot(win)
    assert "Plotted single sweep: " in win.status.text()
    assert "Total Power:" in win.status.text()
    win.detect()
    # the reference's exact status string (GUI.py:472)
    assert "Status: HMM detected" in win.status.text()
    assert "event(s)." in win.status.text()
    assert len(win.session.last_detected_events) >= 2


def test_editing_gate_and_canvas_mouse_flow(win):
    _plot(win)
    assert not win.btn_learn.isEnabled()
    # the reference gates purely on the checkbox (GUI.py:318-319): buttons
    # arm immediately; a patchless click warns at action time instead
    win.chk_edit.setChecked(True)
    assert win.btn_learn.isEnabled() and win.btn_refine.isEnabled()
    qt_stub.QMessageBox.calls.clear()
    win.learn()                              # no patches yet -> warning
    assert qt_stub.QMessageBox.calls[-1][0] == "warning"
    assert "example region" in qt_stub.QMessageBox.calls[-1][2]

    press = win.canvas.handlers["button_press_event"]
    move = win.canvas.handlers["motion_notify_event"]
    release = win.canvas.handlers["button_release_event"]

    # drag-draw a span on the canvas
    press(qt_stub._Event(9.0, 1))
    move(qt_stub._Event(12.0, 1))
    release(qt_stub._Event(16.0, 1))
    assert (9.0, 16.0) in win.session.rois
    assert win.btn_learn.isEnabled() and win.btn_refine.isEnabled()

    # second span, then right-click Delete on it
    press(qt_stub._Event(29.0, 1))
    release(qt_stub._Event(39.0, 1))
    qt_stub.QMenu.next_choice = "Delete"
    press(qt_stub._Event(30.0, 3))
    assert (29.0, 39.0) not in win.session.last_detected_events
    qt_stub.QMenu.next_choice = None

    # containing span + Merge via the context menu
    press(qt_stub._Event(5.0, 1))
    release(qt_stub._Event(20.0, 1))
    qt_stub.QMenu.next_choice = "Merge"
    press(qt_stub._Event(6.0, 3))
    qt_stub.QMenu.next_choice = None
    assert win.session.last_detected_events == [(9.0, 16.0)]

    # disabling editing disarms the gate
    win.chk_edit.setChecked(False)
    assert not win.btn_learn.isEnabled()


def test_learn_and_refine_from_drawn_rois(win):
    _plot(win)
    win.chk_edit.setChecked(True)
    press = win.canvas.handlers["button_press_event"]
    release = win.canvas.handlers["button_release_event"]
    press(qt_stub._Event(9.0, 1))
    release(qt_stub._Event(16.0, 1))
    press(qt_stub._Event(29.0, 1))
    release(qt_stub._Event(39.0, 1))
    win.learn()
    # reference status strings (GUI.py:308)
    assert "Status: Learned from examples and detected" in win.status.text()
    assert win.session.detector.is_model_refined
    win.refine()   # delegates to the learn workflow (GUI.py:284)
    assert "Status: Learned from examples and detected" in win.status.text()


def test_band_powers_dialog(win):
    """GUI.py:546-566: a 'Band Power Results' dialog whose text is the
    total power to 6 decimals on line 1, then one bare percent line per
    EEG band (six bands), in a read-only QTextEdit."""
    _plot(win)
    qt_stub.QDialog.shown.clear()
    win.band_powers()
    dlg = qt_stub.QDialog.shown[-1]
    assert dlg._title == "Band Power Results"
    text_box = dlg._layout.items[0]
    lines = [ln for ln in text_box.toPlainText().splitlines() if ln]
    assert len(lines) == 7                      # total + 6 bands
    total = win.session.calculate_absolute_power()
    assert lines[0] == f"{total:.6f}"
    ratios = win.session.calculate_band_powers()
    for ln, ratio in zip(lines[1:], ratios.values()):
        assert ln == f"{100 * ratio:.2f}"


def test_band_powers_without_plot_reports_error(win):
    win.band_powers()
    kind, title, text = qt_stub.QMessageBox.calls[-1]
    # GUI.py:530-533 guard
    assert kind == "warning" and title == "No Spectrogram"
    assert "plot" in text.lower()


def test_register_combined_adds_tree_item(win):
    win.tree.topLevelItem(1).setSelected(True)   # both sweeps selected
    win.chk_proc.setChecked(False)
    win.register_combined()
    assert "combine0" in win.status.text()
    names = [win.tree.topLevelItem(i).data(0, 256)
             for i in range(win.tree.topLevelItemCount())]
    assert "combine0" in names
    sig, fs = win.session.registry.get_signal("combine0", processed=False)
    assert fs == FS


def test_exports_with_scripted_dialogs(win, tmp_path):
    _plot(win)
    win.detect()
    csv_path = str(tmp_path / "bursts.csv")
    qt_stub.QFileDialog.next_save_file = csv_path
    win.export_csv()
    assert os.path.exists(csv_path)
    png_path = str(tmp_path / "fig.png")
    qt_stub.QFileDialog.next_save_file = png_path
    win.export_png()
    assert os.path.exists(png_path)
    out_dir = str(tmp_path / "batch")
    os.makedirs(out_dir)
    qt_stub.QFileDialog.next_directory = out_dir
    win.export_batch()
    assert sorted(os.listdir(out_dir)) == ["s_sweep0.png"]
    # settings remembered the export dir (GUI.py:512,523): the BATCH export
    # ran last, so its directory must be the stored value — a disjunction
    # would also accept the earlier export_png write and mask a regression
    s = qt_stub.QSettings._stores[("spectral_tpu", "SpectrogramGenerator")]
    assert s["lastExportDir"] == out_dir


def test_add_files_via_dialog(win, tmp_path):
    from spectral_tpu.io.wav import write_wav
    p = str(tmp_path / "extra.wav")
    write_wav(p, np.sin(np.linspace(0, 50, 4000)).astype(np.float32) * 0.4,
              FS)
    before = win.tree.topLevelItemCount()
    qt_stub.QFileDialog.next_open_files = [p]
    win.add_files()
    assert win.tree.topLevelItemCount() == before + 1
    # per-file status string (GUI.py:341)
    assert win.status.text() == "Status: Loaded extra.wav"


def test_tree_context_menu_remove_select_clear(win):
    # GUI.py:485-494 semantics through the real handler
    assert win.tree.topLevelItemCount() == 2
    qt_stub.QMenu.next_choice = "Select All"
    win.tree.customContextMenuRequested.emit(qt_stub.QPoint())
    assert len(win.tree.selectedItems()) == 2
    qt_stub.QMenu.next_choice = "Remove Selected"
    win.tree.customContextMenuRequested.emit(qt_stub.QPoint())
    assert win.tree.topLevelItemCount() == 0
    # registry keeps the data (the reference leaves manager.data intact)
    assert "s_sweep0" in win.session.registry.data
    qt_stub.QMenu.next_choice = None


def test_clear_all_resets_plot_and_editing(win):
    _plot(win)
    win.chk_edit.setChecked(True)
    win.session.add_roi(9.0, 12.0)
    qt_stub.QMenu.next_choice = "Clear All"
    win.tree.customContextMenuRequested.emit(qt_stub.QPoint())
    qt_stub.QMenu.next_choice = None
    assert win.tree.topLevelItemCount() == 0
    assert win.session.rois == [] and win.session.spec_data_source is None
    assert not win.controller.roi_editor.editing


def test_reset_model_clears_canvas_and_informs(win):
    _plot(win)
    win.detect()
    win.reset_model()
    kind, title, _text = qt_stub.QMessageBox.calls[-1]
    assert kind == "information" and "Model" in title
    assert win.session.last_detected_events == []
    assert not win.session.detector.is_model_refined


def test_mesh_survives_motion_events(win):
    # weak-point fix: mouse motion must NOT rebuild the Figure/pcolormesh
    # (the reference mutates patch artists in place, PlotEngine.py:497-543;
    # a pcolormesh rebuild costs ~360 ms per event, SURVEY.md §6)
    _plot(win)
    win.detect()
    mesh_before = win.view.mesh
    fig_before = win.canvas.figure
    assert mesh_before is not None
    win.chk_edit.setChecked(True)
    move = win.canvas.handlers["motion_notify_event"]
    for x in (1.0, 11.0, 25.0, 33.0, 50.0):
        move(qt_stub._Event(x, 1))
    assert win.view.mesh is mesh_before
    assert win.canvas.figure is fig_before
    assert mesh_before.axes is win.view.ax_spec  # still attached


def test_blit_fast_path_repaints_overlays_without_full_draw(win, monkeypatch):
    """The canonical blitting recipe (gui/app._on_draw + _repaint): once a
    full draw has cached the background, every mouse-motion repaint must
    restore THAT background, draw only the overlay artists, and blit —
    never trigger another full canvas.draw (the ~360 ms pcolormesh cost
    incremental redraws exist to avoid)."""
    import matplotlib.axes
    drawn = []
    monkeypatch.setattr(matplotlib.axes.Axes, "draw_artist",
                        lambda self, a: drawn.append(a))
    _plot(win)
    win.detect()
    win.chk_edit.setChecked(True)
    assert win._blit            # the stub canvas advertises the blit API
    # a full draw fires draw_event -> background captured
    win.canvas.handlers["draw_event"](qt_stub._Event(0.0, 1))
    assert win._bg == ("bg", win.canvas.figure.bbox)
    draws_before = win.canvas.draw_calls
    drawn.clear()
    move = win.canvas.handlers["motion_notify_event"]
    move(qt_stub._Event(12.0, 1))     # hover onto a detected span
    assert win.canvas.restored and win.canvas.restored[-1] is win._bg
    assert win.canvas.blit_calls >= 1
    assert win.canvas.draw_calls == draws_before     # no full redraw
    assert set(drawn) >= set(win.view.overlay_artists())


def test_hover_highlight_recolors_patch_artists(win):
    # PlotEngine.py:497-543: hovering a patch turns it blue -> red on BOTH
    # axes; leaving it restores blue. Round 2 tracked this in the controller
    # but never rendered it.
    import matplotlib.colors as mcolors
    _plot(win)
    win.chk_edit.setChecked(True)
    press = win.canvas.handlers["button_press_event"]
    move = win.canvas.handlers["motion_notify_event"]
    release = win.canvas.handlers["button_release_event"]
    press(qt_stub._Event(9.0, 1))
    release(qt_stub._Event(16.0, 1))
    pairs = win.view.span_artists()
    assert len(pairs) == 1 and len(pairs[0]) == 2

    def face(artist):
        return mcolors.to_rgb(artist.get_facecolor())

    move(qt_stub._Event(12.0, 1))          # inside the span -> red
    for a in win.view.span_artists()[0]:
        assert face(a) == mcolors.to_rgb("red")
        assert a.get_facecolor()[3] == pytest.approx(0.5)
    move(qt_stub._Event(50.0, 1))          # off the span -> back to blue
    for a in win.view.span_artists()[0]:
        assert face(a) == mcolors.to_rgb("blue")


def test_drag_preview_artists_live_during_drag(win):
    # PlotEngine.py:615-620: while dragging, a green alpha-0.3 span pair
    # previews the region on both axes; it disappears on release, replaced
    # by the committed blue span.
    import matplotlib.colors as mcolors
    _plot(win)
    win.chk_edit.setChecked(True)
    press = win.canvas.handlers["button_press_event"]
    move = win.canvas.handlers["motion_notify_event"]
    release = win.canvas.handlers["button_release_event"]
    press(qt_stub._Event(20.0, 1))
    move(qt_stub._Event(24.0, 1))
    drag = win.view.drag_artists()
    assert drag is not None and len(drag) == 2
    assert drag[0].axes is win.view.ax_signal
    assert drag[1].axes is win.view.ax_spec
    for a in drag:
        assert mcolors.to_rgb(a.get_facecolor()) == mcolors.to_rgb("green")
        assert a.get_facecolor()[3] == pytest.approx(0.3)
    move(qt_stub._Event(28.0, 1))          # preview follows the mouse
    r = win.view.drag_artists()[0]
    assert r.get_x() == pytest.approx(20.0)
    assert r.get_x() + r.get_width() == pytest.approx(28.0)
    release(qt_stub._Event(28.0, 1))
    assert win.view.drag_artists() is None
    assert (20.0, 28.0) in win.session.rois
    assert len(win.view.span_artists()) == 1


def test_xdata_pixel_fallback(win):
    # PlotEngine._get_correct_xdata (:46-61): inside an axes but without a
    # data coordinate, the pixel position inverse-transforms to data space
    _plot(win)
    win.chk_edit.setChecked(True)
    press = win.canvas.handlers["button_press_event"]
    release = win.canvas.handlers["button_release_event"]
    ax = qt_stub._Axes()
    # 10 px per data unit in the stub transform: x=90px -> 9.0 s
    press(qt_stub._Event(None, 1, inaxes=ax, x=90.0, y=5.0))
    release(qt_stub._Event(None, 1, inaxes=ax, x=160.0, y=5.0))
    assert (9.0, 16.0) in win.session.rois
    # outside any axes: ignored entirely
    press(qt_stub._Event(None, 1, inaxes=None, x=300.0))
    assert win.controller.roi_editor.drag_origin is None


def test_tree_item_click_plots_single_and_unchecks_combine(win):
    """GUI.py:359-372: clicking a tree row resets the selection to that
    row, unchecks 'Combine all sweeps', and plots the single sweep."""
    win.chk_raw.setChecked(True)
    win.combo_raw.setCurrentText("Both")
    win.spin_nperseg.setValue(512)
    win.chk_combine.setChecked(True)
    # both rows selected beforehand; click row 1
    win.tree.selectAll()
    item1 = win.tree.topLevelItem(1)
    win.tree.itemClicked.emit(item1, 0)
    assert win.chk_combine.isChecked() is False
    assert win.tree.selectedItems() == [item1]
    assert "Plotted single sweep: " in win.status.text()
    # the plotted sweep is the clicked one (sweep1 is 30 s long)
    assert len(win.session.signal_raw) == int(FS * 60) // 2


def test_remove_selected_button(win):
    """GUI.py:49,172,345-348: the Remove Selected button drops tree rows
    (the registry keeps the data, like the reference's manager.data)."""
    assert win.tree.topLevelItemCount() == 2
    win.remove_selected()  # row 0 selected by the fixture
    assert win.tree.topLevelItemCount() == 1
    assert "s_sweep0" in win.session.registry.data  # data retained
    assert "Removed selected items" in win.status.text()


def test_action_guards_match_reference(win):
    """Click-time guards with the reference's exact box titles/texts:
    detect before plot (GUI.py:456-458), plot with nothing selected
    (:376-378), CSV/PNG export without plot context (:498-501,:569-572),
    batch export without a selection (:579-581)."""
    qt_stub.QMessageBox.calls.clear()
    win.detect()
    assert qt_stub.QMessageBox.calls[-1] == (
        "warning", "Action Required",
        "Please plot a signal before running detection.")
    for i in range(win.tree.topLevelItemCount()):
        win.tree.topLevelItem(i).setSelected(False)
    win.plot_selected()
    assert qt_stub.QMessageBox.calls[-1] == (
        "warning", "Warning", "No sweep selected.")
    win.export_csv()
    assert qt_stub.QMessageBox.calls[-1] == (
        "warning", "No Plot Context",
        "Please plot a signal first before exporting.")
    win.export_png()
    assert qt_stub.QMessageBox.calls[-1] == (
        "warning", "No Plot Context",
        "Please plot a signal first before exporting.")
    win.export_batch()
    assert qt_stub.QMessageBox.calls[-1] == (
        "warning", "No Selection",
        "Please select one or more items to export.")


def test_editing_toggle_status_strings(win):
    """GUI.py:316-321: the editing toggle announces the mode."""
    win.chk_edit.setChecked(True)
    assert win.status.text() == ("Status: Manual editing enabled. "
                                 "Left-click drag to add/move, "
                                 "right-click to remove.")
    win.chk_edit.setChecked(False)
    assert win.status.text() == "Status: Manual editing disabled."


def test_csv_dialog_default_filename_and_cancel(win):
    """GUI.py:508-519: the save dialog seeds '{base}_bursts.csv' (sweep
    suffix stripped) inside lastExportDir, and cancelling reports
    'Status: Export cancelled.'."""
    _plot(win)
    win.detect()
    s = qt_stub.QSettings._stores[("spectral_tpu", "SpectrogramGenerator")]
    s["lastExportDir"] = "/some/dir"
    qt_stub.QFileDialog.calls.clear()
    qt_stub.QFileDialog.next_save_file = ""          # user cancels
    win.export_csv()
    method, title, default = qt_stub.QFileDialog.calls[-1]
    assert (method, title) == ("save", "Save Burst Data as CSV")
    assert default == os.path.join("/some/dir", "s_bursts.csv")
    assert win.status.text() == "Status: Export cancelled."
    # PNG cancel uses the exporter's return string (ExportManager.py:101)
    qt_stub.QFileDialog.next_save_file = ""
    win.export_png()
    assert win.status.text() == "Export cancelled."


def test_no_detection_events_dialog(win):
    """GUI.py:466-469: zero detected events shows the 'Detection Result'
    info box and the 0-events status instead of plotting lines."""
    win.tree.topLevelItem(0).setSelected(True)
    win.chk_raw.setChecked(True)
    win.combo_raw.setCurrentText("Spectrogram")
    win.spin_nperseg.setValue(64)
    win.plot_selected()
    calls_before = len(qt_stub.QMessageBox.calls)
    original = win.session.unsupervised_detect
    win.session.unsupervised_detect = lambda: []
    try:
        win.detect()
    finally:
        win.session.unsupervised_detect = original
    assert qt_stub.QMessageBox.calls[calls_before:] == [
        ("information", "Detection Result", "No events detected.")]
    assert win.status.text() == "Status: HMM detected 0 events."


def test_band_powers_refused_in_log_scale(win):
    """GUI.py:535-541: the band-power dialog refuses while Log Scale is
    checked (band power must read the linear spectrum)."""
    _plot(win)
    win.chk_log.setChecked(True)
    qt_stub.QMessageBox.calls.clear()
    win.band_powers()
    kinds = [c[0] for c in qt_stub.QMessageBox.calls]
    assert "warning" in kinds
    assert any("Log Scale" in str(c) for c in qt_stub.QMessageBox.calls)
    win.chk_log.setChecked(False)
    qt_stub.QMessageBox.calls.clear()
    qt_stub.QDialog.shown.clear()
    win.band_powers()
    assert qt_stub.QDialog.shown          # results dialog opened
    assert not qt_stub.QMessageBox.calls  # no warning this time


def test_gui_random_walk(win):
    """Seeded random action walk over the full widget wiring: the editing
    gate, tree clicks, drag-draw/delete/merge, detection, learning,
    reset, clear, band powers and settings churn must never raise past
    the handlers (the reference wraps every action in try/except ->
    QMessageBox), and the gate invariants must hold after every step."""
    rng = np.random.RandomState(11)
    win.chk_raw.setChecked(True)
    win.combo_raw.setCurrentText("Both")
    win.spin_nperseg.setValue(256)
    plotted = False
    for step in range(50):
        act = rng.choice(
            ["plot", "tree_click", "toggle_edit", "draw", "delete",
             "merge", "detect", "learn", "refine", "reset", "clear",
             "bands", "settings"])
        if act == "plot":
            win.plot_selected()
            plotted = win.session.last_sxx is not None
        elif act == "tree_click" and win.tree.topLevelItemCount():
            i = rng.randint(win.tree.topLevelItemCount())
            win.tree.itemClicked.emit(win.tree.topLevelItem(i), 0)
            plotted = win.session.last_sxx is not None
        elif act == "toggle_edit":
            win.chk_edit.setChecked(not win.chk_edit.isChecked())
        elif act == "draw" and plotted and win.chk_edit.isChecked():
            a = float(rng.uniform(0, 50))
            press = win.canvas.handlers.get("button_press_event")
            release = win.canvas.handlers.get("button_release_event")
            if press and release:
                press(qt_stub._Event(a, 1))
                release(qt_stub._Event(a + float(rng.uniform(0.5, 5)), 1))
        elif act in ("delete", "merge") and win.chk_edit.isChecked() \
                and win.session.rois:
            roi = win.session.rois[rng.randint(len(win.session.rois))]
            press = win.canvas.handlers.get("button_press_event")
            move = win.canvas.handlers.get("motion_notify_event")
            if press and move:
                mid = 0.5 * (roi[0] + roi[1])
                move(qt_stub._Event(mid, 1))     # hover first
                qt_stub.QMenu.next_choice = act.capitalize()
                press(qt_stub._Event(mid, 3))
                qt_stub.QMenu.next_choice = None
        elif act == "detect":
            win.detect()
        elif act == "learn":
            win.learn()
        elif act == "refine":
            win.refine()
        elif act == "reset":
            win.reset_model()
        elif act == "clear":
            win.clear_all()
            plotted = False
        elif act == "bands":
            win.band_powers()
        elif act == "settings":
            win.spin_nperseg.setValue(int(rng.choice([256, 512])))
            win.chk_log.setChecked(bool(rng.randint(2)))
        # gate invariant: learn/refine track the editing checkbox alone
        # (GUI.py:318-319,:322-323); patchless/plotless clicks warn via
        # 'Action Required' message boxes (:279-283,:288-294) instead of
        # disabled buttons
        want = win.chk_edit.isChecked()
        assert win.btn_learn.isEnabled() == want
        assert win.btn_refine.isEnabled() == want
        for a, b in win.session.rois:
            assert a <= b
        if win.session.last_image is not None:
            assert float(win.session.last_image.max()) <= 1.0


def test_error_paths_show_reference_boxes(win, monkeypatch, tmp_path):
    """Coverage-lens gaps (tools/covlite.py): the except arms. A typo
    inside an error handler (wrong attribute, bad format string) only
    surfaces when the handler actually fires — force each one and assert
    the reference's box title + failure status (GUI.py:463-476,:299-312)."""
    _plot(win)

    # detection failure -> 'HMM Error' box + failed status
    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")
    monkeypatch.setattr(win.session, "unsupervised_detect", boom)
    win.detect()
    kind, title, text = qt_stub.QMessageBox.calls[-1]
    assert (kind, title) == ("critical", "HMM Error")
    assert "synthetic device failure" in text
    assert win.status.text() == "Status: HMM detection failed."
    monkeypatch.undo()

    # learning failure -> 'Learning Error' box + failed status
    win.chk_edit.setChecked(True)
    win.session.add_roi(12.0, 14.0)
    monkeypatch.setattr(win.session, "learn_and_detect", boom)
    win.learn()
    kind, title, text = qt_stub.QMessageBox.calls[-1]
    assert (kind, title) == ("critical", "Learning Error")
    assert win.status.text() == "Status: Learning or detection failed."
    monkeypatch.undo()

    # batch export: cancelled dialog -> cancel status; exporter exception
    # -> 'Batch export' box
    qt_stub.QFileDialog.next_directory = ""
    win.export_batch()
    assert win.status.text() == "Export cancelled."
    qt_stub.QFileDialog.next_directory = str(tmp_path)
    monkeypatch.setattr(win.controller, "export_batch", boom)
    win.export_batch()
    kind, title, _ = qt_stub.QMessageBox.calls[-1]
    assert (kind, title) == ("critical", "Batch export")

    # plot failure -> 'Plot error' box
    monkeypatch.setattr(win.session, "plot_sweeps", boom)
    win.plot_selected()
    kind, title, _ = qt_stub.QMessageBox.calls[-1]
    assert (kind, title) == ("critical", "Plot error")


def test_error_boxes_and_tree_context_menu(win, tmp_path):
    # load failure -> 'Load Error' critical box (GUI.py:342-343)
    bad = str(tmp_path / "nope.wav")
    qt_stub.QFileDialog.next_open_files = [bad]
    win.add_files()
    kind, title, text = qt_stub.QMessageBox.calls[-1]
    assert (kind, title) == ("critical", "Load Error") and bad in text

    # mixed sampling rates: combine box (GUI.py:243-245) and plot box
    # (GUI.py:415-418), both with the reference's literal texts
    win.session.registry.register("slow_sweep0", SweepEntry(
        filepath="<synth>", sweep_idx=0, fs=FS / 2, fs_raw=FS / 2,
        raw=np.zeros(1000, np.float32), processed=None))
    win._add_tree_item("slow_sweep0")
    for i in range(win.tree.topLevelItemCount()):
        win.tree.topLevelItem(i).setSelected(True)
    win.register_combined()
    kind, title, _ = qt_stub.QMessageBox.calls[-1]
    assert (kind, title) == ("critical", "Sampling Rate Mismatch")
    win.plot_selected()
    kind, title, text = qt_stub.QMessageBox.calls[-1]
    assert kind == "critical" and "different sampling rates" in text

    # no signal source selected (RAW unchecked, PROC-only sweep absent):
    # status line, not a crash
    for i in range(win.tree.topLevelItemCount()):
        win.tree.topLevelItem(i).setSelected(i == 0)
    win.chk_raw.setChecked(False)
    win.chk_proc.setChecked(True)      # s_sweep0 has no processed stream
    win.plot_selected()
    assert "Nothing to plot" in win.status.text()

    # tree context menu: Remove Selected drops rows but keeps the
    # registry (GUI.py:345-348, :485-494); dismissing does nothing
    n0 = win.tree.topLevelItemCount()
    qt_stub.QMenu.next_choice = None
    win.open_tree_context_menu(None)
    assert win.tree.topLevelItemCount() == n0
    qt_stub.QMenu.next_choice = "Remove Selected"
    try:
        win.open_tree_context_menu(None)
    finally:
        qt_stub.QMenu.next_choice = None
    assert win.tree.topLevelItemCount() == n0 - 1
    assert "s_sweep0" in win.session.registry.names()
    assert "Removed selected" in win.status.text()
