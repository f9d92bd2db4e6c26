"""GUI-shell differential: the REFERENCE'S GUI.py executing on the qt stub
vs our gui/app.py on the same stub, driven with mirrored action scripts.

Block 7 matched our shell's strings/guards/dialogs to GUI.py by reading it;
these tests assert the same parity by EXECUTING the reference's shell (its
real handler code, its real PlotEngine on an Agg canvas) and comparing
status labels, guard message boxes, dialog bodies, QSettings writes, CSV
bytes and detection results side by side. Skipped when the reference
checkout is absent.
"""

from __future__ import annotations

import importlib
import sys

import numpy as np
import pytest

import qt_stub
import reference_exec

if not reference_exec.available():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

from spectral_tpu.io.registry import SweepEntry

FS = 1000.0


def _fixture_signal():
    rng = np.random.RandomState(0)
    n = int(FS * 60)
    t = np.arange(n) / FS
    x = 0.05 * rng.randn(n)
    for a, b in ((10.0, 15.0), (30.0, 38.0)):
        m = (t >= a) & (t < b)
        x[m] += 1.2 * np.sin(2 * np.pi * 6.0 * t[m])
    return x


@pytest.fixture()
def pair():
    """(reference window, our window), each holding the same two sweeps."""
    qt_stub.install()
    qt_stub.QSettings._stores.clear()
    qt_stub.QMessageBox.calls.clear()
    qt_stub.QDialog.shown.clear()
    qt_stub.QFileDialog.calls.clear()

    ref_win = reference_exec.make_gui()

    sys.modules.pop("spectral_tpu.gui.app", None)
    app_mod = importlib.import_module("spectral_tpu.gui.app")
    our_win = app_mod.build_window()

    x = _fixture_signal()
    for i, sig in enumerate((x, x[: len(x) // 2])):
        name = f"demo_sweep{i}"
        ref_win.manager.data[name] = {
            "filepath": "/d/demo.h5", "sweep_idx": i, "fs": FS,
            "fs_raw": FS, "raw": sig, "processed": None}
        item = qt_stub.QTreeWidgetItem([name])
        item.setData(0, qt_stub.Qt.UserRole, name)
        ref_win.file_tree.addTopLevelItem(item)
        our_win.session.registry.register(name, SweepEntry(
            filepath="/d/demo.h5", sweep_idx=i, fs=FS, fs_raw=FS,
            raw=np.asarray(sig, np.float32), processed=None))
        our_win._add_tree_item(name)

    yield ref_win, our_win
    qt_stub.uninstall()
    sys.modules.pop("spectral_tpu.gui.app", None)


def _select(win_ref, win_ours, indices):
    for tree in (win_ref.file_tree, win_ours.tree):
        for i in range(tree.topLevelItemCount()):
            tree.topLevelItem(i).setSelected(i in indices)


def _arm_plot(ref_win, our_win, *, raw_mode="Both", log=False, combine=False,
              nperseg=512):
    ref_win.chk_original.setChecked(True)
    ref_win.chk_processed.setChecked(False)
    ref_win.combo_display_org.setCurrentText(raw_mode)
    ref_win.spin_nperseg.setValue(nperseg)
    ref_win.chk_log.setChecked(log)
    ref_win.chk_combine.setChecked(combine)
    our_win.chk_raw.setChecked(True)
    our_win.chk_proc.setChecked(False)
    our_win.combo_raw.setCurrentText(raw_mode)
    our_win.spin_nperseg.setValue(nperseg)
    our_win.chk_log.setChecked(log)
    our_win.chk_combine.setChecked(combine)


def _guard(action):
    """Run action, return the message boxes it raised."""
    qt_stub.QMessageBox.calls.clear()
    action()
    out = list(qt_stub.QMessageBox.calls)
    qt_stub.QMessageBox.calls.clear()
    return out


def assert_status_eq(ours, ref):
    """Exact string equality except decimal tails, which compare with
    tolerance: our compute path is float32, the reference's float64 (e.g.
    'Total Power: 14.914424' vs '...27')."""
    import re
    pat = re.compile(r"(-?\d+\.\d+)")
    assert pat.sub("#", ours) == pat.sub("#", ref), (ours, ref)
    a = [float(v) for v in pat.findall(ours)]
    b = [float(v) for v in pat.findall(ref)]
    if a:
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


# ---------------------------------------------------------------------------


def test_defaults_match(pair):
    ref_win, our_win = pair
    assert our_win.status.text() == ref_win.status_label.text() \
        == "Status: Ready"
    assert our_win.spin_nperseg.value() == ref_win.spin_nperseg.value()
    assert our_win.spin_fmin.value() == ref_win.spin_fmin.value()
    assert our_win.spin_fmax.value() == ref_win.spin_fmax.value()
    assert our_win.chk_raw.isChecked() == ref_win.chk_original.isChecked()
    assert our_win.chk_proc.isChecked() == ref_win.chk_processed.isChecked()
    assert our_win.chk_combine.isChecked() == ref_win.chk_combine.isChecked()
    assert our_win.combo_raw.currentText() \
        == ref_win.combo_display_org.currentText()
    assert our_win.combo_proc.currentText() \
        == ref_win.combo_display_proc.currentText()


def test_click_guards_match(pair):
    """Every click-time guard raises the same box on both shells
    (GUI.py:376-377, 456-457, 288-293, 279-282, 498-506, 530-541,
    228-229, 579-580)."""
    ref_win, our_win = pair
    _select(ref_win, our_win, set())

    # plot with nothing selected
    assert _guard(lambda: ref_win.plot_selected()) \
        == _guard(lambda: our_win.plot_selected())
    # detect before plot
    assert _guard(lambda: ref_win.on_detect_clicked()) \
        == _guard(lambda: our_win.detect())
    # learn before plot
    assert _guard(lambda: ref_win.on_learn_and_detect_clicked()) \
        == _guard(lambda: our_win.learn())
    # refine with no patches
    assert _guard(lambda: ref_win.on_refine_model_clicked()) \
        == _guard(lambda: our_win.refine())
    # csv before plot
    assert _guard(lambda: ref_win.export_csv()) \
        == _guard(lambda: our_win.export_csv())
    # band power before plot
    assert _guard(lambda: ref_win.on_band_power_clicked()) \
        == _guard(lambda: our_win.band_powers())
    # combine with < 2 selected
    assert _guard(lambda: ref_win.on_add_combined_entry()) \
        == _guard(lambda: our_win.register_combined())
    # batch export with nothing selected
    assert _guard(lambda: ref_win.export_batch_signals()) \
        == _guard(lambda: our_win.export_batch())


def test_plot_and_detect_status_strings_match(pair):
    ref_win, our_win = pair
    _select(ref_win, our_win, {0})
    _arm_plot(ref_win, our_win)

    ref_win.plot_selected()
    our_win.plot_selected()
    assert_status_eq(our_win.status.text(), ref_win.status_label.text())
    assert ref_win.status_label.text().startswith(
        "Plotted single sweep: demo_sweep0 | Total Power: ")

    ref_win.on_detect_clicked()
    our_win.detect()
    assert our_win.status.text() == ref_win.status_label.text()
    # the same events back detection parity through the whole shell
    ref_events = [tuple(p[0].event_data)
                  for p in ref_win.canvas.burst_patches]
    our_events = list(map(tuple, our_win.session.last_detected_events))
    assert len(ref_events) == len(our_events)
    np.testing.assert_allclose(np.asarray(sorted(our_events)),
                               np.asarray(sorted(ref_events)), atol=1e-5)


def test_combined_plot_status_matches(pair):
    ref_win, our_win = pair
    _select(ref_win, our_win, {0, 1})
    _arm_plot(ref_win, our_win, combine=True)
    ref_win.plot_selected()
    our_win.plot_selected()
    assert_status_eq(our_win.status.text(), ref_win.status_label.text())
    assert ref_win.status_label.text().startswith(
        "Plotted concatenated 2 sweeps.")


def test_editing_toggle_strings_and_gates_match(pair):
    ref_win, our_win = pair
    for v in (True, False, True):
        ref_win.chk_enable_editing.setChecked(v)
        our_win.chk_edit.setChecked(v)
        assert our_win.status.text() == ref_win.status_label.text()
        assert our_win.btn_refine.isEnabled() \
            == ref_win.btn_refine_model.isEnabled()
        assert our_win.btn_learn.isEnabled() \
            == ref_win.btn_learn_and_detect.isEnabled()


def test_band_power_dialog_body_matches(pair):
    ref_win, our_win = pair
    _select(ref_win, our_win, {0})
    _arm_plot(ref_win, our_win, log=False)
    ref_win.spin_fmax.setValue(300.0)
    our_win.spin_fmax.setValue(300.0)
    ref_win.plot_selected()
    our_win.plot_selected()

    qt_stub.QDialog.shown.clear()
    ref_win.on_band_power_clicked()
    our_win.band_powers()
    assert len(qt_stub.QDialog.shown) == 2

    def body(dialog):
        lay = dialog._layout
        texts = [w.toPlainText() for w in lay.items
                 if isinstance(w, qt_stub.QTextEdit)]
        assert len(texts) == 1
        return texts[0]

    ref_body, our_body = (body(d) for d in qt_stub.QDialog.shown)
    # same shape: total power line + one percent line per band
    ref_lines = ref_body.strip().split("\n")
    our_lines = our_body.strip().split("\n")
    assert len(our_lines) == len(ref_lines) == 7
    np.testing.assert_allclose([float(v) for v in our_lines],
                               [float(v) for v in ref_lines],
                               rtol=2e-3, atol=2e-3)

    # log scale refuses on both (GUI.py:535-541)
    ref_win.chk_log.setChecked(True)
    our_win.chk_log.setChecked(True)
    ref_win.plot_selected()
    our_win.plot_selected()
    assert _guard(lambda: ref_win.on_band_power_clicked()) \
        == _guard(lambda: our_win.band_powers())


def test_csv_export_through_both_shells_matches(pair, tmp_path):
    ref_win, our_win = pair
    _select(ref_win, our_win, {0})
    _arm_plot(ref_win, our_win)
    ref_win.plot_selected()
    our_win.plot_selected()
    ref_win.on_detect_clicked()
    our_win.detect()

    # cancelled dialog (empty path) -> same status
    qt_stub.QFileDialog.next_save_file = ""
    ref_win.export_csv()
    ref_cancel = ref_win.status_label.text()
    qt_stub.QFileDialog.next_save_file = ""
    our_win.export_csv()
    assert our_win.status.text() == ref_cancel == "Status: Export cancelled."

    # scripted save paths: same default filename offered, same bytes out
    qt_stub.QFileDialog.calls.clear()
    qt_stub.QFileDialog.next_save_file = str(tmp_path / "ref.csv")
    ref_win.export_csv()
    ref_default = qt_stub.QFileDialog.calls[-1][2]
    qt_stub.QFileDialog.next_save_file = str(tmp_path / "ours.csv")
    our_win.export_csv()
    our_default = qt_stub.QFileDialog.calls[-1][2]
    import os
    assert os.path.basename(our_default) == os.path.basename(ref_default) \
        == "demo_bursts.csv"
    assert our_win.status.text() == ref_win.status_label.text().replace(
        "ref.csv", "ours.csv")
    ref_bytes = (tmp_path / "ref.csv").read_bytes()
    our_bytes = (tmp_path / "ours.csv").read_bytes()
    # identical modulo the float path: events come from each side's own
    # detection; rows and attribution must match structurally
    assert len(our_bytes.splitlines()) == len(ref_bytes.splitlines())
    assert our_bytes.splitlines()[0] == ref_bytes.splitlines()[0]
    for ours, ref in zip(our_bytes.splitlines()[1:],
                         ref_bytes.splitlines()[1:]):
        oc, rc = ours.split(b","), ref.split(b",")
        assert oc[:3] == rc[:3]
        np.testing.assert_allclose([float(v) for v in oc[3:]],
                                   [float(v) for v in rc[3:]],
                                   atol=1e-5, equal_nan=True)


def test_settings_writes_match_key_for_key(pair):
    """Toggling every persisted widget writes the same key/value pairs
    (GUI.load_settings, :190-224)."""
    ref_win, our_win = pair
    ref_store = qt_stub.QSettings._stores[("MyCompany",
                                           "SpectrogramGenerator")]
    our_store = qt_stub.QSettings._stores[("spectral_tpu",
                                           "SpectrogramGenerator")]

    ref_win.chk_original.setChecked(False)
    our_win.chk_raw.setChecked(False)
    ref_win.chk_processed.setChecked(False)
    our_win.chk_proc.setChecked(False)
    ref_win.chk_combine.setChecked(True)
    our_win.chk_combine.setChecked(True)
    ref_win.chk_log.setChecked(True)
    our_win.chk_log.setChecked(True)
    ref_win.combo_display_org.setCurrentText("Spectrogram")
    our_win.combo_raw.setCurrentText("Spectrogram")
    ref_win.combo_display_proc.setCurrentText("Both")
    our_win.combo_proc.setCurrentText("Both")
    ref_win.spin_nperseg.setValue(2048)
    our_win.spin_nperseg.setValue(2048)
    ref_win.spin_fmin.setValue(2.0)
    our_win.spin_fmin.setValue(2.0)
    ref_win.spin_fmax.setValue(48.0)
    our_win.spin_fmax.setValue(48.0)

    for key in ("drawRaw", "drawProc", "combineAll", "logScale", "modeRaw",
                "modeProc", "nperseg", "fmin", "fmax"):
        assert key in ref_store, key
        assert our_store.get(key) == ref_store[key], key


def test_reset_model_and_remove_selected_match(pair):
    ref_win, our_win = pair
    assert _guard(lambda: ref_win.on_reset_model_clicked()) \
        == _guard(lambda: our_win.reset_model())
    assert our_win.status.text() == ref_win.status_label.text()

    _select(ref_win, our_win, {1})
    ref_win.remove_selected()
    our_win.remove_selected()
    assert our_win.status.text() == ref_win.status_label.text()
    assert our_win.tree.topLevelItemCount() \
        == ref_win.file_tree.topLevelItemCount() == 1


def test_combine_entry_flow_matches(pair):
    ref_win, our_win = pair
    _select(ref_win, our_win, {0, 1})
    ref_boxes = _guard(lambda: ref_win.on_add_combined_entry())
    our_boxes = _guard(lambda: our_win.register_combined())
    assert our_boxes == ref_boxes  # 'Combine Complete' information box
    assert our_win.status.text() == ref_win.status_label.text()
    assert ref_win.manager.data["combine0"]["sweep_idx"] == -1
    ours = our_win.session.registry.data["combine0"]
    np.testing.assert_allclose(
        ours.raw, ref_win.manager.data["combine0"]["raw"], atol=1e-6)


def test_tree_click_plots_single_and_unchecks_combine(pair):
    ref_win, our_win = pair
    _arm_plot(ref_win, our_win, combine=True)
    ref_item = ref_win.file_tree.topLevelItem(1)
    our_item = our_win.tree.topLevelItem(1)
    ref_win.on_tree_item_clicked(ref_item, 0)
    our_win.on_tree_item_clicked(our_item, 0)
    assert not ref_win.chk_combine.isChecked()
    assert not our_win.chk_combine.isChecked()
    assert_status_eq(our_win.status.text(), ref_win.status_label.text())
    assert ref_win.status_label.text().startswith(
        "Plotted single sweep: demo_sweep1")
