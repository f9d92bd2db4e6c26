"""Thin Qt GUI client over the headless AnalysisSession.

Mirrors the reference's window (GUI.py:12-168: file tree, display options,
analysis parameters, detection buttons, export buttons, status label) while
keeping ALL logic in the session layer — the GUI only wires widgets to
session calls, the inversion of the reference's design where PlotEngine was
simultaneously compute engine, model holder, renderer and Qt widget
(SURVEY.md §1). Requires PyQt5 (an optional dependency; the framework is
headless-first). Launch: ``spectral-tpu gui`` or ``python -m
spectral_tpu.gui.app``.

Settings persist via QSettings under "spectral_tpu/SpectrogramGenerator",
mirroring the reference's keys (GUI.py:190-224: lastDir, drawRaw, drawProc,
combineAll, nperseg, fmin, fmax, logScale, lastExportDir).
"""

from __future__ import annotations

import os
import sys


def _require_qt():
    try:
        from PyQt5 import QtCore, QtWidgets  # noqa: F401
        return True
    except ImportError:
        return False


def main(argv=None) -> int:
    if not _require_qt():
        sys.stderr.write(
            "spectral-tpu gui requires PyQt5 (optional dependency; "
            "pip install PyQt5). The headless CLI covers every operation: "
            "spectral-tpu --help\n")
        return 2

    from PyQt5 import QtCore, QtWidgets
    from matplotlib.backends.backend_qt5agg import (FigureCanvasQTAgg,
                                                    NavigationToolbar2QT)
    from matplotlib.figure import Figure

    from spectral_tpu.api.session import AnalysisSession
    from spectral_tpu.config import SpecConfig, ViewSettings
    from spectral_tpu.render.figure import render_session_figure

    class MainWindow(QtWidgets.QMainWindow):
        def __init__(self):
            super().__init__()
            self.setWindowTitle("Spectrogram Generator (TPU)")
            self.session = AnalysisSession()
            self.settings = QtCore.QSettings("spectral_tpu",
                                             "SpectrogramGenerator")

            root = QtWidgets.QWidget()
            layout = QtWidgets.QHBoxLayout(root)
            self.setCentralWidget(root)

            # left panel: file tree + controls (GUI.py:22-156)
            panel = QtWidgets.QVBoxLayout()
            layout.addLayout(panel, 1)

            self.tree = QtWidgets.QTreeWidget()
            self.tree.setHeaderLabel("Sweeps")
            self.tree.setSelectionMode(
                QtWidgets.QAbstractItemView.ExtendedSelection)
            panel.addWidget(self.tree, 2)

            btn_add = QtWidgets.QPushButton("Add Files")
            btn_add.clicked.connect(self.add_files)
            panel.addWidget(btn_add)

            form = QtWidgets.QFormLayout()
            self.chk_raw = QtWidgets.QCheckBox("RAW")
            self.chk_proc = QtWidgets.QCheckBox("PROC")
            self.chk_combine = QtWidgets.QCheckBox("Combine")
            self.chk_log = QtWidgets.QCheckBox("Log scale")
            self.spin_nperseg = QtWidgets.QSpinBox()
            self.spin_nperseg.setRange(32, 8192)
            self.spin_nperseg.setSingleStep(32)  # GUI.py:87-90
            self.spin_fmin = QtWidgets.QDoubleSpinBox()
            self.spin_fmin.setRange(0.0, 5000.0)
            self.spin_fmax = QtWidgets.QDoubleSpinBox()
            self.spin_fmax.setRange(0.0, 5000.0)
            form.addRow(self.chk_raw, self.chk_proc)
            form.addRow(self.chk_combine, self.chk_log)
            form.addRow("nperseg", self.spin_nperseg)
            form.addRow("fmin (Hz)", self.spin_fmin)
            form.addRow("fmax (Hz)", self.spin_fmax)
            panel.addLayout(form)

            for label, slot in [("Plot Signal", self.plot_selected),
                                ("Auto-Detect Bursts", self.detect),
                                ("Learn from Examples", self.learn),
                                ("Reset Model", self.reset_model),
                                ("Export CSV", self.export_csv),
                                ("Export PNG", self.export_png)]:
                b = QtWidgets.QPushButton(label)
                b.clicked.connect(slot)
                panel.addWidget(b)

            self.status = QtWidgets.QLabel("Ready")
            panel.addWidget(self.status)

            # right: matplotlib canvas fed from the headless session
            self.fig = Figure()
            self.canvas = FigureCanvasQTAgg(self.fig)
            right = QtWidgets.QVBoxLayout()
            right.addWidget(NavigationToolbar2QT(self.canvas, self))
            right.addWidget(self.canvas)
            layout.addLayout(right, 3)

            self.load_settings()

        # ---- settings (GUI.py:190-224 semantics) -----------------------
        def load_settings(self):
            s = self.settings
            self.chk_raw.setChecked(s.value("drawRaw", True, bool))
            self.chk_proc.setChecked(s.value("drawProc", True, bool))
            self.chk_combine.setChecked(s.value("combineAll", False, bool))
            self.chk_log.setChecked(s.value("logScale", False, bool))
            self.spin_nperseg.setValue(s.value("nperseg", 1024, int))
            self.spin_fmin.setValue(s.value("fmin", 0.0, float))
            self.spin_fmax.setValue(s.value("fmax", 30.0, float))
            for w, key in [(self.chk_raw, "drawRaw"),
                           (self.chk_proc, "drawProc"),
                           (self.chk_combine, "combineAll"),
                           (self.chk_log, "logScale")]:
                w.toggled.connect(lambda v, k=key: self.settings.setValue(k, v))
            self.spin_nperseg.valueChanged.connect(
                lambda v: self.settings.setValue("nperseg", v))
            self.spin_fmin.valueChanged.connect(
                lambda v: self.settings.setValue("fmin", v))
            self.spin_fmax.valueChanged.connect(
                lambda v: self.settings.setValue("fmax", v))

        # ---- actions ----------------------------------------------------
        def _selected_names(self):
            return [i.data(0, QtCore.Qt.UserRole)
                    for i in self.tree.selectedItems()]

        def add_files(self):
            last = self.settings.value("lastDir", "", str)
            paths, _ = QtWidgets.QFileDialog.getOpenFileNames(
                self, "Add Files", last,
                "All (*.abf *.h5 *.wav *.npz);;ABF (*.abf);;HDF5 (*.h5);;"
                "WAV (*.wav);;NPZ (*.npz)")
            for p in paths:
                self.settings.setValue("lastDir", os.path.dirname(p))
                try:
                    for name in self.session.load(p):
                        item = QtWidgets.QTreeWidgetItem([name])
                        item.setData(0, QtCore.Qt.UserRole, name)
                        self.tree.addTopLevelItem(item)
                except Exception as e:
                    QtWidgets.QMessageBox.critical(self, "Load error", str(e))
            self.status.setText(f"{self.tree.topLevelItemCount()} sweeps")

        def _config(self):
            return SpecConfig.scipy_default(
                nperseg=self.spin_nperseg.value(),
                fmin=self.spin_fmin.value(), fmax=self.spin_fmax.value(),
                log_scale=self.chk_log.isChecked())

        def plot_selected(self):
            names = self._selected_names()
            if not names:
                self.status.setText("Select sweeps first")
                return
            try:
                view = ViewSettings(combine=self.chk_combine.isChecked(),
                                    draw_raw=self.chk_raw.isChecked(),
                                    draw_proc=self.chk_proc.isChecked(),
                                    mode_raw="Both", mode_proc="Both")
                res = self.session.plot_sweeps(names, self._config(), view)
                self._redraw()
                power = self.session.calculate_absolute_power()
                self.status.setText(
                    f"Plotted {len(names)} sweep(s); total power {power:.3g}")
            except Exception as e:
                QtWidgets.QMessageBox.critical(self, "Plot error", str(e))

        def _redraw(self):
            # render through the shared decorated-figure layer and swap the
            # canvas figure (all draw logic stays in render/figure.py)
            self.canvas.figure = render_session_figure(self.session)
            self.canvas.figure.set_canvas(self.canvas)
            self.canvas.draw()

        def detect(self):
            try:
                events = self.session.unsupervised_detect()
                self._redraw()
                self.status.setText(f"{len(events)} bursts detected")
            except Exception as e:
                QtWidgets.QMessageBox.critical(self, "Detection error", str(e))

        def learn(self):
            text, ok = QtWidgets.QInputDialog.getText(
                self, "Learn from Examples",
                "ROIs as start:end,start:end (seconds):")
            if not ok or not text.strip():
                return
            try:
                rois = []
                for part in text.split(","):
                    a, b = part.split(":")
                    rois.append((float(a), float(b)))
                events = self.session.learn_and_detect(rois)
                self._redraw()
                self.status.setText(f"{len(events)} bursts after learning")
            except Exception as e:
                QtWidgets.QMessageBox.critical(self, "Learning error", str(e))

        def reset_model(self):
            self.session.reset_model()
            self.status.setText("Model reset")

        def export_csv(self):
            last = self.settings.value("lastExportDir", "", str)
            path, _ = QtWidgets.QFileDialog.getSaveFileName(
                self, "Export CSV", last, "CSV (*.csv)")
            if path:
                self.settings.setValue("lastExportDir", os.path.dirname(path))
                self.status.setText(self.session.export_csv(path))

        def export_png(self):
            last = self.settings.value("lastExportDir", "", str)
            path, _ = QtWidgets.QFileDialog.getSaveFileName(
                self, "Export PNG", last, "PNG (*.png)")
            if path:
                self.settings.setValue("lastExportDir", os.path.dirname(path))
                self.status.setText(self.session.export_png(path))

    app = QtWidgets.QApplication(argv or sys.argv)
    win = MainWindow()
    win.resize(1200, 800)
    win.show()
    return app.exec_()


if __name__ == "__main__":
    sys.exit(main())
