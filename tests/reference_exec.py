"""Load the reference application's modules so their ACTUAL code executes
headlessly as a differential oracle.

Every parity test so far compares spectral_tpu against oracles we wrote
(scipy calls, a numpy hmmlearn reimplementation, hand-computed goldens) —
all authored by the same people who wrote the code under test. This loader
removes that correlation for everything that does not need real Qt or real
ABF/NIX files: it imports PlotEngine/ExportManager/SweepManager from the
read-only reference checkout with only their *non-installable* dependencies
stubbed at import time —

  * PyQt5            -> tests/qt_stub.py (only QMenu/QCursor/Qt.UserRole and
                        dialog entry points are ever touched headlessly);
  * FigureCanvasQTAgg-> matplotlib's real Agg canvas, so figures, pcolormesh,
                        axvspan patches and pixel-space hit testing all run
                        the real matplotlib code;
  * hmmlearn         -> the float64 numpy GaussianHMM oracle from
                        tests/test_hmmlearn_parity.py (itself validated
                        against hmmlearn's published algorithm + the real
                        sklearn KMeans init);
  * pyabf / neo      -> import-only placeholders (loader methods that need
                        them are exactly the ones these tests never call).

Everything else — numpy, scipy.signal.spectrogram, matplotlib, csv — is the
real installed library, so the reference's compute, interaction and export
logic runs unmodified.

Tests that use this module must skip when the reference checkout is absent
(the repo stays standalone): use the `reference` fixture from
tests/test_reference_differential.py or check `available()` first.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from pathlib import Path

REF_DIR = Path(os.environ.get("SPECTRAL_TPU_REFERENCE", "/root/reference"))

_cache = None


def available() -> bool:
    return (REF_DIR / "PlotEngine.py").is_file()


class _RefHMM:
    """hmmlearn.hmm.GaussianHMM stand-in backed by the float64 numpy oracle
    (tests/test_hmmlearn_parity.py::HmmlearnOracle). Attribute contract used
    by PlotEngine: n_components, fit, predict, means_, covars_, transmat_,
    startprob_ (the last four are also assigned externally by
    _train_supervised, PlotEngine.py:357-386)."""

    def __init__(self, n_components, covariance_type="diag", n_iter=100,
                 random_state=42):
        assert covariance_type == "diag", covariance_type
        from test_hmmlearn_parity import HmmlearnOracle
        self._oracle = HmmlearnOracle(n_components, n_iter=n_iter,
                                      random_state=random_state)
        self.n_components = n_components

    def fit(self, X):
        self._oracle.fit(X)
        return self

    def predict(self, X):
        return self._oracle.predict(X)

    # parameter attributes proxy to the oracle so external assignment
    # (supervised training) and post-fit reads share one store
    def __getattr__(self, name):
        if name.endswith("_") and not name.startswith("_"):
            return getattr(self.__dict__["_oracle"], name)
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name.endswith("_") and not name.startswith("_"):
            setattr(self._oracle, name, value)
        else:
            object.__setattr__(self, name, value)


def _import_from(path: Path, modname: str):
    """Import under the module's canonical name so siblings can resolve it
    (GUI.py does `from PlotEngine import PlotEngine`); load() pops every
    canonical name from sys.modules once all four are in."""
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def load():
    """Import the three reference modules with stubs in place; returns a
    namespace (PlotEngine, ExportManager, SweepManager classes + the qt stub
    module for scripting menus/dialogs). Cached per process."""
    global _cache
    if _cache is not None:
        return _cache
    if not available():
        raise RuntimeError(f"reference checkout not found at {REF_DIR}")

    import qt_stub
    import matplotlib
    matplotlib.use("Agg", force=True)
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    saved = {name: sys.modules.get(name) for name in (
        "PyQt5", "PyQt5.QtCore", "PyQt5.QtGui", "PyQt5.QtWidgets",
        "matplotlib.backends.backend_qt5agg", "hmmlearn", "hmmlearn.hmm",
        "pyabf", "neo", "neo.io",
        "PlotEngine", "ExportManager", "SweepManager", "GUI")}

    qt_stub.install()

    agg_backend = types.ModuleType("matplotlib.backends.backend_qt5agg")
    agg_backend.FigureCanvasQTAgg = FigureCanvasAgg
    sys.modules["matplotlib.backends.backend_qt5agg"] = agg_backend

    hmm_mod = types.ModuleType("hmmlearn.hmm")
    hmm_mod.GaussianHMM = _RefHMM
    hmmlearn_mod = types.ModuleType("hmmlearn")
    hmmlearn_mod.hmm = hmm_mod
    sys.modules["hmmlearn"] = hmmlearn_mod
    sys.modules["hmmlearn.hmm"] = hmm_mod

    pyabf_mod = types.ModuleType("pyabf")
    pyabf_mod.ABF = None  # import-only: _load_abf is never exercised
    sys.modules["pyabf"] = pyabf_mod
    neo_io_mod = types.ModuleType("neo.io")
    neo_io_mod.NixIO = None  # import-only: _load_h5 is never exercised
    neo_mod = types.ModuleType("neo")
    neo_mod.io = neo_io_mod
    sys.modules["neo"] = neo_mod
    sys.modules["neo.io"] = neo_io_mod

    try:
        plot_engine = _import_from(REF_DIR / "PlotEngine.py", "PlotEngine")
        export_manager = _import_from(REF_DIR / "ExportManager.py",
                                      "ExportManager")
        sweep_manager = _import_from(REF_DIR / "SweepManager.py",
                                     "SweepManager")
        gui = _import_from(REF_DIR / "GUI.py", "GUI")
    finally:
        # restore sys.modules exactly; the reference modules keep the stub
        # classes alive through their own globals
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod

    _cache = types.SimpleNamespace(
        PlotEngine=plot_engine.PlotEngine,
        ExportManager=export_manager.ExportManager,
        SweepManager=sweep_manager.SweepManager,
        GUI=gui.SpectrogramGeneratorGUI,
        plot_engine_mod=plot_engine,
        export_manager_mod=export_manager,
        sweep_manager_mod=sweep_manager,
        gui_mod=gui,
        qt_stub=qt_stub,
    )
    return _cache


def make_gui():
    """A fresh reference SpectrogramGeneratorGUI on the qt stub (its
    PlotEngine canvas renders on the real Agg backend). Call
    qt_stub.QSettings._stores.clear() in the test if settings isolation
    matters — the reference persists under ("MyCompany",
    "SpectrogramGenerator")."""
    ref = load()
    win = ref.GUI()
    win.canvas.parent = lambda: win  # FigureCanvasAgg has no parent()
    return win


def make_engine():
    """A fresh reference PlotEngine on the real Agg canvas, patched only in
    ways that do not touch its logic: a parent() callable (FigureCanvasAgg
    has none; on_press's QMenu wants one, PlotEngine.py:554) and an explicit
    clear() so attributes that only clear() initializes exist."""
    ref = load()
    engine = ref.PlotEngine()
    engine.parent = lambda: None
    engine.clear()
    return engine
