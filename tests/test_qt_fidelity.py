"""Stub-fidelity proof for the Qt shell (VERDICT r3 item 7 / missing #2).

PyQt5 cannot be installed in this image (verified again this round:
``pip download PyQt5`` finds no distribution — recorded in
docs/OPERATIONS.md), so gui/app.py has only ever executed against
tests/qt_stub.py. These tests close the gap a test double leaves open: a
stub bug (wrong enum value, a signal emitting a different shape than real
Qt, a handler that real Qt would call with more arguments than it
accepts) passes the stub-driven suite and only explodes on a desktop.

The manifest below pins the RELEVANT slice of the public PyQt5 5.15 API —
every class, method, static function, enum value, and signal arity that
gui/app.py touches — transcribed from the published Qt5/PyQt5 reference
(Qt namespace enum values are ABI-stable constants: Qt.UserRole = 256,
Qt.CustomContextMenu = 3, QAbstractItemView.ExtendedSelection = 3).
The tests then assert, by AST inspection of gui/app.py and the stub:

  1. every Qt symbol the app references exists in the manifest (no
     unreviewed Qt usage can appear without extending the manifest);
  2. the stub provides each referenced class/attribute, and every pinned
     enum VALUE on the stub equals real PyQt5's;
  3. every signal->slot connect in the app is call-compatible with the
     REAL signal's arity (PyQt5 permits slots accepting fewer arguments,
     never more required ones) — independent of how the stub emits.

Reference behavior being protected: GUI.py:12-187 (widget tree + signal
wiring) executed under real PyQt5 at GUI.py:588-598.
"""

import ast
import inspect
import os

import pytest

APP_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                        "spectral_tpu", "gui", "app.py")

# --------------------------------------------------------------------------
# PyQt5 5.15 public-API manifest (hand-pinned from the published docs)
# --------------------------------------------------------------------------

# class -> methods/attributes gui/app.py may call on instances (or the
# class, for statics). Presence in PyQt5 5.15 verified against the
# published API; this is the allowlist the AST scan checks against.
QT_CLASSES = {
    "QtWidgets.QMainWindow": {"setWindowTitle", "setCentralWidget",
                              "resize", "show"},
    "QtWidgets.QWidget": {"setEnabled", "show"},
    "QtWidgets.QApplication": {"processEvents", "exec_", "exit"},
    "QtWidgets.QHBoxLayout": {"addWidget", "addLayout"},
    "QtWidgets.QVBoxLayout": {"addWidget", "addLayout"},
    "QtWidgets.QFormLayout": {"addRow"},
    "QtWidgets.QPushButton": {"clicked", "setEnabled", "setText"},
    "QtWidgets.QCheckBox": {"toggled", "isChecked", "setChecked",
                            "setEnabled"},
    "QtWidgets.QComboBox": {"addItems", "currentText", "setCurrentText",
                            "currentTextChanged"},
    "QtWidgets.QSpinBox": {"setRange", "setSingleStep", "setValue",
                           "value", "valueChanged"},
    "QtWidgets.QDoubleSpinBox": {"setRange", "setSingleStep", "setValue",
                                 "value", "valueChanged"},
    "QtWidgets.QLabel": {"setText", "text"},
    "QtWidgets.QTextEdit": {"setReadOnly", "setText"},
    "QtWidgets.QTreeWidget": {"setHeaderLabel", "setSelectionMode",
                              "setContextMenuPolicy", "addTopLevelItem",
                              "takeTopLevelItem", "indexOfTopLevelItem",
                              "selectedItems", "selectAll",
                              "clearSelection", "clear",
                              "itemClicked", "customContextMenuRequested"},
    "QtWidgets.QTreeWidgetItem": {"setText", "text", "setData", "data",
                                  "setSelected"},
    "QtWidgets.QMenu": {"addAction", "exec_"},
    "QtWidgets.QDialog": {"setWindowTitle", "exec_", "accept", "resize"},
    "QtWidgets.QMessageBox": {"critical", "information", "warning"},
    "QtWidgets.QFileDialog": {"getOpenFileNames", "getSaveFileName",
                              "getExistingDirectory"},
    "QtWidgets.QAbstractItemView": {"ExtendedSelection"},
    "QtCore.QSettings": {"value", "setValue"},
    "QtCore.Qt": {"UserRole", "CustomContextMenu"},
    "QtGui.QCursor": {"pos"},
}

# enum/constant integer values — ABI-stable in Qt5, the exact class of
# stub bug the verdict warns about
QT_ENUM_VALUES = {
    ("Qt", "UserRole"): 256,            # Qt::ItemDataRole
    ("Qt", "CustomContextMenu"): 3,     # Qt::ContextMenuPolicy
    ("QAbstractItemView", "ExtendedSelection"): 3,  # SelectionMode
}

# signal name -> number of arguments real PyQt5 delivers to a slot that
# accepts them all (slots may accept fewer; never more required ones)
QT_SIGNAL_ARITY = {
    "clicked": 1,                   # QAbstractButton.clicked(checked)
    "toggled": 1,                   # QAbstractButton.toggled(checked)
    "currentTextChanged": 1,        # QComboBox(str)
    "valueChanged": 1,              # Q(Double)SpinBox(int/float)
    "itemClicked": 2,               # QTreeWidget(item, column)
    "customContextMenuRequested": 1,  # QWidget(QPoint)
}


def _app_tree():
    with open(APP_PATH) as fh:
        return ast.parse(fh.read())


def _qt_refs(tree):
    """Every QtWidgets/QtCore/QtGui.<Name>[.<attr>] reference in app.py."""
    refs = set()
    attrs = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute):
            v = node.value
            if (isinstance(v, ast.Name)
                    and v.id in ("QtWidgets", "QtCore", "QtGui")):
                refs.add(f"{v.id}.{node.attr}")
            if (isinstance(v, ast.Attribute)
                    and isinstance(v.value, ast.Name)
                    and v.value.id in ("QtWidgets", "QtCore", "QtGui")):
                attrs.add((f"{v.value.id}.{v.attr}", node.attr))
    return refs, attrs


def test_every_qt_symbol_app_touches_is_in_the_manifest():
    refs, attrs = _qt_refs(_app_tree())
    unknown = refs - set(QT_CLASSES)
    assert not unknown, (
        f"gui/app.py references Qt classes missing from the PyQt5 "
        f"manifest (extend tests/test_qt_fidelity.py after checking the "
        f"published API): {sorted(unknown)}")
    for cls, attr in attrs:
        assert cls in QT_CLASSES, (cls, attr)
        assert attr in QT_CLASSES[cls], (
            f"{cls}.{attr} used by gui/app.py but not pinned in the "
            f"manifest — verify it exists in PyQt5 5.15 and add it")


def test_stub_provides_every_referenced_class_and_pinned_enum_values():
    import sys
    import qt_stub
    qt_stub.install()
    try:
        mods = {"QtWidgets": sys.modules["PyQt5.QtWidgets"],
                "QtCore": sys.modules["PyQt5.QtCore"],
                "QtGui": sys.modules["PyQt5.QtGui"]}
        refs, attrs = _qt_refs(_app_tree())
        _assert_stub_shape(mods, refs, attrs)
    finally:
        qt_stub.uninstall()


def _assert_stub_shape(mods, refs, attrs):
    for ref in sorted(refs):
        mod, name = ref.split(".")
        assert hasattr(mods[mod], name), f"stub lacks {ref}"
    for cls, attr in sorted(attrs):
        mod, name = cls.split(".")
        holder = getattr(mods[mod], name)
        assert hasattr(holder, attr), f"stub lacks {cls}.{attr}"
    for (cls, name), want in QT_ENUM_VALUES.items():
        for mod in mods.values():
            if hasattr(mod, cls):
                got = getattr(getattr(mod, cls), name)
                assert int(got) == want, (
                    f"stub {cls}.{name} = {got!r}, real PyQt5 pins {want} "
                    "(ABI-stable Qt5 enum)")
                break
        else:  # pragma: no cover - manifest names a class the stub lacks
            pytest.fail(f"stub has no class {cls}")


def _required_params(fn_node):
    """Minimum positional arguments a def/lambda REQUIRES (excluding
    self), i.e. what a Qt signal must supply at minimum."""
    a = fn_node.args
    names = [x.arg for x in a.args]
    if names and names[0] == "self":
        names = names[1:]
    return max(0, len(names) - len(a.defaults))


def test_every_connected_slot_is_call_compatible_with_the_real_signal():
    """PyQt5 calls a slot with up to the signal's argument count; a slot
    REQUIRING more positional args than the signal carries raises
    TypeError on a real desktop — the exact failure mode a permissive
    stub hides."""
    tree = _app_tree()
    # collect method defs (MainWindow methods) by name
    defs = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            defs[node.name] = node
    checked = 0
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "connect"
                and isinstance(node.func.value, ast.Attribute)):
            continue
        signal = node.func.value.attr
        if signal not in QT_SIGNAL_ARITY:
            continue            # mpl_connect etc. are not Qt signals
        arity = QT_SIGNAL_ARITY[signal]
        handler = node.args[0]
        if isinstance(handler, ast.Lambda):
            need = _required_params(handler)
        elif (isinstance(handler, ast.Attribute)
              and isinstance(handler.value, ast.Name)
              and handler.value.id == "self"
              and handler.attr in defs):
            need = _required_params(defs[handler.attr])
        else:
            continue            # dlg.accept / local callables: Qt builtins
        checked += 1
        assert need <= arity, (
            f"slot for {signal!r} requires {need} args but real PyQt5 "
            f"delivers at most {arity}")
    assert checked >= 15, f"only {checked} connects checked — scan broken?"


def test_settings_value_signature_matches_pyqt5():
    """QSettings.value(key, defaultValue=None, type=...) — the stub must
    accept the keyword PyQt5 documents (`type`), or real-Qt code written
    against the stub dies on the desktop."""
    import qt_stub
    sig = inspect.signature(qt_stub.QSettings.value)
    assert "type" in sig.parameters
    s = qt_stub.QSettings("fidelity", "probe")
    s.setValue("k", "1")
    assert s.value("k", 0, type=int) == 1
    assert s.value("missing", 2.5, type=float) == 2.5


def test_filedialog_statics_return_pyqt5_shapes():
    """PyQt5's static dialogs return (value, selectedFilter) TUPLES for
    getOpenFileNames/getSaveFileName and a bare str for
    getExistingDirectory — shape bugs here break every export handler."""
    import qt_stub
    qt_stub.QFileDialog.next_open_files = ["a.wav"]
    names, filt = qt_stub.QFileDialog.getOpenFileNames(
        None, "t", "", "All (*)")
    assert names == ["a.wav"] and isinstance(filt, str)
    qt_stub.QFileDialog.next_save_file = "out.csv"
    path, filt = qt_stub.QFileDialog.getSaveFileName(None, "t", "", "x")
    assert path == "out.csv" and isinstance(filt, str)
    qt_stub.QFileDialog.next_directory = "/tmp"
    out = qt_stub.QFileDialog.getExistingDirectory(None, "t", "")
    assert out == "/tmp" and isinstance(out, str)
