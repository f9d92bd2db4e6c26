"""Minimal PyQt5-compatible stub so the Qt shell (gui/app.py) can execute
headless in tests.

PyQt5 is not installable in this environment, which round 1 left as "GUI
client code has never executed". This stub implements just enough of the
widget API surface the shell touches — construction, signal connect/emit,
value get/set, QSettings persistence, dialogs returning scripted values —
to drive the real wiring: clicking buttons, toggling checkboxes, mouse
events through the matplotlib-canvas stub, settings round-trips.
"""

from __future__ import annotations

import sys
import types


class _Signal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *a):
        for fn in list(self._slots):
            fn(*a)


class QObject:
    def __init__(self, *a, **k):
        pass


class QSettings(QObject):
    _stores: dict = {}

    def __init__(self, org, app):
        self._store = QSettings._stores.setdefault((org, app), {})

    def value(self, key, default=None, type=None, typ=None):
        # Qt's keyword is `type=`; the positional third argument lands there
        # too. `typ=` kept for older callers.
        t = type if type is not None else typ
        v = self._store.get(key, default)
        if t is bool:
            return bool(v)
        if t is int:
            return int(v)
        if t is float:
            return float(v)
        if t is str:
            return "" if v is None else str(v)
        return v

    def setValue(self, key, v):
        self._store[key] = v


class Qt:
    UserRole = 256
    CustomContextMenu = 3
    Horizontal = 1
    Vertical = 2


class QPoint:
    pass


class QCursor:
    @staticmethod
    def pos():
        return QPoint()


class _Widget(QObject):
    def __init__(self, *a, **k):
        super().__init__()
        self._enabled = True
        self._visible = False

    def setEnabled(self, v):
        self._enabled = bool(v)

    def isEnabled(self):
        return self._enabled

    def show(self):
        self._visible = True

    def resize(self, w, h):
        pass

    def setWindowTitle(self, t):
        self._title = t

    def setCentralWidget(self, w):
        self._central = w

    def addWidget(self, w, *a):
        pass

    def addLayout(self, l, *a):
        pass

    def setLayout(self, l):
        pass

    def setToolTip(self, t):
        pass


class QWidget(_Widget):
    pass


class QMainWindow(_Widget):
    pass


class QSplitter(_Widget):
    def __init__(self, orientation=None):
        super().__init__()

    def setSizes(self, sizes):
        pass

    def setStretchFactor(self, index, factor):
        pass


class QGroupBox(_Widget):
    pass


class QFrame(_Widget):
    pass


class _Layout(QObject):
    def __init__(self, parent=None):
        super().__init__()
        self.items = []
        if parent is not None:      # QVBoxLayout(dialog) attaches itself
            parent._layout = self

    def addWidget(self, w, *a, **k):
        self.items.append(w)

    def addLayout(self, l, *a, **k):
        self.items.append(l)

    def addRow(self, a, b=None):
        self.items.append((a, b))

    def addStretch(self, stretch=0):
        pass


class QHBoxLayout(_Layout):
    pass


class QVBoxLayout(_Layout):
    pass


class QFormLayout(_Layout):
    pass


class QGridLayout(_Layout):
    pass


class QAbstractItemView:
    ExtendedSelection = 3


class QTreeWidgetItem:
    def __init__(self, texts):
        self._texts = list(texts)
        self._data = {}
        self._selected = False

    def setData(self, col, role, value):
        self._data[(col, role)] = value

    def data(self, col, role):
        return self._data.get((col, role))

    def setSelected(self, v):
        self._selected = bool(v)


class QTreeWidget(_Widget):
    def __init__(self):
        super().__init__()
        self._items = []
        self.customContextMenuRequested = _Signal()
        self.itemClicked = _Signal()

    def clearSelection(self):
        for i in self._items:
            i.setSelected(False)

    def setHeaderLabel(self, s):
        pass

    def setHeaderHidden(self, v):
        pass

    def setIndentation(self, n):
        pass

    def viewport(self):
        class _Viewport:
            @staticmethod
            def mapToGlobal(pos):
                return pos
        return _Viewport()

    def setSelectionMode(self, m):
        pass

    def setContextMenuPolicy(self, p):
        pass

    def addTopLevelItem(self, item):
        self._items.append(item)

    def topLevelItemCount(self):
        return len(self._items)

    def topLevelItem(self, i):
        return self._items[i]

    def indexOfTopLevelItem(self, item):
        return self._items.index(item)

    def takeTopLevelItem(self, i):
        return self._items.pop(i)

    def selectAll(self):
        for i in self._items:
            i.setSelected(True)

    def clear(self):
        self._items = []

    def selectedItems(self):
        return [i for i in self._items if i._selected]


class QPushButton(_Widget):
    def __init__(self, label=""):
        super().__init__()
        self.label = label
        self.clicked = _Signal()

    def click(self):
        if self._enabled:
            self.clicked.emit()


class QCheckBox(_Widget):
    def __init__(self, label=""):
        super().__init__()
        self.label = label
        self._checked = False
        self.toggled = _Signal()

    def setChecked(self, v):
        changed = bool(v) != self._checked
        self._checked = bool(v)
        if changed:
            self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked


class QComboBox(_Widget):
    def __init__(self):
        super().__init__()
        self._items = []
        self._current = ""
        self.currentTextChanged = _Signal()

    def addItems(self, items):
        self._items += list(items)
        if not self._current and self._items:
            self._current = self._items[0]

    def setCurrentText(self, t):
        if t in self._items and t != self._current:
            self._current = t
            self.currentTextChanged.emit(t)
        elif t in self._items:
            self._current = t

    def currentText(self):
        return self._current

    def findText(self, t):
        return self._items.index(t) if t in self._items else -1

    def setCurrentIndex(self, i):
        if 0 <= i < len(self._items):
            self.setCurrentText(self._items[i])


class _SpinBase(_Widget):
    def __init__(self):
        super().__init__()
        self._value = 0
        self.valueChanged = _Signal()

    def setRange(self, lo, hi):
        self._lo, self._hi = lo, hi

    def setSingleStep(self, s):
        pass

    def setValue(self, v):
        changed = v != self._value
        self._value = v
        if changed:
            self.valueChanged.emit(v)

    def value(self):
        return self._value


class QSpinBox(_SpinBase):
    pass


class QDoubleSpinBox(_SpinBase):
    pass


class QLabel(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self._text = text

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QTextEdit(_Widget):
    def __init__(self):
        super().__init__()
        self._text = ""
        self._read_only = False

    def setReadOnly(self, v):
        self._read_only = bool(v)

    def setText(self, t):
        self._text = t

    def toPlainText(self):
        return self._text


class QDialog(_Widget):
    """Modal stand-in: exec_ records the instance so tests can inspect
    the widgets a handler put inside (e.g. the band-power QTextEdit)."""
    shown: list = []

    def __init__(self, parent=None):
        super().__init__()
        self.accepted = False

    def accept(self):
        self.accepted = True

    def exec_(self):
        QDialog.shown.append(self)
        return 1


class QFileDialog:
    # tests script the next return values here; every call is recorded as
    # (method, title, default_path) so tests can assert dialog arguments
    next_open_files: list = []
    next_save_file: str = ""
    next_directory: str = ""
    calls: list = []

    @staticmethod
    def getOpenFileNames(parent, title, d, filt):
        QFileDialog.calls.append(("open", title, d))
        files, QFileDialog.next_open_files = QFileDialog.next_open_files, []
        return files, filt

    @staticmethod
    def getSaveFileName(parent, title, d, filt):
        QFileDialog.calls.append(("save", title, d))
        f, QFileDialog.next_save_file = QFileDialog.next_save_file, ""
        return f, filt

    @staticmethod
    def getExistingDirectory(parent, title, d=""):  # d optional, like Qt
        QFileDialog.calls.append(("dir", title, d))
        f, QFileDialog.next_directory = QFileDialog.next_directory, ""
        return f


class QMessageBox:
    calls: list = []

    @staticmethod
    def critical(parent, title, text):
        QMessageBox.calls.append(("critical", title, text))

    @staticmethod
    def information(parent, title, text):
        QMessageBox.calls.append(("information", title, text))

    @staticmethod
    def warning(parent, title, text):
        QMessageBox.calls.append(("warning", title, text))


class QInputDialog:
    next_text = ("", False)

    @staticmethod
    def getText(parent, title, label):
        return QInputDialog.next_text


class _MenuAction:
    def __init__(self, name):
        self._name = name

    def text(self):
        return self._name


class QMenu(_Widget):
    # tests script which action the "user" picks by name (None = dismiss)
    next_choice: str = None

    def __init__(self, parent=None):
        super().__init__()
        self._actions = []

    def addAction(self, name):
        # Qt returns the created QAction — callers compare exec_'s result
        # against it (e.g. PlotEngine.py:556-565)
        action = _MenuAction(name)
        self._actions.append(action)
        return action

    def exec_(self, pos):
        if QMenu.next_choice is None:
            return None
        for a in self._actions:
            if a.text() == QMenu.next_choice:
                return a
        return None


class QApplication(QObject):
    def __init__(self, argv):
        pass

    def exec_(self):
        return 0

    @staticmethod
    def processEvents():
        pass


class _Canvas(_Widget):
    """FigureCanvasQTAgg stand-in: records mpl_connect handlers so tests can
    synthesize mouse events into the real controller wiring."""

    def __init__(self, figure):
        super().__init__()
        self.figure = figure
        self.handlers = {}
        self.draw_calls = 0
        self.restored = []
        self.blit_calls = 0

    def mpl_connect(self, name, fn):
        self.handlers[name] = fn

    def draw(self):
        self.draw_calls += 1

    # blitting surface (FigureCanvasAgg API): recording fakes so the
    # window's blit fast path executes under the stub. Background tokens
    # are opaque; pairing restore_region with the token from
    # copy_from_bbox is exactly what the blit recipe requires.
    def copy_from_bbox(self, bbox):
        return ("bg", bbox)

    def restore_region(self, bg):
        self.restored.append(bg)

    def blit(self, bbox):
        self.blit_calls += 1


class _Toolbar(_Widget):
    def __init__(self, canvas, parent):
        super().__init__()


class _Axes:
    """matplotlib Axes stand-in: a linear 10-pixels-per-unit data transform
    so tests can exercise the pixel->data fallback."""

    class _Trans:
        class _Inv:
            def transform(self, pt):
                return (pt[0] / 10.0, pt[1] / 10.0)

        def inverted(self):
            return self._Inv()

    transData = _Trans()


class _Event:
    """matplotlib MouseEvent stand-in. Events with data coords always carry
    an axes (as real matplotlib events do); pass inaxes/x/y explicitly to
    model the no-xdata edge."""

    def __init__(self, xdata, button=1, inaxes="auto", x=0.0, y=0.0):
        self.xdata = xdata
        self.button = button
        if inaxes == "auto":
            self.inaxes = _Axes() if xdata is not None else None
        else:
            self.inaxes = inaxes
        self.x = x
        self.y = y


def install():
    """Insert the stub modules into sys.modules (idempotent); returns the
    QtWidgets namespace for scripting dialogs."""
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.QSettings = QSettings
    qtcore.Qt = Qt
    qtcore.QPoint = QPoint
    qtgui = types.ModuleType("PyQt5.QtGui")
    qtgui.QCursor = QCursor
    qtw = types.ModuleType("PyQt5.QtWidgets")
    for name, obj in globals().items():
        if name.startswith("Q"):
            setattr(qtw, name, obj)
    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore = qtcore
    pyqt5.QtGui = qtgui
    pyqt5.QtWidgets = qtw
    sys.modules["PyQt5"] = pyqt5
    sys.modules["PyQt5.QtCore"] = qtcore
    sys.modules["PyQt5.QtGui"] = qtgui
    sys.modules["PyQt5.QtWidgets"] = qtw

    backend = types.ModuleType("matplotlib.backends.backend_qt5agg")
    backend.FigureCanvasQTAgg = _Canvas
    backend.NavigationToolbar2QT = _Toolbar
    sys.modules["matplotlib.backends.backend_qt5agg"] = backend
    return qtw


def uninstall():
    for m in ("PyQt5", "PyQt5.QtCore", "PyQt5.QtGui", "PyQt5.QtWidgets",
              "matplotlib.backends.backend_qt5agg"):
        sys.modules.pop(m, None)
