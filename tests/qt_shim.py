"""Minimal PyQt5 test double: just enough of the Qt API surface that
``torchpiv_tpu.gui.app`` uses, so the GUI's wiring (signal connections,
worker thread hand-off, start/stop/pause flow, Database updates, canvas
redraws) can be EXECUTED in CI without a real Qt install or display.

This verifies our code, not Qt: signals are synchronous callbacks, QThread
runs its started-slot inline, widgets store state in plain attributes, and
the matplotlib canvases render through the Agg backend.
"""
from __future__ import annotations

import sys
import types


class _BoundSignal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


class pyqtSignal:  # noqa: N801 - Qt naming
    def __init__(self, *types_):
        self._name = None

    def __set_name__(self, owner, name):
        self._name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        key = "_sig_" + (self._name or str(id(self)))
        sig = obj.__dict__.get(key)
        if sig is None:
            sig = _BoundSignal()
            obj.__dict__[key] = sig
        return sig


def pyqtSlot(*a, **k):  # noqa: N802
    def deco(fn):
        return fn

    return deco


class QObject:
    def __init__(self, *a, **k):
        pass

    def moveToThread(self, thread):
        pass


class QThread(QObject):
    started = pyqtSignal()

    def start(self):
        # Deferred, deterministic model of Qt's thread start: start()
        # returns immediately (so the caller finishes its wiring, e.g. the
        # Start button flips to "Stop" before the worker runs), and wait()
        # executes the started-slot inline on the calling thread.  A real
        # thread here is racy for tests: the worker mutates widgets while
        # the test asserts.
        self._pending = True

    def quit(self):
        pass

    def wait(self):
        if getattr(self, "_pending", False):
            self._pending = False
            self.started.emit()


class QTimer(QObject):
    timeout = pyqtSignal()

    def __init__(self, parent=None):
        super().__init__()
        self._interval = 0
        self.active = False

    def setInterval(self, ms):
        self._interval = ms

    def start(self, *a):
        self.active = True

    def stop(self):
        self.active = False


class _Qt:
    Horizontal = 1
    Vertical = 2


class _QWidgetBase(QObject):
    def __init__(self, *a, **k):
        super().__init__()
        self._children = []

    def setParent(self, p):
        pass

    def show(self):
        pass

    def resize(self, w, h):
        pass

    def setWindowTitle(self, t):
        self._title = t

    def setCentralWidget(self, w):
        self._central = w

    def setWordWrap(self, b):
        pass

    def addWidget(self, w, *a, **k):
        self._children.append(w)

    def setStyle(self, s):
        pass


class QWidget(_QWidgetBase):
    pass


class QMainWindow(_QWidgetBase):
    pass


class QGroupBox(_QWidgetBase):
    def __init__(self, title="", *a, **k):
        super().__init__()
        self._title = title


class _Layout(_QWidgetBase):
    def __init__(self, parent=None):
        super().__init__()

    def addLayout(self, layout, *a, **k):
        self._children.append(layout)

    def addRow(self, *a):
        self._children.append(a)

    def addStretch(self, *a):
        pass


class QFormLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QVBoxLayout(_Layout):
    pass


class QComboBox(_QWidgetBase):
    def __init__(self):
        super().__init__()
        self._items = []
        self._current = ""
        self.currentTextChanged = _BoundSignal()

    def addItems(self, items):
        items = list(items)
        self._items.extend(items)
        if items and not self._current:
            self._current = items[0]

    def setCurrentText(self, text):
        self._current = text
        self.currentTextChanged.emit(text)

    def currentText(self):
        return self._current

    def count(self):
        return len(self._items)

    def itemText(self, i):
        return self._items[i]

    def clear(self):
        self._items = []
        self._current = ""


class QSpinBox(_QWidgetBase):
    def __init__(self):
        super().__init__()
        self._value = 0

    def setRange(self, lo, hi):
        self._lo, self._hi = lo, hi

    def setValue(self, v):
        self._value = v

    def value(self):
        return self._value


class QSlider(_QWidgetBase):
    def __init__(self, orientation=None):
        super().__init__()
        self._value = 0
        self._min = 0
        self._max = 99
        self.valueChanged = _BoundSignal()

    def setMaximum(self, m):
        self._max = m

    def setMinimum(self, m):
        self._min = m

    def setRange(self, lo, hi):
        self._min, self._max = lo, hi

    def minimum(self):
        return self._min

    def maximum(self):
        return self._max

    def setValue(self, v):
        self._value = v
        self.valueChanged.emit(v)

    def value(self):
        return self._value


class QLineEdit(_QWidgetBase):
    def __init__(self, text=""):
        super().__init__()
        self._text = str(text)

    def setText(self, t):
        self._text = str(t)

    def text(self):
        return self._text

    def setPlaceholderText(self, t):
        self._placeholder = str(t)


class QLabel(QLineEdit):
    pass


class QPushButton(_QWidgetBase):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._checkable = False
        self._checked = False
        self.clicked = _BoundSignal()
        self.toggled = _BoundSignal()

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text

    def setCheckable(self, b):
        self._checkable = b

    def setChecked(self, b):
        b = bool(b)
        if b != self._checked:
            self._checked = b
            self.toggled.emit(b)

    def isChecked(self):
        return self._checked

    def click(self):
        if self._checkable:
            self._checked = not self._checked
            self.toggled.emit(self._checked)
        self.clicked.emit()


class QCheckBox(QPushButton):
    def __init__(self, text=""):
        super().__init__(text)
        self._checkable = True


class QProgressBar(_QWidgetBase):
    def __init__(self):
        super().__init__()
        self._value = 0
        self.values = []

    def setValue(self, v):
        self._value = v
        self.values.append(v)

    def value(self):
        return self._value


class QMessageBox(_QWidgetBase):
    critical_calls = []
    information_calls = []

    @classmethod
    def critical(cls, parent, title, text):
        cls.critical_calls.append((title, text))

    @classmethod
    def information(cls, parent, title, text):
        cls.information_calls.append((title, text))


class QFileDialog(_QWidgetBase):
    existing_directory = ""
    open_file = ("", "")

    @classmethod
    def getExistingDirectory(cls, *a, **k):
        return cls.existing_directory

    @classmethod
    def getOpenFileName(cls, *a, **k):
        return cls.open_file


class QApplication(_QWidgetBase):
    _instance = None

    def __init__(self, argv):
        super().__init__()
        QApplication._instance = self

    @classmethod
    def instance(cls):
        return cls._instance

    def exec_(self):
        return 0


def install():
    """Register the shim as PyQt5 + the matplotlib qt5agg backend and return
    a context ticket (the replaced modules) for uninstall()."""
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    class FigureCanvasQTAgg(FigureCanvasAgg):
        pass

    class NavigationToolbar2QT(_QWidgetBase):
        def __init__(self, canvas, parent):
            super().__init__()

    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.QObject = QObject
    qtcore.QThread = QThread
    qtcore.QTimer = QTimer
    qtcore.Qt = _Qt
    qtcore.pyqtSignal = pyqtSignal
    qtcore.pyqtSlot = pyqtSlot

    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    for name, obj in globals().items():
        if name.startswith("Q"):
            setattr(qtwidgets, name, obj)

    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore = qtcore
    pyqt5.QtWidgets = qtwidgets

    backend = types.ModuleType("matplotlib.backends.backend_qt5agg")
    backend.FigureCanvasQTAgg = FigureCanvasQTAgg
    backend.NavigationToolbar2QT = NavigationToolbar2QT

    saved = {}
    for name, mod in [
        ("PyQt5", pyqt5),
        ("PyQt5.QtCore", qtcore),
        ("PyQt5.QtWidgets", qtwidgets),
        ("matplotlib.backends.backend_qt5agg", backend),
    ]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    return saved


def uninstall(saved):
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
