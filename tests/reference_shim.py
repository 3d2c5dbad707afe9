"""Execute the reference's own Python code in-process for true golden parity.

VERDICT.md (round 1, Weak #7) noted that golden parity was checked against
in-test transcriptions because the reference cannot run in this image.  Its
actual blockers are only *packaging*: ``numba`` (used purely as a JIT
decorator on pure-numpy kernels), ``soundfile`` (file I/O), and ``pyfftw``
(optional, guarded by try/except in the reference).  None of them changes
numerics, so we stub the first two — an identity ``@jit`` and a soundfile
facade over our native codec — put ``/root/reference`` on ``sys.path`` and
import the reference's ``util`` modules unmodified.  Tests then compare our
TPU-native implementations against outputs computed by the reference's real
code (wow_detection.py, fourier.py, resampling.py, decompose.py, ...).

Everything degrades to a pytest skip when the reference tree is absent, so
the suite stays green for standalone users of this repo.

SECURITY: importing the reference executes its Python code in the test
process.  That is intentional and acceptable ONLY inside this sandboxed CI
image where /root/reference is a fixed read-only checkout; do not point
REFERENCE_DIR at an unreviewed tree, and pin/verify the checkout revision
before running the golden suite elsewhere.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import os
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path(os.environ.get("PYAUDIO_REFERENCE", "/root/reference"))

_loaded: dict[str, types.ModuleType] = {}


def reference_available() -> bool:
    return (REFERENCE_ROOT / "util" / "fourier.py").is_file()


def _install_numba_stub() -> None:
    """numba is only used as ``@jit`` on pure-numpy functions; run them plain."""
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    numba.jit = jit
    numba.njit = jit
    numba.prange = range
    sys.modules["numba"] = numba


def _install_soundfile_stub() -> None:
    """Minimal soundfile facade over our native WAV/FLAC codec."""
    if "soundfile" in sys.modules:
        return
    from pyaudiorestoration_tpu.utils import audio_io

    sf = types.ModuleType("soundfile")

    def read(path, always_2d=False, dtype="float32", **kwargs):
        sig, sr, _ = audio_io.read_file(str(path))
        sig = sig.astype(dtype)
        if not always_2d and sig.shape[1] == 1:
            sig = sig[:, 0]
        return sig, sr

    def write(path, data, samplerate, subtype=None, **kwargs):
        audio_io.write_wav(str(path), np.asarray(data, np.float32),
                           int(samplerate))

    class SoundFile:
        """Subset used by io_ops.read_file (io_ops.py:7-16) and
        resampling.run's writer (resampling.py:234-239)."""

        def __init__(self, path, mode="r", samplerate=None, channels=None,
                     subtype=None, **kwargs):
            self._path = str(path)
            self._chunks = []
            if mode == "r":
                self._data, self.samplerate = read(self._path, always_2d=True)
                self.channels = self._data.shape[1]
            else:
                self.samplerate = samplerate
                self.channels = channels

        def read(self, always_2d=False, dtype="float32", **kwargs):
            data = self._data.astype(dtype)
            if not always_2d and data.shape[1] == 1:
                data = data[:, 0]
            return data

        def __enter__(self):
            return self

        def write(self, data):
            self._chunks.append(np.asarray(data, np.float32))

        def __exit__(self, *exc):
            if self._chunks and exc[0] is None:
                audio_io.write_wav(self._path,
                                   np.concatenate(self._chunks, axis=0),
                                   int(self.samplerate))
            return False

    sf.read = read
    sf.write = write
    sf.SoundFile = SoundFile
    sys.modules["soundfile"] = sf


class _AnyMeta(type):
    def __getattr__(cls, name):
        return _Any


class _Any(metaclass=_AnyMeta):
    """Attribute/call-tolerant dummy standing in for Qt/vispy objects.

    Works as a base class (tool windows subclass QtWidgets.QMainWindow), as a
    callable (QtGui.QIcon(), pyqtSignal(int)), and as an attribute chain
    (scene.visuals.Line).  Nothing GUI-side is ever *executed* by the golden
    tests — the stubs only make module import succeed."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return _Any()

    def __getattr__(self, name):
        return _Any()


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so submodule imports reach the finder

    def module_getattr(attr, _name=name):
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        return _Any

    mod.__getattr__ = module_getattr
    return mod


_STUB_ROOTS = ("PyQt5", "vispy", "librosa", "sounddevice", "resampy")


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Auto-creates inert stub modules for any import under _STUB_ROOTS
    (PyQt5.QtWidgets, vispy.visuals.axis, ...)."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in _STUB_ROOTS:
            return importlib.util.spec_from_loader(fullname, self,
                                                   is_package=True)
        return None

    def create_module(self, spec):
        return _stub_module(spec.name)

    def exec_module(self, module):
        pass


def _install_qt_stub() -> None:
    """Make the reference's GUI-facing imports resolve to inert dummies.

    Covers PyQt5, vispy, librosa and matplotlib's Qt backends, so all nine
    tool modules import and their module-level pure functions
    (difeq_gui.get_eq, humspeed_gui.get_spectrum, dropouts_gui.pairwise,
    dropout detection heuristics, ...) become golden-testable."""
    if any(isinstance(f, _StubFinder) for f in sys.meta_path):
        return
    sys.meta_path.insert(0, _StubFinder())
    for name in ("matplotlib.backends.backend_qt5",
                 "matplotlib.backends.backend_qt5agg"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    # scipy removed the scipy.ndimage.filters alias namespace that
    # experiments/decompressor_cmd.py:7 imports from
    if "scipy.ndimage.filters" not in sys.modules:
        import scipy.ndimage

        alias = types.ModuleType("scipy.ndimage.filters")
        alias.uniform_filter1d = scipy.ndimage.uniform_filter1d
        alias.median_filter = scipy.ndimage.median_filter
        sys.modules["scipy.ndimage.filters"] = alias


def load_tool(module_name: str) -> types.ModuleType:
    """Import a reference tool module (e.g. 'difeq_gui') or experiment
    ('experiments.decompressor_cmd') with the GUI stack stubbed out."""
    key = f"tool:{module_name}"
    if key in _loaded:
        return _loaded[key]
    if not reference_available():
        raise RuntimeError("reference tree not available")
    os.environ.setdefault("MPLBACKEND", "Agg")
    _install_numba_stub()
    _install_soundfile_stub()
    _install_qt_stub()
    for p in (str(REFERENCE_ROOT), str(REFERENCE_ROOT / "experiments")):
        if p not in sys.path:
            sys.path.insert(0, p)
    mod = importlib.import_module(module_name)
    _loaded[key] = mod
    return mod


def extract_function(relpath: str, func_name: str, namespace: dict):
    """Exec a single module-level function from a reference file that cannot
    be imported whole (e.g. experiments/group_delay.py runs hardcoded-path
    code at module level).  ``namespace`` supplies its globals."""
    import ast

    src = (REFERENCE_ROOT / relpath).read_text()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            code = compile(ast.Module(body=[node], type_ignores=[]),
                           str(REFERENCE_ROOT / relpath), "exec")
            exec(code, namespace)
            return namespace[func_name]
    raise KeyError(f"{func_name} not found in {relpath}")


def load(module_name: str) -> types.ModuleType:
    """Import ``util.<module_name>`` from the reference tree (cached)."""
    if module_name in _loaded:
        return _loaded[module_name]
    if not reference_available():
        raise RuntimeError("reference tree not available")
    os.environ.setdefault("MPLBACKEND", "Agg")
    _install_numba_stub()
    _install_soundfile_stub()
    _install_qt_stub()  # some util modules import vispy/Qt (markers, spectrum)
    ref_path = str(REFERENCE_ROOT)
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    mod = importlib.import_module(f"util.{module_name}")
    _loaded[module_name] = mod
    return mod
