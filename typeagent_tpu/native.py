"""ctypes bindings for the native runtime (string interner + CSR postings).

The C++ library (native/interner.cpp) is built on demand with g++; when no
compiler is available the pure-Python fallback keeps everything working.
"""

from __future__ import annotations

import ctypes
import os
import types
import subprocess
import sysconfig
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtat_native.so")
_build_lock = threading.Lock()
_lib = None
_load_attempted = False


def _needs_build(so_path: str, src_path: str) -> bool:
    """True when the .so is missing or older than its source (a stale
    binary would silently keep serving old semantics after a source edit —
    the Python-side mtime check also skips the make subprocess entirely
    when the binary is fresh)."""
    if not os.path.exists(so_path):
        return True
    try:
        return os.path.getmtime(src_path) > os.path.getmtime(so_path)
    except OSError:
        return False


def _make(target: str) -> bool:
    """Build one Makefile target with the RUNNING interpreter's headers
    (PATH python3-config may belong to a different install — an ABI
    mismatch the import would only catch at load time)."""
    paths = sysconfig.get_paths()
    includes = {paths.get("include"), paths.get("platinclude")}
    py_includes = " ".join(f"-I{p}" for p in sorted(i for i in includes if i))
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, target, f"PY_INCLUDES={py_includes}"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load_library():
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        _load_attempted = True
        src = os.path.join(_NATIVE_DIR, "interner.cpp")
        if _needs_build(_LIB_PATH, src):
            if not os.path.exists(src):
                return None
            # A failed rebuild with a stale .so on disk falls through to
            # loading the stale binary (degraded but working).
            if not _make("libtat_native.so") and not os.path.exists(_LIB_PATH):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tat_interner_new.restype = ctypes.c_void_p
        lib.tat_interner_free.argtypes = [ctypes.c_void_p]
        lib.tat_intern.restype = ctypes.c_int32
        lib.tat_intern.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
        lib.tat_lookup.restype = ctypes.c_int32
        lib.tat_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
        lib.tat_interner_size.restype = ctypes.c_int64
        lib.tat_interner_size.argtypes = [ctypes.c_void_p]
        lib.tat_postings_add.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
        ]
        lib.tat_postings_size.restype = ctypes.c_int64
        lib.tat_postings_size.argtypes = [ctypes.c_void_p]
        lib.tat_postings_build_csr.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tat_intern_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tat_postings_add_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


_RESULTS_SO = os.path.join(_NATIVE_DIR, "tat_results.so")
_results_mod = None
_results_attempted = False


def load_results_module() -> types.ModuleType | None:
    """The tat_results CPython extension (native result materialization).

    Built on demand from native/results.cpp; returns None when no compiler
    or headers are available (callers keep a pure-Python fallback).
    """
    global _results_mod, _results_attempted
    if _results_mod is not None or _results_attempted:
        return _results_mod
    with _build_lock:
        if _results_mod is not None:
            return _results_mod
        _results_attempted = True
        if os.environ.get("TAT_NATIVE", "1") in ("0", "off"):
            return None
        src = os.path.join(_NATIVE_DIR, "results.cpp")
        if _needs_build(_RESULTS_SO, src):
            if not os.path.exists(src):
                return None
            if not _make("tat_results.so") and not os.path.exists(_RESULTS_SO):
                return None
        try:
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader(
                "tat_results", _RESULTS_SO
            )
            spec = importlib.util.spec_from_loader("tat_results", loader)
            mod = importlib.util.module_from_spec(spec)
            loader.exec_module(mod)
        except Exception:
            return None
        _results_mod = mod
        return _results_mod


class NativeInterner:
    """C++ interner + posting accumulator (terms lowercased on intern)."""

    def __init__(self):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.tat_interner_new()

    def __del__(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.tat_interner_free(self._handle)
            self._handle = None

    def intern(self, term: str) -> int:
        data = term.lower().encode("utf-8")
        return self._lib.tat_intern(self._handle, data, len(data))

    def lookup(self, term: str) -> int:
        data = term.lower().encode("utf-8")
        return self._lib.tat_lookup(self._handle, data, len(data))

    def __len__(self) -> int:
        return self._lib.tat_interner_size(self._handle)

    def add_posting(self, term_id: int, semref_id: int, score: float = 1.0) -> None:
        self._lib.tat_postings_add(self._handle, term_id, semref_id, score)

    def intern_batch(self, terms: list[str]) -> np.ndarray:
        """Intern many terms in one FFI call."""
        encoded = [t.lower().encode("utf-8") for t in terms]
        starts = np.zeros(len(encoded) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in encoded], out=starts[1:])
        blob = b"".join(encoded)
        out = np.zeros(len(encoded), dtype=np.int32)
        self._lib.tat_intern_batch(
            self._handle,
            blob,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(encoded),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out

    def add_postings_batch(
        self, term_ids: np.ndarray, semref_ids: np.ndarray, scores: np.ndarray
    ) -> None:
        term_ids = np.ascontiguousarray(term_ids, dtype=np.int32)
        semref_ids = np.ascontiguousarray(semref_ids, dtype=np.int32)
        scores = np.ascontiguousarray(scores, dtype=np.float32)
        self._lib.tat_postings_add_batch(
            self._handle,
            term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            semref_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(term_ids),
        )

    def posting_count(self) -> int:
        return self._lib.tat_postings_size(self._handle)

    def build_csr(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n_terms = len(self)
        n_postings = self.posting_count()
        offsets = np.zeros(n_terms + 1, dtype=np.int64)
        semrefs = np.zeros(n_postings, dtype=np.int32)
        scores = np.zeros(n_postings, dtype=np.float32)
        self._lib.tat_postings_build_csr(
            self._handle,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            semrefs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return offsets, semrefs, scores


class PyInterner:
    """Pure-Python fallback with the same surface."""

    def __init__(self):
        self._ids: dict[str, int] = {}
        self._postings: list[tuple[int, int, float]] = []

    def intern(self, term: str) -> int:
        key = term.lower()
        ident = self._ids.get(key)
        if ident is None:
            ident = len(self._ids)
            self._ids[key] = ident
        return ident

    def lookup(self, term: str) -> int:
        return self._ids.get(term.lower(), -1)

    def __len__(self) -> int:
        return len(self._ids)

    def add_posting(self, term_id: int, semref_id: int, score: float = 1.0) -> None:
        self._postings.append((term_id, semref_id, score))

    def intern_batch(self, terms: list[str]) -> np.ndarray:
        return np.array([self.intern(t) for t in terms], dtype=np.int32)

    def add_postings_batch(
        self,
        term_ids: np.ndarray,
        semref_ids: np.ndarray,
        scores: np.ndarray,
    ) -> None:
        for tid, sid, score in zip(term_ids, semref_ids, scores):
            self._postings.append((int(tid), int(sid), float(score)))

    def posting_count(self) -> int:
        return len(self._postings)

    def build_csr(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n_terms = len(self._ids)
        counts = np.zeros(n_terms + 1, dtype=np.int64)
        for term_id, _, _ in self._postings:
            counts[term_id + 1] += 1
        offsets = np.cumsum(counts)
        semrefs = np.zeros(len(self._postings), dtype=np.int32)
        scores = np.zeros(len(self._postings), dtype=np.float32)
        cursor = offsets[:-1].copy()
        for term_id, semref_id, score in self._postings:
            pos = cursor[term_id]
            semrefs[pos] = semref_id
            scores[pos] = score
            cursor[term_id] += 1
        return offsets, semrefs, scores


def create_interner() -> "NativeInterner | PyInterner":
    """Native when buildable, Python otherwise."""
    if native_available():
        return NativeInterner()
    return PyInterner()
