"""ctypes bindings to the native IO library (``native/libgulonio.so``).

The native side is a multithreaded memory-mapped word2vec text parser — the
TPU-framework data-loader counterpart of the reference's single-pass JVM
line scanner (``WordVectors.scala:162-197``). If the shared library is
missing it is built on demand with ``make`` (g++ is part of the toolchain);
if that fails, callers fall back to the pure-Python reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgulonio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.w2v_open.restype = ctypes.c_void_p
        lib.w2v_open.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.w2v_error.restype = ctypes.c_char_p
        lib.w2v_error.argtypes = [ctypes.c_void_p]
        lib.w2v_rows.restype = ctypes.c_int64
        lib.w2v_rows.argtypes = [ctypes.c_void_p]
        lib.w2v_dim.restype = ctypes.c_int32
        lib.w2v_dim.argtypes = [ctypes.c_void_p]
        lib.w2v_vectors.restype = ctypes.POINTER(ctypes.c_float)
        lib.w2v_vectors.argtypes = [ctypes.c_void_p]
        lib.w2v_keys.restype = ctypes.POINTER(ctypes.c_char)
        lib.w2v_keys.argtypes = [ctypes.c_void_p]
        lib.w2v_key_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        lib.w2v_key_offsets.argtypes = [ctypes.c_void_p]
        lib.w2v_close.restype = None
        lib.w2v_close.argtypes = [ctypes.c_void_p]
        lib.w2v_open_index.restype = ctypes.c_void_p
        lib.w2v_open_index.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.w2v_parse_rows.restype = ctypes.c_int64
        lib.w2v_parse_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.w2v_parse_gather.restype = ctypes.c_int64
        lib.w2v_parse_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True iff the native parser can be loaded (building it if needed)."""
    return _load() is not None


def read_word2vec(
    path: str,
    report_fn: Optional[Callable] = None,
    num_threads: int = 0,
):
    """Parse a word2vec text file with the native loader.

    Returns a :class:`gulon_tpu.utils.word2vec.WordVectors`. Raises
    ``ValueError`` on malformed input and ``RuntimeError`` if the native
    library is unavailable.
    """
    from gulon_tpu.utils.word2vec import ReadProgress, WordVectors

    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    handle = lib.w2v_open(path.encode(), num_threads)
    if not handle:
        raise RuntimeError("native parser returned null handle")
    try:
        err = lib.w2v_error(handle)
        if err:
            raise ValueError(err.decode())
        n = lib.w2v_rows(handle)
        d = lib.w2v_dim(handle)
        vectors = np.ctypeslib.as_array(
            lib.w2v_vectors(handle), shape=(n, d)
        ).copy()
        offsets = np.ctypeslib.as_array(
            lib.w2v_key_offsets(handle), shape=(n + 1,)
        )
        total_kb = int(offsets[-1])
        key_buf = ctypes.string_at(lib.w2v_keys(handle), total_kb)
        keys = np.empty(n, dtype=object)
        for i in range(n):
            keys[i] = key_buf[offsets[i] : offsets[i + 1]].decode("utf-8")
        if report_fn is not None:
            report_fn(
                ReadProgress(
                    lines_read=int(n),
                    total_lines=int(n),
                    size_estimate_bytes=int(vectors.nbytes + total_kb),
                )
            )
        return WordVectors(keys, vectors)
    finally:
        lib.w2v_close(handle)


class Word2VecStream:
    """Index-mode handle over a word2vec text file: keys parse up front,
    vectors parse on demand in row ranges — the streaming-build loader.

    Host memory stays O(keys + requested chunk), never O(corpus floats):
    the file is memory-mapped and each :meth:`rows`/:meth:`gather` call
    parses just the requested lines (multithreaded). Counterpart of the
    reference's 10k-line chunked streaming (``WordVectors.scala:199-257``)
    reshaped for a device-side encode pipeline.
    """

    def __init__(self, path: str, num_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._threads = num_threads
        self._handle = lib.w2v_open_index(path.encode(), num_threads)
        if not self._handle:
            raise RuntimeError("native parser returned null handle")
        err = lib.w2v_error(self._handle)
        if err:
            self.close()
            raise ValueError(err.decode())
        self.num_rows = int(lib.w2v_rows(self._handle))
        self.dim = int(lib.w2v_dim(self._handle))
        offsets = np.ctypeslib.as_array(
            lib.w2v_key_offsets(self._handle), shape=(self.num_rows + 1,)
        )
        key_buf = ctypes.string_at(
            lib.w2v_keys(self._handle), int(offsets[-1])
        )
        self.keys = np.empty(self.num_rows, dtype=object)
        for i in range(self.num_rows):
            self.keys[i] = key_buf[offsets[i] : offsets[i + 1]].decode(
                "utf-8"
            )

    def rows(self, start: int, count: int) -> np.ndarray:
        """Parse rows [start, start+count) -> ``[count, dim]`` f32."""
        out = np.empty((count, self.dim), np.float32)
        rc = self._lib.w2v_parse_rows(
            self._handle, start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._threads,
        )
        if rc == -2:
            raise ValueError(f"row range [{start}, {start + count}) invalid")
        if rc >= 0:
            raise ValueError(f"malformed line at data row {rc}")
        return out

    def gather(self, ids) -> np.ndarray:
        """Parse arbitrary row ids -> ``[len(ids), dim]`` f32."""
        ids = np.ascontiguousarray(ids, np.int64)
        out = np.empty((len(ids), self.dim), np.float32)
        rc = self._lib.w2v_parse_gather(
            self._handle,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ids),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._threads,
        )
        if rc == -2:
            raise ValueError("row ids out of range")
        if rc >= 0:
            raise ValueError(f"malformed line at data row {rc}")
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.w2v_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()
