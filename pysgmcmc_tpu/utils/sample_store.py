"""ctypes interface to the native ring-buffer sample store.

See ``pysgmcmc_tpu/native/sample_store.cpp`` for rationale: an
O(1)-append, optionally file-backed ring buffer for posterior histories
streamed off the device — the production-scale replacement for the
reference's Python deque (``bayesian_neural_network.py:290``).

The shared library is compiled on first use (g++, a few hundred ms) and
cached next to the source.

Examples
--------
>>> import numpy as np
>>> store = SampleStore(capacity=4, width=2)
>>> store.append(np.ones((3, 2), np.float32))
>>> (len(store), store.asarray().shape)
(3, (3, 2))
>>> store.close()
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "sample_store.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libsample_store.so")

_lib = None
_lib_lock = threading.Lock()


def _load_library():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                check=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.sample_store_create.restype = ctypes.c_void_p
        lib.sample_store_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.sample_store_append.restype = None
        lib.sample_store_append.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.sample_store_len.restype = ctypes.c_int64
        lib.sample_store_len.argtypes = [ctypes.c_void_p]
        lib.sample_store_total.restype = ctypes.c_int64
        lib.sample_store_total.argtypes = [ctypes.c_void_p]
        lib.sample_store_get.restype = ctypes.c_int64
        lib.sample_store_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sample_store_close.restype = None
        lib.sample_store_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class SampleStore:
    """Bounded ring buffer of float32 sample rows (deque-maxlen semantics).

    Parameters
    ----------
    capacity : int
        Maximum retained rows; older rows are overwritten.
    width : int
        Floats per row (e.g. the flattened parameter dimension).
    path : str, optional
        Back the ring with this file (mmap) so histories survive the
        process; default is anonymous memory.
    """

    def __init__(self, capacity, width, path=None):
        self._lib = _load_library()
        encoded = None if path is None else os.fspath(path).encode()
        self._handle = self._lib.sample_store_create(
            encoded, int(capacity), int(width)
        )
        if not self._handle:
            raise RuntimeError("SampleStore: allocation failed")
        self.capacity = int(capacity)
        self.width = int(width)

    def append(self, rows):
        """Append ``(n, width)`` float32 rows (device arrays accepted)."""
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        if rows.ndim == 1:
            rows = rows[None]
        if rows.shape[1] != self.width:
            raise ValueError(
                "SampleStore.append: row width {} != store width {}".format(
                    rows.shape[1], self.width
                )
            )
        self._lib.sample_store_append(
            self._handle,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows.shape[0],
        )

    def __len__(self):
        return int(self._lib.sample_store_len(self._handle))

    @property
    def total_appended(self):
        return int(self._lib.sample_store_total(self._handle))

    def get(self, start=0, count=None):
        """Copy out ``count`` rows from logical index ``start`` (0=oldest)."""
        if count is None:
            count = len(self) - start
        count = max(0, min(count, len(self) - start))
        out = np.empty((count, self.width), dtype=np.float32)
        copied = self._lib.sample_store_get(
            self._handle, int(start), int(count),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out[:copied]

    def asarray(self):
        """All retained rows, oldest first."""
        return self.get(0, len(self))

    def close(self):
        if self._handle:
            self._lib.sample_store_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
