"""ctypes bindings for the C++ runtime library (csrc/).

Provides a zero-copy mmap safetensors reader and a writer.  The library is
auto-built with ``make -C csrc`` on first use (g++ in the image); all callers
fall back to the pure-python safetensors package when the toolchain or build
is unavailable, so the native path is an accelerator, not a dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "csrc", "build", "libwtt_runtime.so")

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
    # BF16 surfaces as uint16 raw bits (numpy has no bfloat16)
    "BF16": np.uint16,
}
_DTYPES_REV = {np.dtype(v): k for k, v in _DTYPES.items() if k != "BF16"}

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_library():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.isfile(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "csrc")],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.wtt_st_open.restype = ctypes.c_void_p
        lib.wtt_st_open.argtypes = [ctypes.c_char_p]
        lib.wtt_st_count.restype = ctypes.c_long
        lib.wtt_st_count.argtypes = [ctypes.c_void_p]
        lib.wtt_st_name.restype = ctypes.c_char_p
        lib.wtt_st_name.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.wtt_st_info.restype = ctypes.c_int
        lib.wtt_st_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long)]
        lib.wtt_st_data.restype = ctypes.c_void_p
        lib.wtt_st_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.wtt_st_close.restype = None
        lib.wtt_st_close.argtypes = [ctypes.c_void_p]
        lib.wtt_st_last_error.restype = ctypes.c_char_p
        lib.wtt_st_write.restype = ctypes.c_int
        lib.wtt_st_write.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_long)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load_library() is not None


class SafetensorsFile:
    """Zero-copy view onto a safetensors file (mmap-backed, read-only).

    Arrays returned by ``tensor()`` alias the mapping; they stay valid until
    ``close()``.  ``load_all(copy=True)`` detaches them.
    """

    def __init__(self, path: str):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._handle = lib.wtt_st_open(path.encode())
        if not self._handle:
            raise OSError(lib.wtt_st_last_error().decode())
        self.path = path

    def names(self) -> list[str]:
        n = self._lib.wtt_st_count(self._handle)
        return [self._lib.wtt_st_name(self._handle, i).decode()
                for i in range(n)]

    def tensor(self, name: str) -> np.ndarray:
        dtype_buf = ctypes.create_string_buffer(16)
        shape = (ctypes.c_long * 8)()
        ndim = ctypes.c_int()
        nbytes = ctypes.c_long()
        rc = self._lib.wtt_st_info(self._handle, name.encode(), dtype_buf,
                                   shape, ctypes.byref(ndim),
                                   ctypes.byref(nbytes))
        if rc != 0:
            raise KeyError(self._lib.wtt_st_last_error().decode())
        ptr = self._lib.wtt_st_data(self._handle, name.encode())
        dtype = _DTYPES[dtype_buf.value.decode()]
        shp = tuple(shape[i] for i in range(ndim.value))
        buf = (ctypes.c_char * nbytes.value).from_address(ptr)
        arr = np.frombuffer(buf, dtype=dtype).reshape(shp)
        arr.flags.writeable = False
        return arr

    def load_all(self, copy: bool = False) -> dict[str, np.ndarray]:
        out = {}
        for name in self.names():
            a = self.tensor(name)
            out[name] = a.copy() if copy else a
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.wtt_st_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def write_safetensors(path: str, tensors: dict[str, np.ndarray]) -> None:
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    names = list(tensors)
    arrays = [np.ascontiguousarray(tensors[n]) for n in names]
    n = len(names)
    c_names = (ctypes.c_char_p * n)(*[s.encode() for s in names])
    c_dtypes = (ctypes.c_char_p * n)(
        *[_DTYPES_REV[a.dtype].encode() for a in arrays])
    flat_shapes = []
    ndims = []
    for a in arrays:
        ndims.append(a.ndim)
        flat_shapes.extend(a.shape)
    c_shapes = (ctypes.c_long * max(1, len(flat_shapes)))(*flat_shapes)
    c_ndims = (ctypes.c_int * n)(*ndims)
    c_datas = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])
    c_nbytes = (ctypes.c_long * n)(*[a.nbytes for a in arrays])
    rc = lib.wtt_st_write(path.encode(), n, c_names, c_dtypes, c_shapes,
                          c_ndims, c_datas, c_nbytes)
    if rc != 0:
        raise OSError(lib.wtt_st_last_error().decode())
