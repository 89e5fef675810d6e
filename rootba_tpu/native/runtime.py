"""ctypes bindings for the native (C++) host runtime.

The reference's performance-critical host-side code is C++ (parsing,
preprocessing); here the device compute path is JAX/XLA but the host
runtime keeps a native core: a fast BAL tokenizer/parser and
preprocessing kernels live in librootba_host.so (built from
rootba_tpu/native/src via `make -C rootba_tpu/native`). Python fallbacks
exist for every entry point; `available()` reports whether the native
library was found.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "librootba_host.so")


def _try_build() -> None:
    """Best-effort `make` of the shared library on first use (it is a
    build artifact, not checked in). Disable with ROOTBA_NO_NATIVE_BUILD=1."""
    if os.environ.get("ROOTBA_NO_NATIVE_BUILD"):
        return
    here = os.path.dirname(__file__)
    if not os.path.exists(os.path.join(here, "Makefile")):
        return
    try:
        subprocess.run(
            ["make", "-C", here], check=False, timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except (OSError, subprocess.TimeoutExpired):
        pass


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        _try_build()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.rootba_count_tokens.restype = ctypes.c_longlong
    lib.rootba_count_tokens.argtypes = [ctypes.c_char_p]
    lib.rootba_tokenize_file.restype = ctypes.c_longlong
    lib.rootba_tokenize_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def tokenize_file(path: str) -> np.ndarray:
    """All whitespace-separated numeric tokens of a file, as float64."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    n = lib.rootba_count_tokens(path.encode())
    if n < 0:
        raise IOError(f"could not read '{path}'")
    out = np.empty(int(n), dtype=np.float64)
    got = lib.rootba_tokenize_file(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.size,
    )
    if got < 0:
        raise IOError(f"could not parse '{path}'")
    return out[: int(got)]
