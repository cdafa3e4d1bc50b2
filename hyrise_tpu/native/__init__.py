"""Native (C++) runtime components, loaded via ctypes.

Mirrors the reference's use of C++ for the IO/runtime layer.  Builds on
first use with g++ into a per-repo cache; every consumer has a pure-Python
fallback, so a missing toolchain degrades performance only.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        proc = subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", out],
            capture_output=True, timeout=120,
        )
        return proc.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    """The compiled native library, or None when unavailable.

    Always compiled from source on first use into a per-machine cache
    directory keyed by the source hash — a shared object is never loaded
    from the source tree, so nothing unreviewable (or built for another
    machine: -march=native) can shadow the checked-in C++."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        import hashlib

        from hyrise_tpu import _default_cache_dir

        src = os.path.join(_DIR, "tbl_parser.cpp")
        with open(src, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()[:12]
        cache = _default_cache_dir()
        os.makedirs(cache, exist_ok=True)
        out = os.path.join(cache, f"libtbl_parser_{digest}.so")
        if not os.path.exists(out):
            if not _build(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.tbl_parse.restype = ctypes.c_void_p
        lib.tbl_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_char]
        lib.tbl_num_rows.restype = ctypes.c_long
        lib.tbl_num_rows.argtypes = [ctypes.c_void_p]
        lib.tbl_fill_int64.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_void_p]
        lib.tbl_fill_double.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_void_p]
        lib.tbl_fill_days.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.tbl_fill_codes.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_void_p]
        lib.tbl_dict_size.restype = ctypes.c_int
        lib.tbl_dict_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tbl_dict_bytes.restype = ctypes.c_long
        lib.tbl_dict_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tbl_fill_dict.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.tbl_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def parse_file_native(path: str, types: str, separator: str = "|"):
    """Parse a delimited file natively.  `types` is one char per column:
    i=int64, f=double, s=string(dict codes), d=date.  Returns a list of
    per-column numpy payloads: int64/float64/int32-days arrays, or
    (codes int32, dictionary ndarray) for strings; plus the row count.
    Returns None if the native library is unavailable."""
    import numpy as np

    lib = get_native_lib()
    if lib is None:
        return None
    handle = lib.tbl_parse(path.encode(), types.encode(), len(types),
                           separator.encode())
    if not handle:
        return None
    try:
        n = lib.tbl_num_rows(handle)
        out = []
        for i, t in enumerate(types):
            if t == "i":
                arr = np.empty(n, dtype=np.int64)
                lib.tbl_fill_int64(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
                out.append(arr)
            elif t == "f":
                arr = np.empty(n, dtype=np.float64)
                lib.tbl_fill_double(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
                out.append(arr)
            elif t == "d":
                arr = np.empty(n, dtype=np.int32)
                lib.tbl_fill_days(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
                out.append(arr)
            elif t == "s":
                codes = np.empty(n, dtype=np.int32)
                lib.tbl_fill_codes(handle, i, codes.ctypes.data_as(ctypes.c_void_p))
                nbytes = lib.tbl_dict_bytes(handle, i)
                buf = ctypes.create_string_buffer(max(nbytes, 1))
                lib.tbl_fill_dict(handle, i, buf)
                raw = buf.raw[:nbytes].decode()
                dictionary = np.array(
                    raw.split("\n")[:-1] if nbytes else [], dtype=str
                )
                out.append((codes, dictionary))
            else:
                raise ValueError(f"bad type char {t!r}")
        return out, n
    finally:
        lib.tbl_free(handle)
