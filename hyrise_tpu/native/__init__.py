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


def _native_cache_dir() -> str:
    """Machine-fingerprinted /tmp dir for -march=native artifacts.

    Deliberately NOT the (repo-local, committed) jax compile cache: a
    shared object built on another machine could SIGILL here, and nothing
    built locally should land in the source tree."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:
        flags = ""
    fp = hashlib.sha1(
        (platform.machine() + platform.release() + flags).encode()
    ).hexdigest()[:12]
    return f"/tmp/hyrise_tpu_native_{fp}"


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

        src = os.path.join(_DIR, "tbl_parser.cpp")
        with open(src, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()[:12]
        cache = _native_cache_dir()
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
        lib.tbl_dict_lens.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.tbl_fill_dict.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.tbl_free.argtypes = [ctypes.c_void_p]
        lib.csv_parse.restype = ctypes.c_void_p
        lib.csv_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_char, ctypes.c_int]
        lib.tbl_col_has_nulls.restype = ctypes.c_int
        lib.tbl_col_has_nulls.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tbl_fill_valid.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_void_p]
        _LIB = lib
        return _LIB


def parse_file_native(path: str, types: str, separator: str = "|",
                      csv: bool = False, skip_header: bool = False):
    """Parse a delimited file natively.  `types` is one char per column:
    i=int64, f=double, s=string(dict codes), d=date.  Returns a list of
    per-column numpy payloads: int64/float64/int32-days arrays (or
    (payload, validity bool array) when the CSV column has NULLs), or
    (codes int32, dictionary ndarray[, validity]) for strings; plus the
    row count.  `csv=True` uses the RFC-4180 parser (quotes/escapes/
    embedded newlines, unquoted-empty = NULL).  Returns None if the
    native library is unavailable."""
    import numpy as np

    lib = get_native_lib()
    if lib is None:
        return None
    if csv:
        handle = lib.csv_parse(path.encode(), types.encode(), len(types),
                               separator.encode(), int(skip_header))
    else:
        handle = lib.tbl_parse(path.encode(), types.encode(), len(types),
                               separator.encode())
    if not handle:
        return None
    try:
        n = lib.tbl_num_rows(handle)

        def validity(i):
            if not csv or not lib.tbl_col_has_nulls(handle, i):
                return None
            v = np.empty(n, dtype=np.uint8)
            lib.tbl_fill_valid(handle, i, v.ctypes.data_as(ctypes.c_void_p))
            return v.astype(bool)

        out = []
        for i, t in enumerate(types):
            v = validity(i)
            if t == "i":
                arr = np.empty(n, dtype=np.int64)
                lib.tbl_fill_int64(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
                out.append(arr if v is None else (arr, v))
            elif t == "f":
                arr = np.empty(n, dtype=np.float64)
                lib.tbl_fill_double(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
                out.append(arr if v is None else (arr, v))
            elif t == "d":
                arr = np.empty(n, dtype=np.int32)
                lib.tbl_fill_days(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
                out.append(arr if v is None else (arr, v))
            elif t == "s":
                codes = np.empty(n, dtype=np.int32)
                lib.tbl_fill_codes(handle, i, codes.ctypes.data_as(ctypes.c_void_p))
                n_dict = lib.tbl_dict_size(handle, i)
                lens = np.empty(max(n_dict, 1), dtype=np.int32)
                lib.tbl_dict_lens(handle, i, lens.ctypes.data_as(ctypes.c_void_p))
                nbytes = lib.tbl_dict_bytes(handle, i)
                buf = ctypes.create_string_buffer(max(nbytes, 1))
                lib.tbl_fill_dict(handle, i, buf)
                raw = buf.raw[:nbytes]  # slice BYTES (lens are byte counts)
                ends = np.cumsum(lens[:n_dict])
                starts = ends - lens[:n_dict]
                dictionary = np.array(
                    [raw[s:e].decode() for s, e in zip(starts, ends)],
                    dtype=str,
                )
                out.append((codes, dictionary) if v is None
                           else (codes, dictionary, v))
            else:
                raise ValueError(f"bad type char {t!r}")
        return out, n
    finally:
        lib.tbl_free(handle)
