"""ctypes bindings for the native host runtime (librhj_host.so).

Builds the library lazily with the checked-in Makefile when a toolchain is
present; everything degrades to the pure-Python implementations in
storage.py / workload.py with identical results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from ..storage import ColumnStats, Relation
from ..workload import FilterPred, JoinPred, Projection, Query

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librhj_host.so")
_OPS = ["=", "<", ">"]

_lib = None
_tried = False


class _RhjRelation(ctypes.Structure):
    _fields_ = [("num_tuples", ctypes.c_uint64),
                ("num_columns", ctypes.c_uint64),
                ("data", ctypes.POINTER(ctypes.c_uint64)),
                ("map_base", ctypes.c_void_p),
                ("map_len", ctypes.c_uint64)]


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.rhj_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(_RhjRelation)]
    lib.rhj_open.restype = ctypes.c_int
    lib.rhj_close.argtypes = [ctypes.POINTER(_RhjRelation)]
    lib.rhj_stats.argtypes = [ctypes.POINTER(_RhjRelation)] + \
        [ctypes.POINTER(ctypes.c_uint64)] * 3
    lib.rhj_parse_work.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_longlong),
                                   ctypes.c_longlong]
    lib.rhj_parse_work.restype = ctypes.c_longlong
    lib.rhj_format_results.argtypes = [
        ctypes.POINTER(ctypes.c_ulonglong), ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_longlong, ctypes.c_char_p,
        ctypes.c_longlong]
    lib.rhj_format_results.restype = ctypes.c_longlong
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_relation_native(path: str) -> Optional[Relation]:
    """Load + stats via the native library; None if unavailable.

    The mmap'd pages stay owned by the native library for the process
    lifetime (the engine loads relations once, like the reference's
    load-at-init contract, join.cpp:18-22).
    """
    lib = _load_lib()
    if lib is None:
        return None
    rel = _RhjRelation()
    rc = lib.rhj_open(path.encode(), ctypes.byref(rel))
    if rc != 0:
        raise AssertionError(f"{path}: native loader error {rc}")
    t, c = rel.num_tuples, rel.num_columns
    base = np.ctypeslib.as_array(rel.data, shape=(t * c,)) if t * c else \
        np.zeros(0, dtype=np.uint64)
    base = base.view(np.uint64)
    cols = [base[i * t:(i + 1) * t] for i in range(c)]
    mins = (ctypes.c_uint64 * c)()
    maxs = (ctypes.c_uint64 * c)()
    dist = (ctypes.c_uint64 * c)()
    lib.rhj_stats(ctypes.byref(rel), mins, maxs, dist)
    out = Relation(cols, path=path, compute_stats=False)
    out.set_stats([ColumnStats(int(mins[i]), int(maxs[i]), int(dist[i]))
                   for i in range(c)])
    out._native_handle = rel  # keep the mmap alive
    return out


def parse_work_native(text: str) -> Optional[List[List[Query]]]:
    """Parse a whole work stream via the native tape parser; None if n/a."""
    lib = _load_lib()
    if lib is None:
        return None
    cap = max(4096, 8 * len(text))
    tape = (ctypes.c_longlong * cap)()
    n = lib.rhj_parse_work(text.encode(), tape, cap)
    if n == 0:
        raise ValueError("malformed work stream")
    if n < 0:
        cap = -n
        tape = (ctypes.c_longlong * cap)()
        n = lib.rhj_parse_work(text.encode(), tape, cap)
    words = list(tape[:n])
    batches: List[List[Query]] = []
    cur: List[Query] = []
    i = 0
    while True:
        w = words[i]
        if w == -2:
            break
        if w == -1:
            if cur:
                batches.append(cur)
                cur = []
            i += 1
            continue
        nslots = w
        i += 1
        slots = [int(x) for x in words[i:i + nslots]]
        i += nslots
        njoins = words[i]
        i += 1
        joins = [JoinPred(*map(int, words[i + 4 * k:i + 4 * k + 4]))
                 for k in range(njoins)]
        i += 4 * njoins
        nfil = words[i]
        i += 1
        filters = [FilterPred(int(words[i + 4 * k]), int(words[i + 4 * k + 1]),
                              _OPS[words[i + 4 * k + 2]],
                              int(words[i + 4 * k + 3]))
                   for k in range(nfil)]
        i += 4 * nfil
        nproj = words[i]
        i += 1
        projs = [Projection(int(words[i + 2 * k]), int(words[i + 2 * k + 1]))
                 for k in range(nproj)]
        i += 2 * nproj
        cur.append(Query(slots, joins, filters, projs))
    if cur:
        batches.append(cur)
    return batches


def format_results_native(results: Sequence[Optional[List[int]]],
                          proj_counts: Sequence[int]) -> Optional[str]:
    """Format result lines via the native formatter; None if n/a."""
    lib = _load_lib()
    if lib is None:
        return None
    nq = len(results)
    sums: List[int] = []
    nulls = (ctypes.c_ubyte * nq)()
    counts = (ctypes.c_longlong * nq)(*proj_counts)
    for q, r in enumerate(results):
        if r is None:
            nulls[q] = 1
            sums.extend([0] * proj_counts[q])
        else:
            sums.extend(r)
    sums_arr = (ctypes.c_ulonglong * len(sums))(*sums)
    cap = 32 * max(1, len(sums)) + 8 * nq
    buf = ctypes.create_string_buffer(cap)
    n = lib.rhj_format_results(sums_arr, counts, nulls, nq, buf, cap)
    if n < 0:
        cap = -n
        buf = ctypes.create_string_buffer(cap)
        n = lib.rhj_format_results(sums_arr, counts, nulls, nq, buf, cap)
    return buf.raw[:n].decode()
