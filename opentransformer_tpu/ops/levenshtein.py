"""Edit distance + WER/CER scoring.

Replaces the reference's external C++ ``editdistance`` dependency
(``eval.py:168``, ``tools/computer_wer.py:30``) with a first-party native
implementation (``native/levenshtein.cc``, ctypes, auto-built like the CTC
decoder) plus a dependency-free two-row-DP Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_SO_PATH = os.path.join(_NATIVE_DIR, "libedit_distance.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.edit_distance_i32.restype = ctypes.c_int32
            lib.edit_distance_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.edit_distance_nbest.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _lib = False  # build/load failed: stay on the Python DP
    return _lib


def _edit_distance_py(a: Sequence, b: Sequence) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def edit_distance(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    lib = _load_lib()
    if not lib:
        return _edit_distance_py(a, b)
    # intern arbitrary hashable tokens into int32 ids for the native kernel
    ids: dict = {}
    xa = (ctypes.c_int32 * len(a))(*(ids.setdefault(t, len(ids)) for t in a))
    xb = (ctypes.c_int32 * len(b))(*(ids.setdefault(t, len(ids)) for t in b))
    return int(lib.edit_distance_i32(xa, len(a), xb, len(b)))


def edit_distances(ref: Sequence, hyps: Sequence[Sequence]) -> list[int]:
    """distance(ref, h) for every hypothesis — one native call for the whole
    n-best list (the reference scored each separately, ``eval.py:168``)."""
    lib = _load_lib()
    if not lib or not hyps:
        return [edit_distance(ref, h) for h in hyps]
    ids: dict = {}
    xr = (ctypes.c_int32 * max(len(ref), 1))(
        *(ids.setdefault(t, len(ids)) for t in ref))
    flat = [ids.setdefault(t, len(ids)) for h in hyps for t in h]
    lens = [len(h) for h in hyps]
    xh = (ctypes.c_int32 * max(len(flat), 1))(*flat)
    xl = (ctypes.c_int32 * len(hyps))(*lens)
    out = (ctypes.c_int32 * len(hyps))()
    lib.edit_distance_nbest(xr, len(ref), xh, xl, len(hyps), out)
    return list(out)


class ErrorRateAccumulator:
    """Corpus-level WER/CER: sum(edit distances) / sum(reference lengths)."""

    def __init__(self):
        self.errors = 0
        self.tokens = 0
        self.utts = 0

    def update(self, ref: Sequence, hyp: Sequence) -> int:
        d = edit_distance(ref, hyp)
        self.errors += d
        self.tokens += len(ref)
        self.utts += 1
        return d

    @property
    def rate(self) -> float:
        return self.errors / max(self.tokens, 1)
