"""ctypes bindings for the native C++ CTC prefix-beam decoder.

The TPU emits frame log-probs (``CTCModel.recognize_logits``); this host
decoder runs the label-synchronous prefix search with optional ARPA n-gram
LM fusion (alpha/beta weights — same interface as the reference's external
``ctcdecode_edited`` package, ``otrans/recognize/ctc.py:19-25``).

Auto-builds ``native/libctc_decoder.so`` via the Makefile on first use.
Falls back with ImportError if no toolchain is available; callers can use
``recognize.ctc_decode.ctc_prefix_beam_search`` (pure python) instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libctc_decoder.so"))

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        # `make` is an up-to-date no-op; also rebuilds a stale .so
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        if not os.path.exists(_SO_PATH):
            raise
    lib = ctypes.CDLL(_SO_PATH)
    lib.lm_load.restype = ctypes.c_void_p
    lib.lm_load.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
    lib.lm_free.argtypes = [ctypes.c_void_p]
    lib.lm_order.restype = ctypes.c_int
    lib.lm_order.argtypes = [ctypes.c_void_p]
    lib.lm_save_binary.restype = ctypes.c_int
    lib.lm_save_binary.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ctc_beam_decode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ctc_beam_decode_sparse.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


class NgramLM:
    """n-gram LM handle for decoder fusion. Accepts ARPA text, the "OTLM"
    binary cache, or a KenLM PROBING binary (`build_binary` output — the
    format the reference fed to kenlm via ctcdecode); detected by magic.

    With ``binary_cache=True`` (default), loading an ARPA file writes a
    binary cache next to it (``<path>.otbin``) and later loads prefer the
    cache — skipping text parsing, the startup cost for large n-gram
    models (same motivation as KenLM's binary format, first-party here).
    The cache embeds a vocab hash; a cache built against a different vocab
    ordering is rejected and the ARPA text is re-parsed.
    """

    def __init__(self, arpa_path: str, vocab_units: Sequence[str],
                 binary_cache: bool = True):
        lib = _load_lib()
        arr = (ctypes.c_char_p * len(vocab_units))(
            *[u.encode("utf-8") for u in vocab_units]
        )
        self._handle = None
        cache = arpa_path + ".otbin"
        from_cache = False
        if binary_cache and os.path.exists(cache) and (
            not os.path.exists(arpa_path)
            or os.path.getmtime(cache) >= os.path.getmtime(arpa_path)
        ):
            self._handle = lib.lm_load(cache.encode(), arr, len(vocab_units))
            from_cache = bool(self._handle)
        if not self._handle:
            self._handle = lib.lm_load(arpa_path.encode(), arr, len(vocab_units))
        if not self._handle:
            # distinguish "unsupported KenLM variant" from "not found/garbage":
            # TRIE/quantized binaries share the magic but not the layout (the
            # native reader rejects them rather than misparse scores)
            try:
                with open(arpa_path, "rb") as f:
                    head = f.read(51)
            except OSError:
                head = b""
            if head.startswith(b"mmap lm http://kheafield.com/code"):
                raise ValueError(
                    f"{arpa_path}: failed to load KenLM binary — either not a "
                    "plain PROBING model (trie/quantized layouts are "
                    "unsupported; rebuild with `build_binary probing` or pass "
                    "the ARPA text) or the file is truncated/corrupt")
            raise FileNotFoundError(arpa_path)
        if binary_cache and not from_cache and not arpa_path.endswith(".otbin"):
            # best-effort: a nonzero rc (e.g. read-only dir) just means the
            # next load re-parses the text
            lib.lm_save_binary(self._handle, cache.encode())

    @property
    def order(self) -> int:
        return _load_lib().lm_order(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            try:
                _load_lib().lm_free(self._handle)
            except Exception:
                pass


def ctc_beam_decode(
    log_probs: np.ndarray,  # f32[B, T, V]
    frame_counts: np.ndarray,  # i32[B]
    beam_width: int = 10,
    blank: int = 0,
    prune_k: int = 32,
    alpha: float = 0.0,
    beta: float = 0.0,
    lm: Optional[NgramLM] = None,
    nbest: int = 1,
    num_threads: int = 0,
):
    """Batched prefix beam search. Returns (tokens i32[B, nbest, U_max],
    lengths i32[B, nbest], scores f32[B, nbest])."""
    lib = _load_lib()
    lp = np.ascontiguousarray(log_probs, np.float32)
    fc = np.ascontiguousarray(frame_counts, np.int32)
    b, t, v = lp.shape
    max_out = t
    tokens = np.zeros((b, nbest, max_out), np.int32)
    lens = np.zeros((b, nbest), np.int32)
    scores = np.zeros((b, nbest), np.float32)
    lib.ctc_beam_decode(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t, v, blank, beam_width, prune_k,
        ctypes.c_float(alpha), ctypes.c_float(beta),
        getattr(lm, "_handle", None), max_out, nbest, num_threads,
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return tokens, lens, scores


def ctc_beam_decode_sparse(
    cand_lp: np.ndarray,    # f32[B, T, N] desc-sorted per frame
    cand_ids: np.ndarray,   # i32[B, T, N]
    blank_lp: np.ndarray,   # f32[B, T] exact blank log-prob per frame
    frame_counts: np.ndarray,  # i32[B]
    beam_width: int = 10,
    blank: int = 0,
    alpha: float = 0.0,
    beta: float = 0.0,
    lm: Optional[NgramLM] = None,
    nbest: int = 1,
    num_threads: int = 0,
):
    """Prefix beam search over device-pruned candidate lists (the fused
    top-k kernel's output) — only [B, T, N] crosses device→host instead of
    the full [B, T, V] distribution. With N == ``ctc_beam_decode``'s
    ``prune_k`` the results match (up to exact f32 ties at the k-th slot,
    where the two prunes may pick different candidate sets). Returns
    (tokens i32[B, nbest, U_max], lengths i32[B, nbest], scores f32[B, nbest])."""
    lib = _load_lib()
    lp = np.ascontiguousarray(cand_lp, np.float32)
    ids = np.ascontiguousarray(cand_ids, np.int32)
    blp = np.ascontiguousarray(blank_lp, np.float32)
    fc = np.ascontiguousarray(frame_counts, np.int32)
    b, t, n = lp.shape
    max_out = t
    tokens = np.zeros((b, nbest, max_out), np.int32)
    lens = np.zeros((b, nbest), np.int32)
    scores = np.zeros((b, nbest), np.float32)
    lib.ctc_beam_decode_sparse(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        blp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t, n, blank, beam_width,
        ctypes.c_float(alpha), ctypes.c_float(beta),
        getattr(lm, "_handle", None), max_out, nbest, num_threads,
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return tokens, lens, scores
