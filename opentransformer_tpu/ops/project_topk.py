"""Pallas TPU kernel: fused vocab projection → log-softmax top-k.

Every beam/greedy decode step ends with ``log_softmax(h @ Wᵀ + b)`` followed
by ``top_k`` (reference re-ranks the full distribution the same way,
``otrans/recognize/speech2text.py:96-118``). The unfused XLA lowering
materializes the f32 ``[B·K, V]`` logits in HBM and re-reads them for the
softmax reduction and again for top-k — at the flagship decode geometry
(B·K=2560, V=4233) that's ~130 MB of HBM round-trips per decode step for
43 MB of useful output, all to keep k=5 numbers per row.

This kernel streams the vocabulary in lane-aligned tiles and keeps the
running state in VMEM: per (row-tile, vocab-tile) grid step it computes the
tile logits on the MXU, folds them into an online logsumexp (flash-attention
style m/s carry) and merges them into a running top-k (k unrolled
max/mask passes; ties resolve to the smallest vocab id, matching
``jax.lax.top_k``). The full logits never exist — HBM traffic is one read
of W per row-tile plus the [N, k] outputs.

``project_logp_topk`` dispatches: Pallas on TPU, an identical-semantics XLA
reference elsewhere (the CPU test mesh), overridable via ``force``.
Parity: tests/test_project_topk.py (interpret mode + XLA cross-check).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # large-negative (not -inf: avoids inf-inf NaNs)
_IDX_PAD = 2**30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_logits(h_ref, w_ref, b_ref):
    """MXU tile matmul: [R, D]·[BV, D]ᵀ + b → f32[R, BV]."""
    return jax.lax.dot_general(
        h_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:]


def _online_lse(logits, m_ref, s_ref):
    """Fold a tile into the running logsumexp carry (m: max, s: scaled
    sumexp) — flash-attention style."""
    tile_max = jnp.max(logits, axis=-1, keepdims=True)  # [R, 1]
    m_old = m_ref[:, :1]
    m_new = jnp.maximum(m_old, tile_max)
    s_ref[:, :1] = (s_ref[:, :1] * jnp.exp(m_old - m_new)
                    + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True))
    m_ref[:, :1] = m_new


def _merge_topk(run_vals, run_idx, tile_vals, tile_ids, k: int, out_pad: int):
    """Merge a tile into the running top-k: k unrolled max/mask passes over
    [running buffer ∥ tile] — the full lane-aligned [R, out_pad] buffer is
    used (pad slots hold _NEG/_IDX_PAD and can never win for a real row) so
    every concatenate/slice stays on 128-lane boundaries for Mosaic.
    Running ids are always from earlier tiles (smaller), so min-id
    tie-breaking matches lax.top_k's smallest-index rule exactly."""
    r = tile_vals.shape[0]
    l_ext = jnp.concatenate([run_vals[:], tile_vals], axis=1)
    id_ext = jnp.concatenate([run_idx[:], tile_ids], axis=1)
    new_vals, new_idx = [], []
    for _ in range(k):
        cur = jnp.max(l_ext, axis=-1, keepdims=True)
        sel = jnp.min(jnp.where(l_ext == cur, id_ext, _IDX_PAD),
                      axis=-1, keepdims=True)
        new_vals.append(cur)
        new_idx.append(sel)
        l_ext = jnp.where(id_ext == sel, _NEG, l_ext)
    pad = jnp.zeros((r, out_pad - k), jnp.float32)
    run_vals[:] = jnp.concatenate(new_vals + [pad + _NEG], axis=1)
    run_idx[:] = jnp.concatenate(new_idx + [pad.astype(jnp.int32) + _IDX_PAD],
                                 axis=1)


def _init_scratch(run_vals, run_idx, *lse_refs):
    run_vals[:] = jnp.full(run_vals.shape, _NEG, jnp.float32)
    run_idx[:] = jnp.full(run_idx.shape, _IDX_PAD, jnp.int32)
    for i, ref in enumerate(lse_refs):
        if i % 2 == 0:
            ref[:] = jnp.full(ref.shape, _NEG, jnp.float32)  # m
        else:
            ref[:] = jnp.zeros(ref.shape, jnp.float32)       # s


def _topk_kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
                 run_vals, run_idx, m_ref, s_ref, *, k: int, v: int,
                 block_v: int, out_pad: int):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        _init_scratch(run_vals, run_idx, m_ref, s_ref)

    r = h_ref.shape[0]
    logits = _tile_logits(h_ref, w_ref, b_ref)  # [R, BV]

    col = jax.lax.broadcasted_iota(jnp.int32, (r, block_v), 1)
    gid = col + j * block_v
    logits = jnp.where(gid < v, logits, _NEG)

    _online_lse(logits, m_ref, s_ref)
    _merge_topk(run_vals, run_idx, logits, gid, k, out_pad)

    @pl.when(j == nv - 1)
    def _finalize():
        lse = m_ref[:, :1] + jnp.log(s_ref[:, :1])
        vals_ref[:] = run_vals[:] - lse
        idx_ref[:] = run_idx[:]
        # row logsumexp, broadcast over the lane tile: lets callers score any
        # single extra label as (h·w_label + b_label) − lse (e.g. CTC blank)
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


@partial(jax.jit, static_argnames=("k", "block_rows", "block_v", "interpret",
                                   "with_lse"))
def project_logp_topk_pallas(
    h: jnp.ndarray,       # [N, D] hidden states (model dtype)
    weight: jnp.ndarray,  # [V, D] vocab rows (tied embedding layout)
    bias: jnp.ndarray,    # [V] f32
    k: int,
    block_rows: int = 512,
    block_v: int = 512,
    interpret: bool = False,
    with_lse: bool = False,
):
    """(logp_vals f32[N, k] desc-sorted, idx i32[N, k]) of log_softmax(h@Wᵀ+b).

    ``with_lse=True`` appends the row logsumexp f32[N]: callers can then
    score any single extra label exactly as ``h·w_label + b_label − lse``
    (the CTC sparse-beam path needs the blank's log-prob even when blank
    falls outside the top-k)."""
    n, d = h.shape
    v = weight.shape[0]
    assert k <= 128, "top-k width must fit one lane tile"
    assert k <= v, f"top-k width {k} exceeds vocabulary {v}"
    r = min(block_rows, _round_up(n, 8))
    n_pad = _round_up(n, r)
    d_pad = _round_up(d, 128)
    v_pad = _round_up(v, block_v)
    out_pad = _round_up(k, 128)

    hp = jnp.pad(h, ((0, n_pad - n), (0, d_pad - d)))
    wp = jnp.pad(weight.astype(h.dtype), ((0, v_pad - v), (0, d_pad - d)))
    bp = jnp.pad(bias.astype(jnp.float32), (0, v_pad - v)).reshape(1, v_pad)

    grid = (n_pad // r, v_pad // block_v)
    vals, idx, lse = pl.pallas_call(
        partial(_topk_kernel, k=k, v=v, block_v=block_v, out_pad=out_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, out_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, out_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, out_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, out_pad), jnp.float32),
            pltpu.VMEM((r, out_pad), jnp.int32),
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(hp, wp, bp)
    if with_lse:
        return vals[:n, :k], idx[:n, :k], lse[:n, 0]
    return vals[:n, :k], idx[:n, :k]


def _topk2_kernel(h1_ref, w1_ref, b1_ref, h2_ref, w2_ref, b2_ref,
                  vals_ref, idx_ref,
                  run_vals, run_idx, m1_ref, s1_ref, m2_ref, s2_ref,
                  *, k: int, v: int, block_v: int, out_pad: int, lam: float):
    """Two-head fused top-k: top_k(logp1 + lam*logp2) without materializing
    either [N, V] distribution (shallow LM fusion's per-step consumption).

    Per-row, logp1 + lam*logp2 = (l1 + lam*l2) − (lse1 + lam*lse2): the
    subtracted term is a row constant, so the running top-k ranks raw
    combined logits and the normalizers fold in once at finalize.
    """
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        _init_scratch(run_vals, run_idx, m1_ref, s1_ref, m2_ref, s2_ref)

    r = h1_ref.shape[0]
    l1 = _tile_logits(h1_ref, w1_ref, b1_ref)
    l2 = _tile_logits(h2_ref, w2_ref, b2_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (r, block_v), 1)
    gid = col + j * block_v
    valid = gid < v
    l1 = jnp.where(valid, l1, _NEG)
    l2 = jnp.where(valid, l2, _NEG)

    _online_lse(l1, m1_ref, s1_ref)
    _online_lse(l2, m2_ref, s2_ref)

    combined = jnp.where(valid, l1 + lam * l2, _NEG)
    _merge_topk(run_vals, run_idx, combined, gid, k, out_pad)

    @pl.when(j == nv - 1)
    def _finalize():
        lse1 = m1_ref[:, :1] + jnp.log(s1_ref[:, :1])
        lse2 = m2_ref[:, :1] + jnp.log(s2_ref[:, :1])
        vals_ref[:] = run_vals[:] - (lse1 + lam * lse2)
        idx_ref[:] = run_idx[:]


@partial(jax.jit, static_argnames=("k", "lam", "block_rows", "block_v", "interpret"))
def project2_logp_topk_pallas(
    h1: jnp.ndarray,       # [N, D1]
    w1: jnp.ndarray,       # [V, D1]
    b1: jnp.ndarray,       # [V]
    h2: jnp.ndarray,       # [N, D2]
    w2: jnp.ndarray,       # [V, D2]
    b2: jnp.ndarray,       # [V]
    lam: float,
    k: int,
    block_rows: int = 512,
    block_v: int = 512,
    interpret: bool = False,
):
    """top-k of ``log_softmax(h1@w1ᵀ+b1) + lam·log_softmax(h2@w2ᵀ+b2)``.

    Returns (vals f32[N, k] desc-sorted, idx i32[N, k]); ties resolve to the
    smallest vocab id (``lax.top_k`` rule).
    """
    n, d1 = h1.shape
    d2 = h2.shape[1]
    v = w1.shape[0]
    assert w2.shape[0] == v, "fused LM fusion requires matching vocabularies"
    assert k <= 128, "top-k width must fit one lane tile"
    assert k <= v, f"top-k width {k} exceeds vocabulary {v}"
    r = min(block_rows, _round_up(n, 8))
    n_pad = _round_up(n, r)
    d1_pad = _round_up(d1, 128)
    d2_pad = _round_up(d2, 128)
    v_pad = _round_up(v, block_v)
    out_pad = _round_up(k, 128)

    h1p = jnp.pad(h1, ((0, n_pad - n), (0, d1_pad - d1)))
    w1p = jnp.pad(w1.astype(h1.dtype), ((0, v_pad - v), (0, d1_pad - d1)))
    b1p = jnp.pad(b1.astype(jnp.float32), (0, v_pad - v)).reshape(1, v_pad)
    h2p = jnp.pad(h2, ((0, n_pad - n), (0, d2_pad - d2)))
    w2p = jnp.pad(w2.astype(h2.dtype), ((0, v_pad - v), (0, d2_pad - d2)))
    b2p = jnp.pad(b2.astype(jnp.float32), (0, v_pad - v)).reshape(1, v_pad)

    grid = (n_pad // r, v_pad // block_v)
    vals, idx = pl.pallas_call(
        partial(_topk2_kernel, k=k, v=v, block_v=block_v, out_pad=out_pad,
                lam=float(lam)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, d1_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, d1_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d2_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, d2_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, out_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, out_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, out_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, out_pad), jnp.float32),
            pltpu.VMEM((r, out_pad), jnp.int32),
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, 1), jnp.float32),
            pltpu.VMEM((r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h1p, w1p, b1p, h2p, w2p, b2p)
    return vals[:n, :k], idx[:n, :k]


def project2_logp_topk_xla(h1, w1, b1, h2, w2, b2, lam, k):
    """Reference semantics (both distributions materialized) — non-TPU path."""
    lp1 = jax.nn.log_softmax(
        jnp.einsum("nd,vd->nv", h1, w1.astype(h1.dtype),
                   preferred_element_type=jnp.float32) + b1.astype(jnp.float32),
        axis=-1)
    lp2 = jax.nn.log_softmax(
        jnp.einsum("nd,vd->nv", h2, w2.astype(h2.dtype),
                   preferred_element_type=jnp.float32) + b2.astype(jnp.float32),
        axis=-1)
    return jax.lax.top_k(lp1 + lam * lp2, k)


def project2_logp_topk(h1, w1, b1, h2, w2, b2, lam, k, force: str | None = None):
    """Fused on TPU, XLA elsewhere. ``force`` ∈ {None, 'pallas', 'xla'};
    ``OT_FUSED_TOPK=0`` disables the Pallas path globally."""
    import os

    if os.environ.get("OT_FUSED_TOPK", "1") == "0" and force != "pallas":
        return project2_logp_topk_xla(h1, w1, b1, h2, w2, b2, lam, k)
    use_pallas = (force == "pallas") or (
        force is None and jax.default_backend() == "tpu")
    if use_pallas:
        return project2_logp_topk_pallas(h1, w1, b1, h2, w2, b2, float(lam), k)
    return project2_logp_topk_xla(h1, w1, b1, h2, w2, b2, lam, k)


def project_logp_topk_xla(h, weight, bias, k, with_lse: bool = False):
    """Reference semantics (materialized logits) — the non-TPU fallback."""
    logits = jnp.einsum("nd,vd->nv", h, weight.astype(h.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(logp, k)
    if with_lse:
        return vals, idx, jax.nn.logsumexp(logits, axis=-1)
    return vals, idx


def project_logp_topk(h, weight, bias, k, force: str | None = None,
                      with_lse: bool = False):
    """Fused on TPU, XLA elsewhere. ``force`` ∈ {None, 'pallas', 'xla'}.

    ``OT_FUSED_TOPK=0`` in the environment disables the Pallas path globally
    (escape hatch: a Mosaic regression on a new runtime would otherwise take
    every decode surface down with it).
    """
    import os

    if os.environ.get("OT_FUSED_TOPK", "1") == "0" and force != "pallas":
        return project_logp_topk_xla(h, weight, bias, k, with_lse=with_lse)
    use_pallas = (force == "pallas") or (
        force is None and jax.default_backend() == "tpu")
    if use_pallas:
        return project_logp_topk_pallas(h, weight, bias, k, with_lse=with_lse)
    return project_logp_topk_xla(h, weight, bias, k, with_lse=with_lse)
