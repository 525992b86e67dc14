"""On-device batch beam search with incremental KV caching.

Semantics-parity target: the reference's batch beam search
(``otrans/recognize/speech2text.py:39-192``) — per-utterance beams
initialized to [0, -inf, ...], per-step top-k → beam² flatten → global top-k,
finished-beam masking that keeps exactly one alive branch at additive score 0
and forces EOS continuations, optional LM shallow fusion
(log_p + lm_weight·lm_log_p), early exit when every beam has emitted EOS, and
the post-loop length penalty score / ((5+len)/(5+1))^penalty with
len = #non-EOS tokens including BOS.

Performance: the reference re-runs the full decoder prefix every step with no
cache (``otrans/decoder/transformer.py:185-208``, README TODO). Here the whole
search is ONE jitted ``lax.while_loop``: O(1) decoder steps over a static
[B·K, H, U_max, Dh] KV cache, cross-attention K/V precomputed once, beam
reordering as a batched gather of the cache, and the LM (transformer-cached
or RNN-hidden) stepping inside the same loop. Early exit via the while
condition saves real time at batch≥1 since XLA keeps the loop on device.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BOS, EOS
from ..ops.masks import NEG_INF


class BeamHypotheses(NamedTuple):
    tokens: jnp.ndarray  # i32[B, K, U_max+1] (BOS at slot 0), sorted best-first
    scores: jnp.ndarray  # f32[B, K] length-penalized log-probs, sorted desc
    lengths: jnp.ndarray  # i32[B, K] number of real tokens incl. BOS, excl. EOS


def length_penalty(lengths: jnp.ndarray, penalty: float, lamda: float = 5.0) -> jnp.ndarray:
    """((lamda + len) / (lamda + 1)) ** penalty (reference ``speech2text.py:73-79``)."""
    return jnp.power((lamda + lengths.astype(jnp.float32)) / (lamda + 1.0), penalty)


def beam_search(
    decode_step: Callable,  # (tokens i32[B·K], cache, index, memory_mask[B,T]) -> (logp, cache)
    init_cache: Callable,  # (memory, max_len, beam_width) -> cache
    memory: jnp.ndarray,  # [B, T, D]
    memory_mask: jnp.ndarray,  # bool[B, T]
    beam_width: int,
    max_len: int,
    penalty: float = 0.6,
    lamda: float = 5.0,
    lm_step: Optional[Callable] = None,  # (tokens i32[N], state, index) -> (logp, state)
    lm_init: Optional[Callable] = None,  # (n: int) -> state
    lm_weight: float = 0.1,
    vocab_size: Optional[int] = None,
    eos_id: int = EOS,
    decode_topk: Optional[Callable] = None,  # (tokens, cache, index, mem_mask, src, k) -> (vals, idx, cache)
    decode_topk_lm: Optional[Callable] = None,  # (tokens, cache, lm_state, index, mem_mask, src, k) -> (vals, idx, cache, lm_state)
    lm_ancestral: bool = False,
) -> BeamHypotheses:
    """Run batched beam search fully on device. All shapes static.

    ``eos_id`` overrides the end token (benchmarks pass an out-of-vocab id to
    force full-length decodes — a worst-case throughput measurement).

    ``decode_topk``: fused projection→log-softmax→top-k step (the model's
    ``decode_step_topk``). Used instead of ``decode_step`` + ``lax.top_k``
    when no LM fusion is active — the [B·K, V] log-prob tensor is never
    materialized (Pallas kernel on TPU, see ``ops/project_topk.py``).

    ``decode_topk_lm``: the shallow-fusion counterpart — one fused step
    returning the top-k of ``logp_model + lm_weight·logp_lm`` from the two
    pre-projection hidden states (neither distribution materializes).

    ``lm_ancestral``: the ``decode_topk_lm`` closure threads the beam
    ancestry map into the LM, so the LM's KV caches are unordered
    append-only buffers (like the decoder's) and must NOT be physically
    gathered per step — the gather was measured as the entire 12 ms/step
    LM-fusion overhead at B512 beam5 (r5, ``tools/profile_decode.py --lm``).
    """
    b, t, _ = memory.shape
    k = beam_width

    # cross K/V is stored per-utterance inside the cache (beam-invariant);
    # only the self-attention cache lives at B·K rows.
    cache = init_cache(memory, max_len + 1, k)
    lm_state = lm_init(b * k) if lm_step is not None else None

    tokens = jnp.full((b * k, max_len + 1), eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(BOS)
    # [0, -inf, ...] per utterance so step-0 duplicates can't win
    init_scores = jnp.full((k,), NEG_INF, jnp.float32).at[0].set(0.0)
    scores = jnp.tile(init_scores[None, :], (b, 1))  # [B, K]
    end_flag = jnp.zeros((b, k), bool)
    # ancestry map: src[b, k, u] = cache ROW holding position u of the
    # hypothesis currently in slot k. The self caches are never physically
    # reordered (measured 82% of decode-loop time as a per-step gather);
    # attention selects rows via this map (modules.ancestral_decode_context).
    # Identity init: each row writes its own current position.
    ident = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :], (b, k))
    src = jnp.broadcast_to(ident[:, :, None], (b, k, max_len + 1)).astype(jnp.int32)

    def cond(state):
        step, tokens, scores, end_flag, cache, lm_state, src = state
        return jnp.logical_and(step < max_len, ~jnp.all(end_flag))

    def body(state):
        step, tokens, scores, end_flag, cache, lm_state, src = state
        cur = jax.lax.dynamic_index_in_dim(tokens, step, axis=1, keepdims=False)  # i32[B*K]
        if decode_topk_lm is not None and lm_step is not None:
            # fused shallow fusion: top-k of the combined score, neither the
            # model's nor the LM's [B*K, V] distribution ever exists
            top_vals, top_idx, new_cache, lm_state = decode_topk_lm(
                cur, cache, lm_state, step, memory_mask, src, k)
        elif decode_topk is not None and lm_step is None:
            # fused path: the full [B*K, V] distribution never exists
            top_vals, top_idx, new_cache = decode_topk(cur, cache, step, memory_mask, src, k)
        else:
            logp, new_cache = decode_step(cur, cache, step, memory_mask, src)  # [B*K, V]
            if lm_step is not None:
                lm_logp, lm_state = lm_step(cur, lm_state, step)
                logp = logp + lm_weight * lm_logp
            top_vals, top_idx = jax.lax.top_k(logp, k)  # [B*K, K]
        # finished beams: one alive branch with additive score 0, forced EOS
        fin = end_flag.reshape(b * k, 1)
        fin_vals = jnp.concatenate(
            [jnp.zeros((b * k, 1), jnp.float32), jnp.full((b * k, k - 1), NEG_INF, jnp.float32)],
            axis=1,
        )
        top_vals = jnp.where(fin, fin_vals, top_vals)
        top_idx = jnp.where(fin, jnp.full_like(top_idx, eos_id), top_idx)

        cand = scores.reshape(b, k, 1) + top_vals.reshape(b, k, k)  # [B, K, K]
        best_scores, best_flat = jax.lax.top_k(cand.reshape(b, k * k), k)  # [B, K]
        parent = best_flat // k  # [B, K] in [0, K)
        tok = jnp.take_along_axis(top_idx.reshape(b, k * k), best_flat, axis=1)  # [B, K]

        flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)  # [B*K]
        tokens = jnp.take(tokens, flat_parent, axis=0)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, tok.reshape(-1), step + 1, axis=1)
        # NO physical cache reorder: update the tiny ancestry map instead.
        # Positions ≤ step inherit the parent's lineage (column step itself
        # becomes `parent`, since src[b, p, step] = p by the identity
        # invariant); column step+1 resets to identity — each row writes its
        # own K/V there next iteration.
        src = jnp.take_along_axis(src, parent[:, :, None], axis=1)
        src = jax.lax.dynamic_update_index_in_dim(src, ident, step + 1, axis=2)
        if lm_state is not None and not lm_ancestral:
            lm_state = jax.tree_util.tree_map(lambda x: jnp.take(x, flat_parent, axis=0), lm_state)
        end_flag = jnp.take(end_flag.reshape(-1), flat_parent).reshape(b, k)
        end_flag = jnp.logical_or(end_flag, tok == eos_id)
        return step + 1, tokens, best_scores, end_flag, new_cache, lm_state, src

    step, tokens, scores, end_flag, cache, lm_state, src = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), tokens, scores, end_flag, cache, lm_state, src)
    )

    # lengths: #tokens before the first EOS after BOS, including BOS
    tokens_bk = tokens.reshape(b, k, max_len + 1)
    after_bos = tokens_bk[:, :, 1:]
    is_eos = after_bos == eos_id
    first_eos = jnp.argmax(is_eos, axis=-1)  # 0 if none — but EOS-fill guarantees presence
    has_eos = jnp.any(is_eos, axis=-1)
    lengths = jnp.where(has_eos, first_eos, max_len) + 1  # + BOS

    final = scores / length_penalty(lengths, penalty, lamda)
    order = jnp.argsort(-final, axis=1)
    final = jnp.take_along_axis(final, order, axis=1)
    lengths = jnp.take_along_axis(lengths, order, axis=1)
    tokens_bk = jnp.take_along_axis(tokens_bk, order[:, :, None], axis=1)
    return BeamHypotheses(tokens=tokens_bk, scores=final, lengths=lengths)


def greedy_search(
    decode_step: Callable,
    init_cache: Callable,
    memory: jnp.ndarray,
    memory_mask: jnp.ndarray,
    max_len: int,
    eos_id: int = EOS,
    decode_topk: Optional[Callable] = None,
) -> BeamHypotheses:
    """Argmax decoding as a jitted while_loop (beam=1 fast path).

    ``decode_topk`` (if given) replaces decode_step + argmax/max with the
    fused k=1 projection top-k — same smallest-index tie rule as argmax.
    """
    b = memory.shape[0]
    cache = init_cache(memory, max_len + 1)
    tokens = jnp.full((b, max_len + 1), eos_id, jnp.int32).at[:, 0].set(BOS)
    scores = jnp.zeros((b,), jnp.float32)
    end_flag = jnp.zeros((b,), bool)

    def cond(state):
        step, tokens, scores, end_flag, cache = state
        return jnp.logical_and(step < max_len, ~jnp.all(end_flag))

    def body(state):
        step, tokens, scores, end_flag, cache = state
        cur = jax.lax.dynamic_index_in_dim(tokens, step, axis=1, keepdims=False)
        if decode_topk is not None:
            vals1, idx1, cache = decode_topk(cur, cache, step, memory_mask, None, 1)
            tok, val = idx1[:, 0], vals1[:, 0]
        else:
            logp, cache = decode_step(cur, cache, step, memory_mask)
            tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            val = jnp.max(logp, axis=-1)
        tok = jnp.where(end_flag, eos_id, tok)
        scores = scores + jnp.where(end_flag, 0.0, val)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, tok, step + 1, axis=1)
        end_flag = jnp.logical_or(end_flag, tok == eos_id)
        return step + 1, tokens, scores, end_flag, cache

    step, tokens, scores, end_flag, cache = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), tokens, scores, end_flag, cache)
    )
    after_bos = tokens[:, 1:]
    is_eos = after_bos == eos_id
    lengths = jnp.where(jnp.any(is_eos, -1), jnp.argmax(is_eos, -1), max_len) + 1
    return BeamHypotheses(
        tokens=tokens[:, None, :], scores=scores[:, None], lengths=lengths[:, None]
    )
