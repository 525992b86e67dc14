"""Mask utilities.

Conventions (uniform across the framework):
  * ``pad_mask``: bool[B, T], True on real positions. This is the same
    contract as the reference collate output (``otrans/data/loader.py:66-108``).
  * attention masks are bool, broadcastable to [B, H, T_q, T_k], True = may
    attend. They are applied inside softmax as an additive -inf, never by
    multiplying probabilities (keeps everything fusible by XLA).

All helpers are shape-static and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e9  # large-but-finite; avoids NaN from (-inf) - (-inf) in softmax


def length_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """i32[B] lengths → bool[B, max_len] padding mask (True = valid)."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return pos < lengths[:, None].astype(jnp.int32)


def mask_to_length(mask: jnp.ndarray) -> jnp.ndarray:
    """bool[B, T] → i32[B] number of valid positions."""
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def causal_mask(t: int, dtype=bool) -> jnp.ndarray:
    """bool[1, 1, t, t] lower-triangular causal mask (True = may attend).

    Parity: reference ``otrans/decoder/utils.py:7-11`` (torch.tril of ones).
    """
    row = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return (col <= row).astype(dtype)[None, None, :, :]


def attn_mask_from_pad(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """bool[B, T_k] key padding → bool[B, 1, 1, T_k] attention mask."""
    return pad_mask[:, None, None, :]


def causal_attn_mask(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """Combine causal structure with key padding: bool[B, 1, T, T]."""
    t = pad_mask.shape[-1]
    return jnp.logical_and(causal_mask(t), attn_mask_from_pad(pad_mask))


def apply_attn_mask(scores: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Additive-mask attention scores (f32 path) where mask is False."""
    if mask is None:
        return scores
    return jnp.where(mask, scores, jnp.asarray(NEG_INF, dtype=scores.dtype))


def chunk_attn_mask(t: int, chunk_size: int, left_chunks: int = -1) -> jnp.ndarray:
    """Block-chunked attention mask bool[1, 1, t, t] for streaming encoders.

    Position q (in chunk q//chunk_size) may attend keys in its own chunk and
    up to ``left_chunks`` previous chunks (-1 = unlimited left context). This
    is the standard chunked-attention scheme for joint online/offline
    conformers (dual-mode chunked attention); the reference has no streaming
    support (SURVEY §5 'long-context: none').
    """
    q_chunk = lax.broadcasted_iota(jnp.int32, (t, t), 0) // chunk_size
    k_chunk = lax.broadcasted_iota(jnp.int32, (t, t), 1) // chunk_size
    ok = k_chunk <= q_chunk
    if left_chunks >= 0:
        ok = jnp.logical_and(ok, k_chunk >= q_chunk - left_chunks)
    return ok[None, None, :, :]


def subsample_mask(pad_mask: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Subsample a time mask through a conv layer.

    Parity with the reference frontend rule ``mask[:, kernel//2::stride]``
    (``otrans/frontend/conv.py:78-84``) so that frame counts after the conv
    frontend match the reference exactly; the caller truncates/pads to the
    conv output length.
    """
    return pad_mask[:, kernel // 2 :: stride]
