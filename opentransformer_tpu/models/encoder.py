"""Encoders: Transformer and Conformer.

Parity targets:
  * ``TransformerEncoder`` — reference ``otrans/encoder/transformer.py:16-153``:
    pre/post-norm layers of MHSA + FFN, optional ``concat_after`` linear,
    absolute sinusoidal or Transformer-XL relative positional encoding
    (relative positions [-(T-1)..T-1]).
  * ``ConformerEncoder`` — reference ``otrans/encoder/conformer.py:20-183``:
    macaron block ½·FFN → MHSA(relpos) → conv module → ½·FFN → LayerNorm,
    with a ``conv_first`` variant. The reference's forward() drops the second
    macaron FFN (SURVEY §8.2); we implement the *intended* architecture (both
    FFNs) — the defect is not replicated.

TPU notes: the whole stack is jit-traced with static shapes; attention layers
return no per-layer weight dicts on the hot path (a ``return_attn`` flag
exists for introspection/tests).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masks import attn_mask_from_pad, chunk_attn_mask
from .modules import (
    ConformerConvModule,
    MoEFeedForward,
    MultiHeadSelfAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    RelPosSelfAttention,
    TorchLinear,
    sinusoid_position_encoding,
)

Dtype = Any

logger = __import__("logging").getLogger(__name__)


def _warn_moe_stream_capacity(n_experts: int, top_k: int, capacity_factor: float):
    """Streamed MoE blocks route per chunk while the batch path routes per
    sequence — the outputs match only in the drop-free capacity regime
    (capacity never binds). Warn when the config can drop tokens."""
    drop_free = n_experts / max(top_k, 1)
    if capacity_factor < drop_free:
        logger.warning(
            "streaming an MoE encoder with moe_capacity_factor=%.2f < "
            "n_experts/top_k=%.2f: expert capacity can bind, and streamed "
            "outputs then diverge from the batch encode (capacity is "
            "enforced per chunk when streaming). Raise moe_capacity_factor "
            "to >= %.2f for exact parity.", capacity_factor, drop_free, drop_free)


def stream_kv_mask(batch, left, chunk, cache_len, chunk_mask=None):
    """Validity mask for a chunk-streaming attention step over
    [cache(left) ∥ chunk] keys: cache entries are valid only in the last
    ``cache_len`` slots (the shifting buffer fills from the right).
    ``cache_len`` may be an i32 scalar or i32[B] (per-row stream depths)."""
    cl = jnp.asarray(cache_len)
    if cl.ndim == 0:
        cl = jnp.full((batch,), cl)
    key_valid = jnp.arange(left)[None] >= (left - cl[:, None])
    new_valid = chunk_mask if chunk_mask is not None else jnp.ones((batch, chunk), bool)
    return jnp.concatenate([key_valid, new_valid], axis=1)[:, None, None, :]


class TransformerEncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    slf_attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    residual_dropout: float = 0.1
    normalize_before: bool = False
    concat_after: bool = False
    activation: str = "relu"
    relative_positional: bool = False
    moe_experts: int = 0       # >0: replace the FFN with a top-k MoE
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router_jitter: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        if self.relative_positional:
            self.slf_attn = RelPosSelfAttention(
                self.n_heads, self.d_model, self.slf_attn_dropout, dtype=self.dtype, name="slf_attn"
            )
        else:
            self.slf_attn = MultiHeadSelfAttention(
                self.n_heads, self.d_model, self.slf_attn_dropout, dtype=self.dtype, name="slf_attn"
            )
        if self.concat_after:
            self.concat_linear = TorchLinear(self.d_model, dtype=self.dtype, name="concat_linear")
        if self.moe_experts > 0:
            self.ffn = MoEFeedForward(
                self.d_model, self.d_ff, n_experts=self.moe_experts,
                top_k=self.moe_top_k, capacity_factor=self.moe_capacity_factor,
                activation=self.activation, dropout_rate=self.ffn_dropout,
                router_jitter=self.moe_router_jitter, dtype=self.dtype, name="moe",
            )
        else:
            self.ffn = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.activation, self.ffn_dropout, dtype=self.dtype, name="ffn"
            )
        self.res_dropout = nn.Dropout(self.residual_dropout)

    def __call__(self, x, attn_mask, pos_emb=None, deterministic: bool = True,
                 pad_mask=None):
        # (deterministic is positional-friendly for nn.remat static_argnums;
        # pad_mask [B, T] gates MoE dispatch and is unused for dense FFNs)
        # reference-parity pre-norm: the residual is the NORMALIZED tensor
        # (encoder/transformer.py:43-45 sets residual after norm1) — not
        # standard pre-LN. Post-norm (the shipped configs) is unaffected.
        h = self.norm1(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        if self.relative_positional:
            attn_out, w = self.slf_attn(h, attn_mask, pos_emb, deterministic=deterministic)
        else:
            attn_out, w = self.slf_attn(h, attn_mask, deterministic=deterministic)
        if self.concat_after:
            # reference parity: the concat_after branch applies NO residual
            # dropout (encoder/transformer.py:52-54)
            h = residual + self.concat_linear(jnp.concatenate([h, attn_out], axis=-1))
        else:
            h = residual + self.res_dropout(attn_out, deterministic=deterministic)
        if not self.normalize_before:
            h = self.norm1(h)

        h2 = self.norm2(h) if self.normalize_before else h
        residual = h2 if self.normalize_before else h
        moe_aux = None
        if self.moe_experts > 0:
            ffn_out, moe_aux = self.ffn(h2, deterministic=deterministic, pad_mask=pad_mask)
        else:
            ffn_out = self.ffn(h2, deterministic=deterministic)
        h = residual + self.res_dropout(ffn_out, deterministic=deterministic)
        if not self.normalize_before:
            h = self.norm2(h)
        if self.moe_experts > 0:
            return h, (w, moe_aux)
        return h, w

    def encode_step(self, x, cache_k, cache_v, kv_mask, chunk_mask=None):
        """Frame-synchronous chunk step (inference-only): the C new frames
        attend to the shifting left-context KV cache plus themselves. Both
        attention variants stream (``chunk_step`` exists on abs-PE and
        rel-pos modules). Exactly matches __call__ under ``chunk_attn_mask``;
        for MoE blocks the match holds in the drop-free capacity regime
        (``chunk_mask`` gates expert dispatch like ``pad_mask`` batch-side).
        """
        h = self.norm1(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        attn_out, new_k, new_v = self.slf_attn.chunk_step(h, cache_k, cache_v, kv_mask)
        if self.concat_after:
            h = residual + self.concat_linear(jnp.concatenate([h, attn_out], axis=-1))
        else:
            h = residual + attn_out
        if not self.normalize_before:
            h = self.norm1(h)
        h2 = self.norm2(h) if self.normalize_before else h
        residual = h2 if self.normalize_before else h
        if self.moe_experts > 0:
            ffn_out, _ = self.ffn(h2, pad_mask=chunk_mask)
            h = residual + ffn_out
        else:
            h = residual + self.ffn(h2)
        if not self.normalize_before:
            h = self.norm2(h)
        return h, new_k, new_v


class TransformerEncoder(nn.Module):
    d_model: int = 256
    n_heads: int = 4
    d_ff: int = 2048
    n_blocks: int = 12
    pos_dropout: float = 0.0
    slf_attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    residual_dropout: float = 0.1
    normalize_before: bool = False
    concat_after: bool = False
    activation: str = "relu"
    relative_positional: bool = False
    chunk_size: int = 0       # >0: streaming block-chunked self-attention
    left_chunks: int = -1     # -1 = unlimited left context
    remat: bool = False       # rematerialize blocks (trade FLOPs for memory)
    scan_layers: bool = False  # lax.scan over stacked blocks: O(1) HLO size
    moe_experts: int = 0       # >0: MoE FFN (beyond-reference; modules.py)
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router_jitter: float = 0.0
    moe_every: int = 1         # MoE in every k-th block (scan requires 1)
    dtype: Dtype = jnp.float32

    def setup(self):
        if not self.relative_positional:
            self.pos_enc = PositionalEncoding(
                self.d_model, dropout_rate=self.pos_dropout, dtype=self.dtype, name="pos_enc"
            )
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        layer_kw = dict(
            d_model=self.d_model, n_heads=self.n_heads, d_ff=self.d_ff,
            slf_attn_dropout=self.slf_attn_dropout, ffn_dropout=self.ffn_dropout,
            residual_dropout=self.residual_dropout, normalize_before=self.normalize_before,
            concat_after=self.concat_after, activation=self.activation,
            relative_positional=self.relative_positional, dtype=self.dtype,
        )
        moe_kw = dict(
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_router_jitter=self.moe_router_jitter,
        )
        if self.moe_experts > 0:
            if self.scan_layers and self.moe_every != 1:
                raise ValueError("scan_layers requires moe_every: 1 "
                                 "(all blocks structurally identical)")
            if self.scan_layers:
                layer_kw.update(moe_kw)
        layer_cls = (nn.remat(TransformerEncoderLayer, static_argnums=(4,))
                     if self.remat else TransformerEncoderLayer)
        if self.scan_layers:
            # stacked-parameter blocks traversed by lax.scan: the compiled
            # program contains ONE block body instead of n_blocks copies —
            # near-constant HLO size and compile time in depth. Param leaves
            # get a leading [n_blocks] dim (path 'blocks/...'); the unstacked
            # per-block layout remains the default for reference-checkpoint
            # interchange.
            self.blocks = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.n_blocks,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            )(**layer_kw, name="blocks")
        else:
            self.layers = [
                layer_cls(
                    **layer_kw,
                    **(moe_kw if self.moe_experts > 0
                       and (i + 1) % self.moe_every == 0 else {}),
                    name=f"block_{i}",
                )
                for i in range(self.n_blocks)
            ]

    def prepare(self, x, pad_mask, *, deterministic: bool = True):
        """Everything before the block stack: positional encoding and the
        attention mask. Split out so the 1F1B pipeline schedule
        (``parallel/pipeline.py:one_f_one_b_grads``) can drive the blocks
        microbatch-wise. Returns (x, attn_mask, pos_emb)."""
        t = x.shape[1]
        attn_mask = attn_mask_from_pad(pad_mask)
        if self.chunk_size > 0:
            attn_mask = jnp.logical_and(
                attn_mask, chunk_attn_mask(t, self.chunk_size, self.left_chunks)
            )
        pos_emb = None
        if self.relative_positional:
            pos = jnp.arange(-(t - 1), t)
            pos_emb = sinusoid_position_encoding(pos, self.d_model)[None].astype(self.dtype)
        else:
            x = self.pos_enc(x, deterministic=deterministic)
        return x, attn_mask, pos_emb

    def finalize(self, x):
        """Everything after the block stack (pipeline-parallel exit)."""
        return self.after_norm(x) if self.normalize_before else x

    def __call__(self, x, pad_mask, *, deterministic: bool = True, return_attn: bool = False):
        """x: [B, T, D]; pad_mask: bool[B, T] → (y [B,T,D], pad_mask, attn?)."""
        x, attn_mask, pos_emb = self.prepare(x, pad_mask, deterministic=deterministic)

        moe = self.moe_experts > 0
        if self.scan_layers:
            x, ws = self.blocks(x, attn_mask, pos_emb, deterministic, pad_mask)
            moe_aux = None
            if moe:
                ws, auxs = ws
                moe_aux = jnp.sum(auxs)
            x = self.finalize(x)
            out = (x, pad_mask) + ((moe_aux,) if moe else ())
            if return_attn:
                return out + ({"enc_blocks": ws},)
            return out

        attns = {}
        moe_aux = jnp.zeros((), jnp.float32) if moe else None
        for i, layer in enumerate(self.layers):
            x, w = layer(x, attn_mask, pos_emb, deterministic, pad_mask)
            if isinstance(w, tuple):
                w, aux_i = w
                moe_aux = moe_aux + aux_i
            if return_attn:
                attns[f"enc_block_{i}"] = w
        x = self.finalize(x)
        out = (x, pad_mask) + ((moe_aux,) if moe else ())
        if return_attn:
            return out + (attns,)
        return out

    # ---- frame-synchronous streaming (chunked-attention models) ----------

    def init_stream_cache(self, batch: int):
        """Per-block shifting KV caches for ``encode_step``. Requires a
        chunked-attention config (``chunk_size > 0``, ``left_chunks >= 0``)."""
        if self.chunk_size <= 0 or self.left_chunks < 0:
            raise ValueError(
                "streaming encode requires chunk_size > 0 and left_chunks >= 0 "
                f"(got chunk_size={self.chunk_size}, left_chunks={self.left_chunks})"
            )
        if self.scan_layers:
            raise NotImplementedError(
                "streaming encode requires unstacked blocks (scan_layers: false)"
            )
        if self.moe_experts > 0:
            _warn_moe_stream_capacity(
                self.moe_experts, self.moe_top_k, self.moe_capacity_factor)
        left = self.left_chunks * self.chunk_size
        d_k = self.d_model // self.n_heads
        shape = (batch, self.n_heads, left, d_k)
        return [
            {"k": jnp.zeros(shape, self.dtype), "v": jnp.zeros(shape, self.dtype)}
            for _ in range(self.n_blocks)
        ]

    def encode_step(self, x_chunk, cache, start, cache_len, chunk_mask=None):
        """One frame-synchronous step over a ``chunk_size``-frame block.

        Produces outputs identical to ``__call__`` under ``chunk_attn_mask``
        — per-layer KV caches hold each layer's last ``left_chunks`` blocks,
        so no recompute and O(chunk · left) attention per step.

        Args:
          x_chunk: [B, C, D] frontend output frames (C = chunk_size).
          cache: pytree from ``init_stream_cache``.
          start: i32 scalar — global frame index of the chunk's first frame —
            or i32[B] per-row indices (multi-stream serving: each row is an
            independent stream at its own position).
          cache_len: i32 scalar or i32[B] — valid frames currently in the
            cache (per row when [B]).
          chunk_mask: optional bool[B, C] validity of the new frames (final
            partial chunk).

        Returns (y_chunk [B, C, D], new_cache).
        """
        b, c, _ = x_chunk.shape
        left = self.left_chunks * self.chunk_size
        # rel-pos attention computes per-chunk relative offsets internally
        # (position-invariant), so only the abs-PE variant needs `start`
        x = x_chunk if self.relative_positional else self.pos_enc(x_chunk, start=start)
        kv_mask = stream_kv_mask(b, left, c, cache_len, chunk_mask)
        new_cache = []
        for layer, lc in zip(self.layers, cache):
            x, nk, nv = layer.encode_step(x, lc["k"], lc["v"], kv_mask, chunk_mask)
            new_cache.append({"k": nk, "v": nv})
        if self.normalize_before:
            x = self.after_norm(x)
        return x, new_cache


class ConformerEncoderBlock(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    cov_kernel_size: int = 15
    slf_attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    residual_dropout: float = 0.1
    conv_dropout: float = 0.0
    macaron_style: bool = True
    ffn_scale: float = 0.5
    conv_first: bool = False
    conv_norm_type: str = "layer"
    conv_causal: bool = False  # left-only conv: the streaming-servable variant
    relative_positional: bool = True
    activation: str = "glu"
    ref_compat: bool = False  # replicate the reference's trained-forward defects (§8.2, §8.3)
    moe_experts: int = 0       # >0: the post-macaron FFN becomes a top-k MoE
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router_jitter: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.macaron_style:
            self.pre_ffn_norm = nn.LayerNorm(dtype=self.dtype, name="pre_ffn_norm")
            self.pre_ffn = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.activation, self.ffn_dropout,
                dtype=self.dtype, name="pre_ffn")
        self.attn_norm = nn.LayerNorm(dtype=self.dtype, name="attn_norm")
        if self.relative_positional:
            self.slf_attn = RelPosSelfAttention(
                self.n_heads, self.d_model, self.slf_attn_dropout,
                use_out_proj=not self.ref_compat, dtype=self.dtype, name="slf_attn")
        else:
            self.slf_attn = MultiHeadSelfAttention(
                self.n_heads, self.d_model, self.slf_attn_dropout,
                dtype=self.dtype, name="slf_attn")
        self.conv_norm = nn.LayerNorm(dtype=self.dtype, name="conv_norm")
        self.conv_module = ConformerConvModule(
            self.d_model, kernel_size=self.cov_kernel_size,
            norm_type=self.conv_norm_type, dropout_rate=self.conv_dropout,
            causal=self.conv_causal, dtype=self.dtype, name="conv_module")
        self.post_ffn_norm = nn.LayerNorm(dtype=self.dtype, name="post_ffn_norm")
        if self.moe_experts > 0:
            if self.ref_compat:
                raise ValueError("ref_compat drops the post-FFN (SURVEY §8.2); "
                                 "it cannot host the MoE — unset one of them")
            # MoE in the second macaron FFN (the first stays dense); module
            # named 'moe' so the EP sharding rules (parallel/mesh.py) apply
            self.post_ffn = MoEFeedForward(
                self.d_model, self.d_ff, n_experts=self.moe_experts,
                top_k=self.moe_top_k, capacity_factor=self.moe_capacity_factor,
                activation=self.activation, dropout_rate=self.ffn_dropout,
                router_jitter=self.moe_router_jitter, dtype=self.dtype, name="moe")
        elif not self.ref_compat:
            self.post_ffn = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.activation, self.ffn_dropout,
                dtype=self.dtype, name="post_ffn")
        self.final_norm = nn.LayerNorm(dtype=self.dtype, name="final_norm")
        self.res_dropout = nn.Dropout(self.residual_dropout)

    def __call__(self, x, pad_mask, attn_mask, pos_emb=None, *, deterministic: bool = True, train: bool = False):
        scale = jnp.asarray(self.ffn_scale, self.dtype)
        if self.macaron_style:
            h = self.pre_ffn(self.pre_ffn_norm(x), deterministic=deterministic)
            x = x + scale * self.res_dropout(h, deterministic=deterministic)

        def attn_sub(x):
            h = self.attn_norm(x)
            if self.relative_positional:
                h, w = self.slf_attn(h, attn_mask, pos_emb, deterministic=deterministic)
            else:
                h, w = self.slf_attn(h, attn_mask, deterministic=deterministic)
            return x + self.res_dropout(h, deterministic=deterministic), w

        def conv_sub(x):
            h = self.conv_module(self.conv_norm(x), pad_mask,
                                 deterministic=deterministic, train=train)
            return x + self.res_dropout(h, deterministic=deterministic)

        if self.conv_first:
            x = conv_sub(x)
            x, w = attn_sub(x)
        else:
            x, w = attn_sub(x)
            x = conv_sub(x)

        # second macaron FFN — the intended architecture. The reference's
        # forward() forgot it and applies post_ffn_norm as a bare LayerNorm
        # (otrans/encoder/conformer.py:87); ref_compat=True replicates that so
        # trained reference checkpoints import with exact logits.
        h = self.post_ffn_norm(x)
        if self.ref_compat:
            x = h
            moe_aux = None
        else:
            moe_aux = None
            if self.moe_experts > 0:
                h, moe_aux = self.post_ffn(h, deterministic=deterministic,
                                           pad_mask=pad_mask)
            else:
                h = self.post_ffn(h, deterministic=deterministic)
            x = x + scale * self.res_dropout(h, deterministic=deterministic)
        x = self.final_norm(x)
        if self.moe_experts > 0:
            return x, (w, moe_aux)
        return x, w

    def encode_step(self, x, cache, kv_mask, chunk_mask=None, *, train: bool = False):
        """Frame-synchronous chunk step (inference): attention over the
        shifting KV cache + causal-conv step with carried state. Requires
        ``conv_causal=True``; exactly matches ``__call__`` under
        ``chunk_attn_mask`` (MoE blocks: in the drop-free capacity regime)."""
        scale = jnp.asarray(self.ffn_scale, self.dtype)
        if self.macaron_style:
            x = x + scale * self.pre_ffn(self.pre_ffn_norm(x))

        new_cache = dict(cache)

        def attn_sub(x):
            h = self.attn_norm(x)
            out, nk, nv = self.slf_attn.chunk_step(h, cache["k"], cache["v"], kv_mask)
            new_cache["k"], new_cache["v"] = nk, nv
            return x + out

        def conv_sub(x):
            h, nstate = self.conv_module.conv_step(self.conv_norm(x), cache["conv"], train=train)
            new_cache["conv"] = nstate
            return x + h

        if self.conv_first:
            x = conv_sub(x)
            x = attn_sub(x)
        else:
            x = attn_sub(x)
            x = conv_sub(x)

        h = self.post_ffn_norm(x)
        if self.ref_compat:
            x = h
        elif self.moe_experts > 0:
            h, _ = self.post_ffn(h, pad_mask=chunk_mask)
            x = x + scale * h
        else:
            x = x + scale * self.post_ffn(h)
        return self.final_norm(x), new_cache


class ConformerEncoder(nn.Module):
    d_model: int = 256
    n_heads: int = 4
    d_ff: int = 2048
    nblocks: int = 12  # reference config key is 'nblocks' (no underscore)
    cov_kernel_size: int = 15
    pos_dropout: float = 0.0
    slf_attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    residual_dropout: float = 0.1
    conv_dropout: float = 0.0
    macaron_style: bool = True
    ffn_scale: float = 0.5
    conv_first: bool = False
    conv_bias: bool = True  # accepted for config parity
    conv_norm_type: str = "layer"
    conv_causal: bool = False  # left-only conv padding (streaming-servable)
    activation: str = "glu"
    positional_encoding: bool = True
    relative_positional: bool = True
    chunk_size: int = 0
    left_chunks: int = -1
    ref_compat: bool = False  # import-compat with reference-trained conformers (§8.2/§8.3)
    moe_experts: int = 0       # >0: MoE post-FFN (beyond-reference; modules.py)
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router_jitter: float = 0.0
    moe_every: int = 1         # MoE in every k-th block
    dtype: Dtype = jnp.float32

    def setup(self):
        if not self.relative_positional and self.positional_encoding:
            self.pos_enc = PositionalEncoding(
                self.d_model, dropout_rate=self.pos_dropout, dtype=self.dtype, name="pos_enc")
        moe_kw = dict(
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_router_jitter=self.moe_router_jitter,
        )
        self.layers = [
            ConformerEncoderBlock(
                **(moe_kw if self.moe_experts > 0
                   and (i + 1) % self.moe_every == 0 else {}),
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                cov_kernel_size=self.cov_kernel_size,
                slf_attn_dropout=self.slf_attn_dropout,
                ffn_dropout=self.ffn_dropout,
                residual_dropout=self.residual_dropout,
                conv_dropout=self.conv_dropout,
                macaron_style=self.macaron_style,
                ffn_scale=self.ffn_scale,
                conv_first=self.conv_first,
                conv_norm_type=self.conv_norm_type,
                conv_causal=self.conv_causal,
                relative_positional=self.relative_positional,
                activation=self.activation,
                ref_compat=self.ref_compat,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.nblocks)
        ]

    def __call__(self, x, pad_mask, *, deterministic: bool = True, train: bool = False, return_attn: bool = False):
        t = x.shape[1]
        attn_mask = attn_mask_from_pad(pad_mask)
        if self.chunk_size > 0:
            attn_mask = jnp.logical_and(
                attn_mask, chunk_attn_mask(t, self.chunk_size, self.left_chunks)
            )
        pos_emb = None
        if self.relative_positional:
            pos = jnp.arange(-(t - 1), t)
            pos_emb = sinusoid_position_encoding(pos, self.d_model)[None].astype(self.dtype)
        elif self.positional_encoding:
            x = self.pos_enc(x, deterministic=deterministic)
        attns = {}
        moe = self.moe_experts > 0
        moe_aux = jnp.zeros((), jnp.float32) if moe else None
        for i, layer in enumerate(self.layers):
            x, w = layer(x, pad_mask, attn_mask, pos_emb, deterministic=deterministic, train=train)
            if isinstance(w, tuple):
                w, aux_i = w
                moe_aux = moe_aux + aux_i
            if return_attn:
                attns[f"enc_block_{i}"] = w
        out = (x, pad_mask) + ((moe_aux,) if moe else ())
        if return_attn:
            return out + (attns,)
        return out

    # ---- frame-synchronous streaming (chunked attention + causal conv) ----

    def init_stream_cache(self, batch: int):
        """Per-block shifting KV caches + causal-conv state for
        ``encode_step``. Requires chunked attention and ``conv_causal``."""
        if self.chunk_size <= 0 or self.left_chunks < 0:
            raise ValueError(
                "streaming encode requires chunk_size > 0 and left_chunks >= 0 "
                f"(got chunk_size={self.chunk_size}, left_chunks={self.left_chunks})")
        if not self.conv_causal:
            raise ValueError(
                "streaming a conformer requires conv_causal: true (the SAME-"
                "padded conv window reaches into future chunks)")
        if self.moe_experts > 0:
            _warn_moe_stream_capacity(
                self.moe_experts, self.moe_top_k, self.moe_capacity_factor)
        left = self.left_chunks * self.chunk_size
        d_k = self.d_model // self.n_heads
        kv = (batch, self.n_heads, left, d_k)
        return [
            {"k": jnp.zeros(kv, self.dtype), "v": jnp.zeros(kv, self.dtype),
             "conv": jnp.zeros((batch, self.cov_kernel_size - 1, self.d_model), self.dtype)}
            for _ in range(self.nblocks)
        ]

    def encode_step(self, x_chunk, cache, start, cache_len, chunk_mask=None):
        """One frame-synchronous step; same contract as
        ``TransformerEncoder.encode_step`` (rel-pos offsets are computed
        per-chunk inside the attention, so ``start`` is unused there but kept
        for the abs-PE variant)."""
        b, c, _ = x_chunk.shape
        left = self.left_chunks * self.chunk_size
        x = x_chunk
        if not self.relative_positional and self.positional_encoding:
            x = self.pos_enc(x, start=start)
        kv_mask = stream_kv_mask(b, left, c, cache_len, chunk_mask)
        new_cache = []
        for layer, lc in zip(self.layers, cache):
            x, nc = layer.encode_step(x, lc, kv_mask, chunk_mask)
            new_cache.append(nc)
        return x, new_cache
