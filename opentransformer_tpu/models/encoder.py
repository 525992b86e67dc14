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
    MultiHeadSelfAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    RelPosSelfAttention,
    TorchLinear,
    sinusoid_position_encoding,
)

Dtype = Any


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
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, pos_emb=None, deterministic: bool = True):
        # (deterministic is positional-friendly for nn.remat static_argnums)
        # reference-parity pre-norm: the residual is the NORMALIZED tensor
        # (encoder/transformer.py:43-45 sets residual after norm1) — not
        # standard pre-LN. Post-norm (the shipped configs) is unaffected.
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        if self.relative_positional:
            attn_out, w = RelPosSelfAttention(
                self.n_heads, self.d_model, self.slf_attn_dropout, dtype=self.dtype, name="slf_attn"
            )(h, attn_mask, pos_emb, deterministic=deterministic)
        else:
            attn_out, w = MultiHeadSelfAttention(
                self.n_heads, self.d_model, self.slf_attn_dropout, dtype=self.dtype, name="slf_attn"
            )(h, attn_mask, deterministic=deterministic)
        if self.concat_after:
            # reference parity: the concat_after branch applies NO residual
            # dropout (encoder/transformer.py:52-54)
            h = residual + TorchLinear(self.d_model, dtype=self.dtype, name="concat_linear")(
                jnp.concatenate([h, attn_out], axis=-1)
            )
        else:
            h = residual + nn.Dropout(self.residual_dropout)(attn_out, deterministic=deterministic)
        if not self.normalize_before:
            h = nn.LayerNorm(dtype=self.dtype, name="norm1")(h)

        h2 = nn.LayerNorm(dtype=self.dtype, name="norm2")(h) if self.normalize_before else h
        residual = h2 if self.normalize_before else h
        ffn_out = PositionwiseFeedForward(
            self.d_model, self.d_ff, self.activation, self.ffn_dropout, dtype=self.dtype, name="ffn"
        )(h2, deterministic=deterministic)
        h = residual + nn.Dropout(self.residual_dropout)(ffn_out, deterministic=deterministic)
        if not self.normalize_before:
            h = nn.LayerNorm(dtype=self.dtype, name="norm2")(h)
        return h, w


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
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic: bool = True, return_attn: bool = False):
        """x: [B, T, D]; pad_mask: bool[B, T] → (y [B,T,D], pad_mask, attn?)."""
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
            x = PositionalEncoding(
                self.d_model, dropout_rate=self.pos_dropout, dtype=self.dtype, name="pos_enc"
            )(x, deterministic=deterministic)

        layer_kw = dict(
            d_model=self.d_model, n_heads=self.n_heads, d_ff=self.d_ff,
            slf_attn_dropout=self.slf_attn_dropout, ffn_dropout=self.ffn_dropout,
            residual_dropout=self.residual_dropout, normalize_before=self.normalize_before,
            concat_after=self.concat_after, activation=self.activation,
            relative_positional=self.relative_positional, dtype=self.dtype,
        )
        if self.scan_layers:
            # stacked-parameter blocks traversed by lax.scan: the compiled
            # program contains ONE block body instead of n_blocks copies —
            # near-constant HLO size and compile time in depth. Param leaves
            # get a leading [n_blocks] dim (path 'blocks/...'); the unstacked
            # per-block layout remains the default for reference-checkpoint
            # interchange.
            scan_cls = nn.scan(
                nn.remat(TransformerEncoderLayer, static_argnums=(4,))
                if self.remat else TransformerEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.n_blocks,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
            x, ws = scan_cls(**layer_kw, name="blocks")(x, attn_mask, pos_emb, deterministic)
            if self.normalize_before:
                x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
            if return_attn:
                return x, pad_mask, {"enc_blocks": ws}
            return x, pad_mask

        attns = {}
        layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(4,)) if self.remat else TransformerEncoderLayer
        for i in range(self.n_blocks):
            x, w = layer_cls(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                slf_attn_dropout=self.slf_attn_dropout,
                ffn_dropout=self.ffn_dropout,
                residual_dropout=self.residual_dropout,
                normalize_before=self.normalize_before,
                concat_after=self.concat_after,
                activation=self.activation,
                relative_positional=self.relative_positional,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, attn_mask, pos_emb, deterministic)
            if return_attn:
                attns[f"enc_block_{i}"] = w
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        if return_attn:
            return x, pad_mask, attns
        return x, pad_mask


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
    relative_positional: bool = True
    activation: str = "glu"
    ref_compat: bool = False  # replicate the reference's trained-forward defects (§8.2, §8.3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, attn_mask, pos_emb=None, *, deterministic: bool = True, train: bool = False):
        scale = jnp.asarray(self.ffn_scale, self.dtype)
        if self.macaron_style:
            h = nn.LayerNorm(dtype=self.dtype, name="pre_ffn_norm")(x)
            h = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.activation, self.ffn_dropout, dtype=self.dtype, name="pre_ffn"
            )(h, deterministic=deterministic)
            x = x + scale * nn.Dropout(self.residual_dropout)(h, deterministic=deterministic)

        def attn_sub(x):
            h = nn.LayerNorm(dtype=self.dtype, name="attn_norm")(x)
            if self.relative_positional:
                h, w = RelPosSelfAttention(
                    self.n_heads, self.d_model, self.slf_attn_dropout,
                    use_out_proj=not self.ref_compat, dtype=self.dtype, name="slf_attn"
                )(h, attn_mask, pos_emb, deterministic=deterministic)
            else:
                h, w = MultiHeadSelfAttention(
                    self.n_heads, self.d_model, self.slf_attn_dropout, dtype=self.dtype, name="slf_attn"
                )(h, attn_mask, deterministic=deterministic)
            return x + nn.Dropout(self.residual_dropout)(h, deterministic=deterministic), w

        def conv_sub(x):
            h = nn.LayerNorm(dtype=self.dtype, name="conv_norm")(x)
            h = ConformerConvModule(
                self.d_model,
                kernel_size=self.cov_kernel_size,
                norm_type=self.conv_norm_type,
                dropout_rate=self.conv_dropout,
                dtype=self.dtype,
                name="conv_module",
            )(h, pad_mask, deterministic=deterministic, train=train)
            return x + nn.Dropout(self.residual_dropout)(h, deterministic=deterministic)

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
        h = nn.LayerNorm(dtype=self.dtype, name="post_ffn_norm")(x)
        if self.ref_compat:
            x = h
        else:
            h = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.activation, self.ffn_dropout, dtype=self.dtype, name="post_ffn"
            )(h, deterministic=deterministic)
            x = x + scale * nn.Dropout(self.residual_dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x, w


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
    activation: str = "glu"
    positional_encoding: bool = True
    relative_positional: bool = True
    chunk_size: int = 0
    left_chunks: int = -1
    ref_compat: bool = False  # import-compat with reference-trained conformers (§8.2/§8.3)
    dtype: Dtype = jnp.float32

    @nn.compact
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
            x = PositionalEncoding(
                self.d_model, dropout_rate=self.pos_dropout, dtype=self.dtype, name="pos_enc"
            )(x, deterministic=deterministic)
        attns = {}
        for i in range(self.nblocks):
            x, w = ConformerEncoderBlock(
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
                relative_positional=self.relative_positional,
                activation=self.activation,
                ref_compat=self.ref_compat,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, pad_mask, attn_mask, pos_emb, deterministic=deterministic, train=train)
            if return_attn:
                attns[f"enc_block_{i}"] = w
        if return_attn:
            return x, pad_mask, attns
        return x, pad_mask
