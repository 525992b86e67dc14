"""Transformer decoder with incremental KV-cached decoding.

Training path parity: reference ``otrans/decoder/transformer.py:18-183`` —
embedding (optionally weight-tied with the output projection), additive
sinusoidal positions (x·sqrt(d) + pe), N layers of causal MHSA → cross-attn →
FFN with pre/post-norm and optional ``concat_after``, final projection to the
vocabulary.

Decode path: the reference recomputes the full prefix every step with no KV
cache (``otrans/decoder/transformer.py:185-208``, an acknowledged TODO at
``README.md:13``). Here decoding is O(1) per step: ``init_cache`` precomputes
cross-attention K/V from the encoder memory once and allocates static
[B, H, U_max, Dh] self-attention buffers; ``decode_step`` appends one position
and attends over the cached prefix — shaped for ``lax.while_loop`` beam
search (see ``recognize/beam.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masks import attn_mask_from_pad, causal_mask
from ..ops.project_topk import project_logp_topk
from .modules import (
    MultiHeadCrossAttention,
    MultiHeadSelfAttention,
    PositionwiseFeedForward,
    TorchLinear,
    sinusoid_position_encoding,
    torch_bias_init,
    vocab_head_params,
)

Dtype = Any


class TransformerDecoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    slf_attn_dropout: float = 0.0
    src_attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    residual_dropout: float = 0.1
    normalize_before: bool = False
    concat_after: bool = False
    activation: str = "glu"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        self.slf_attn = MultiHeadSelfAttention(
            self.n_heads, self.d_model, self.slf_attn_dropout, dtype=self.dtype, name="slf_attn"
        )
        self.src_attn = MultiHeadCrossAttention(
            self.n_heads, self.d_model, self.src_attn_dropout, dtype=self.dtype, name="src_attn"
        )
        self.ffn = PositionwiseFeedForward(
            self.d_model, self.d_ff, self.activation, self.ffn_dropout, dtype=self.dtype, name="ffn"
        )
        if self.concat_after:
            self.concat_linear1 = TorchLinear(self.d_model, dtype=self.dtype, name="concat_linear1")
            self.concat_linear2 = TorchLinear(self.d_model, dtype=self.dtype, name="concat_linear2")
        self.res_dropout = nn.Dropout(self.residual_dropout)

    def __call__(self, x, memory, self_mask, memory_mask, *, deterministic: bool = True):
        # reference-parity pre-norm: residual = normalized tensor (see
        # encoder.py note); post-norm unaffected.
        h = self.norm1(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        attn_out, _ = self.slf_attn(h, self_mask, deterministic=deterministic)
        if self.concat_after:
            # reference parity: no residual dropout on the concat_after branch
            x = residual + self.concat_linear1(jnp.concatenate([h, attn_out], axis=-1))
        else:
            x = residual + self.res_dropout(attn_out, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        h = self.norm2(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        attn_out, _ = self.src_attn(h, memory, memory_mask, deterministic=deterministic)
        if self.concat_after:
            x = residual + self.concat_linear2(jnp.concatenate([h, attn_out], axis=-1))
        else:
            x = residual + self.res_dropout(attn_out, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)

        h = self.norm3(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        x = residual + self.res_dropout(self.ffn(h, deterministic=deterministic), deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm3(x)
        return x

    def init_layer_cache(self, memory, batch: int, max_len: int, beam_width: int = 1):
        """Precompute cross K/V (per-utterance, beam-invariant) and allocate
        [B·beam, H, max_len, Dh] self-attention buffers."""
        ck, cv = self.src_attn.project_kv(memory)
        d_k = self.d_model // self.n_heads
        shape = (batch * beam_width, self.n_heads, max_len, d_k)
        return (
            {"k": jnp.zeros(shape, self.dtype), "v": jnp.zeros(shape, self.dtype)},
            {"ck": ck, "cv": cv},
        )

    def decode_step(self, x_t, self_cache, cross_cache, index, memory_pad_mask,
                    src_onehot=None):
        """x_t: [B·K, 1, D]; cross_cache per-utterance [B, H, T, Dh].

        Returns (y_t [B·K, 1, D], new self cache). The cross cache is
        read-only — it never needs beam reordering. With ``src_onehot`` the
        self cache is unordered too (ancestry-selected attention) and the
        beam search never gathers it.
        """
        h = self.norm1(x_t) if self.normalize_before else x_t
        residual = h if self.normalize_before else x_t
        attn_out, new_k, new_v = self.slf_attn.decode_step(
            h, self_cache["k"], self_cache["v"], index, src_onehot=src_onehot
        )
        if self.concat_after:
            attn_out = self.concat_linear1(jnp.concatenate([h, attn_out], axis=-1))
        x = residual + attn_out
        if not self.normalize_before:
            x = self.norm1(x)

        h = self.norm2(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        attn_out = self.src_attn.attend_beamed(
            h, cross_cache["ck"], cross_cache["cv"], memory_pad_mask
        )
        if self.concat_after:
            attn_out = self.concat_linear2(jnp.concatenate([h, attn_out], axis=-1))
        x = residual + attn_out
        if not self.normalize_before:
            x = self.norm2(x)

        h = self.norm3(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        x = residual + self.ffn(h)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, {"k": new_k, "v": new_v}


class _ScanDecoderLayer(TransformerDecoderLayer):
    """(carry, out)-shaped wrappers of the layer methods for nn.scan lifting
    (the scanned decoder variant; see TransformerDecoder.scan_layers)."""

    def scan_call(self, x, memory, self_mask, memory_mask, deterministic):
        y = TransformerDecoderLayer.__call__(
            self, x, memory, self_mask, memory_mask, deterministic=deterministic
        )
        return y, None

    def scan_init_cache(self, carry, memory, batch, max_len, beam_width):
        pair = self.init_layer_cache(memory, batch, max_len, beam_width)
        return carry, pair

    def scan_decode_step(self, x, self_cache, cross_cache, index, memory_pad_mask,
                         src_onehot):
        y, new_self = self.decode_step(
            x, self_cache, cross_cache, index, memory_pad_mask,
            src_onehot=src_onehot)
        return y, new_self


class TransformerDecoder(nn.Module):
    vocab_size: int
    d_model: int = 256
    n_heads: int = 4
    d_ff: int = 2048
    memory_dim: int = 256  # accepted for config parity (must equal d_model)
    n_blocks: int = 6
    pos_dropout: float = 0.0
    slf_attn_dropout: float = 0.0
    src_attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    residual_dropout: float = 0.1
    activation: str = "glu"
    normalize_before: bool = False
    concat_after: bool = False
    share_embedding: bool = True
    scan_layers: bool = False  # lax.scan over stacked blocks (O(1) HLO size)
    dtype: Dtype = jnp.float32

    def setup(self):
        # torch nn.Embedding default init: N(0, 1)
        self.embedding = nn.Embed(
            self.vocab_size,
            self.d_model,
            embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype,
            name="embedding",
        )
        layer_kw = dict(
            d_model=self.d_model,
            n_heads=self.n_heads,
            d_ff=self.d_ff,
            slf_attn_dropout=self.slf_attn_dropout,
            src_attn_dropout=self.src_attn_dropout,
            ffn_dropout=self.ffn_dropout,
            residual_dropout=self.residual_dropout,
            normalize_before=self.normalize_before,
            concat_after=self.concat_after,
            activation=self.activation,
            dtype=self.dtype,
        )
        if self.scan_layers:
            # one set of stacked params traversed by lax.scan in every mode:
            # training forward, cache init (cross K/V per layer) and the
            # incremental decode step — the compiled program holds ONE block
            # body instead of n_blocks copies.
            scan_kw = dict(
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.n_blocks,
            )
            bcast = nn.broadcast
            lifted = nn.scan(
                _ScanDecoderLayer,
                methods={
                    "scan_call": dict(**scan_kw, in_axes=(bcast, bcast, bcast, bcast)),
                    # cache leaves keep BATCH leading (beam reorder gathers
                    # axis 0); the layer dim is axis 1, scanned over
                    "scan_init_cache": dict(**scan_kw, in_axes=(bcast, bcast, bcast, bcast), out_axes=1),
                    "scan_decode_step": dict(**scan_kw, in_axes=(1, 1, bcast, bcast, bcast), out_axes=1),
                },
            )
            self.blocks = lifted(**layer_kw, name="blocks")
            self.layers = ()
        else:
            self.layers = [
                TransformerDecoderLayer(**layer_kw, name=f"block_{i}")
                for i in range(self.n_blocks)
            ]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        if not self.share_embedding:
            self.output_layer = TorchLinear(self.vocab_size, dtype=self.dtype, name="output_layer")
        else:
            # reference parity: the tied output layer keeps its own bias
            # (decoder/transformer.py:154-158 ties only the weight)
            self.output_bias = self.param(
                "output_bias", torch_bias_init(self.d_model), (self.vocab_size,)
            )
        self.pos_dropout_layer = nn.Dropout(self.pos_dropout)

    def _embed(self, tokens, start: int = 0, deterministic: bool = True):
        t = tokens.shape[1]
        x = self.embedding(tokens)
        pe = sinusoid_position_encoding(jnp.arange(start, start + t), self.d_model)[None]
        x = x * jnp.asarray(np.sqrt(self.d_model), self.dtype) + pe.astype(self.dtype)
        return self.pos_dropout_layer(x, deterministic=deterministic)

    def _project(self, h):
        if self.share_embedding:
            emb = self.embedding.embedding.astype(self.dtype)  # [V, D]
            logits = jnp.einsum("btd,vd->btv", h, emb, preferred_element_type=jnp.float32)
            return logits + self.output_bias.astype(jnp.float32)
        return self.output_layer(h).astype(jnp.float32)

    def __call__(self, targets_in, memory, memory_pad_mask, tgt_pad_mask=None, *, deterministic: bool = True):
        """Teacher-forced forward.

        targets_in: i[B, U] (BOS-prefixed, no final EOS);
        memory: [B, T, D]; memory_pad_mask: bool[B, T]; tgt_pad_mask: bool[B, U].
        Returns f32 logits [B, U, V].
        """
        u = targets_in.shape[1]
        self_mask = causal_mask(u)
        if tgt_pad_mask is not None:
            self_mask = jnp.logical_and(self_mask, attn_mask_from_pad(tgt_pad_mask))
        mem_mask = attn_mask_from_pad(memory_pad_mask)
        x = self._embed(targets_in, deterministic=deterministic)
        if self.scan_layers:
            x, _ = self.blocks.scan_call(x, memory, self_mask, mem_mask, deterministic)
        else:
            for layer in self.layers:
                x = layer(x, memory, self_mask, mem_mask, deterministic=deterministic)
        if self.normalize_before:
            x = self.after_norm(x)
        return self._project(x)

    def init_cache(self, memory, max_len: int, beam_width: int = 1):
        """Decode cache for a [B, T, D] memory batch.

        Returns {"self": [per-layer {"k","v"} at B·beam rows],
                 "cross": [per-layer {"ck","cv"} at B rows]} — cross K/V is
        beam-invariant and stored once per utterance.
        """
        b = memory.shape[0]
        if self.scan_layers:
            _, (self_c, cross_c) = self.blocks.scan_init_cache(
                jnp.zeros((), jnp.int32), memory, b, max_len, beam_width
            )
            # stacked leading layer dim on every leaf
            return {"self": self_c, "cross": cross_c}
        pairs = [layer.init_layer_cache(memory, b, max_len, beam_width) for layer in self.layers]
        return {"self": [p[0] for p in pairs], "cross": [p[1] for p in pairs]}

    def decode_step(self, token_t, cache, index, memory_pad_mask, src=None):
        """One incremental step.

        token_t: i[B·K] current input tokens; index: i32 scalar position;
        memory_pad_mask: bool[B, T] (untiled); src: optional i32[B, K, U_max]
        beam-ancestry map (row that wrote position u for the hypothesis in
        slot k) — when given the self caches are unordered and never need the
        per-step beam gather (``modules.ancestral_decode_context``).
        Returns (log_probs f32[B·K, V], new_cache).
        """
        x, new_self = self._decode_hidden(token_t, cache, index, memory_pad_mask, src)
        logits = self._project(x)[:, 0, :]
        return jax.nn.log_softmax(logits, axis=-1), {"self": new_self, "cross": cache["cross"]}

    def decode_step_topk(self, token_t, cache, index, memory_pad_mask, src, k: int):
        """One incremental step returning only the top-k next-token log-probs.

        Semantically ``lax.top_k(decode_step(...)[0], k)`` — what every
        LM-fusion-free beam/greedy step actually consumes — but the
        projection, log-softmax and top-k are fused on TPU
        (``ops.project_topk``): the [B·K, V] logits never hit HBM.
        Returns (logp f32[B·K, k] desc-sorted, ids i32[B·K, k], new_cache).
        """
        x, new_self = self._decode_hidden(token_t, cache, index, memory_pad_mask, src)
        h = x[:, 0, :]
        new_cache = {"self": new_self, "cross": cache["cross"]}
        # untied heads: the [D, V] kernel transpose is loop-invariant and
        # hoisted out of the decode while_loop by XLA
        w, b = vocab_head_params(self)
        vals, idx = project_logp_topk(h, w, b, k)
        return vals, idx, new_cache

    def decode_hidden_step(self, token_t, cache, index, memory_pad_mask, src=None):
        """One incremental step returning the pre-projection hidden state.

        (h [N, D], new_cache) — the vocab head is applied elsewhere (e.g.
        fused with an LM head in ``ops.project_topk.project2_logp_topk`` for
        shallow fusion, where top-k of the COMBINED score is what the beam
        consumes; reference semantics ``otrans/recognize/speech2text.py:102-105``).
        """
        x, new_self = self._decode_hidden(token_t, cache, index, memory_pad_mask, src)
        return x[:, 0, :], {"self": new_self, "cross": cache["cross"]}

    def vocab_head(self):
        """(weight [V, D], bias [V]) of the output projection."""
        return vocab_head_params(self)

    def _decode_hidden(self, token_t, cache, index, memory_pad_mask, src=None):
        """Shared body of the incremental step: embed at ``index``, run the
        block stack against the KV cache, final norm. Returns (x [N, 1, D],
        new_self_cache)."""
        x = self._embed(token_t[:, None], start=0)  # embed then fix position below
        # position-dependent PE: recompute at `index` (traced) — _embed used
        # start=0 over length 1, i.e. position 0; adjust by the PE delta.
        pe0 = sinusoid_position_encoding(jnp.zeros((1,), jnp.int32), self.d_model)[None]
        pe_t = sinusoid_position_encoding(index[None] if index.ndim == 0 else index, self.d_model)[None]
        x = x + (pe_t - pe0).astype(self.dtype)
        src_onehot = None
        if src is not None:
            # one-hot once for all layers; exact 0/1 so selection is exact
            src_onehot = jax.nn.one_hot(src, src.shape[1], dtype=jnp.float32)
        if self.scan_layers:
            x, new_self = self.blocks.scan_decode_step(
                x, cache["self"], cache["cross"], index, memory_pad_mask, src_onehot
            )
        else:
            new_self = []
            for layer, sc, cc in zip(self.layers, cache["self"], cache["cross"]):
                x, nsc = layer.decode_step(x, sc, cc, index, memory_pad_mask, src_onehot)
                new_self.append(nsc)
        if self.normalize_before:
            x = self.after_norm(x)
        return x, new_self
