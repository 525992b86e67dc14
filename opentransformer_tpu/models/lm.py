"""Language models: recurrent (LSTM) and Transformer.

Parity: reference ``otrans/model/lm.py`` — ``rnn_lm`` is embedding → LSTM
stack → Linear with optional tied weights and a stepwise ``predict`` carrying
hidden state; ``transformer_lm`` is embedding + positions → N causal
self-attention blocks → Linear. The reference's transformer-LM ``predict``
recomputes the whole prefix each step (``model/lm.py:126-141``); ours exposes
an O(1) KV-cached ``decode_step`` so shallow fusion rides the same
``lax.while_loop`` as the beam search.

Both train with label smoothing over (BOS⧺tokens → tokens⧺EOS) pairs, the
text-collate contract (``otrans/data/loader.py:24-63``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data import PAD
from ..ops.loss import label_smoothing_loss
from ..ops.masks import attn_mask_from_pad, causal_mask
from .modules import (
    MoEFeedForward,
    MultiHeadSelfAttention,
    PositionwiseFeedForward,
    sinusoid_position_encoding,
    TorchLinear,
    torch_bias_init,
    vocab_head_params,
)

Dtype = Any


class TransformerLMLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    residual_dropout: float = 0.1
    normalize_before: bool = False
    activation: str = "relu"
    moe_experts: int = 0       # >0: the FFN becomes a top-k MoE (beyond-ref)
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router_jitter: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.slf_attn = MultiHeadSelfAttention(self.n_heads, self.d_model, 0.0, dtype=self.dtype, name="slf_attn")
        if self.moe_experts > 0:
            # named 'moe' so the EP sharding rules (parallel/mesh.py) apply
            self.ffn = MoEFeedForward(
                self.d_model, self.d_ff, n_experts=self.moe_experts,
                top_k=self.moe_top_k, capacity_factor=self.moe_capacity_factor,
                activation=self.activation, dropout_rate=0.0,
                router_jitter=self.moe_router_jitter, dtype=self.dtype, name="moe",
            )
        else:
            self.ffn = PositionwiseFeedForward(self.d_model, self.d_ff, self.activation, 0.0, dtype=self.dtype, name="ffn")
        self.res_dropout = nn.Dropout(self.residual_dropout)

    def _ffn(self, h, deterministic, pad_mask):
        if self.moe_experts > 0:
            return self.ffn(h, deterministic=deterministic, pad_mask=pad_mask)
        return self.ffn(h, deterministic=deterministic), None

    def __call__(self, x, attn_mask, *, deterministic: bool = True, pad_mask=None):
        """Returns x, or (x, load-balance aux) for MoE layers."""
        h = self.norm1(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        out, _ = self.slf_attn(h, attn_mask, deterministic=deterministic)
        x = residual + self.res_dropout(out, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)
        h = self.norm2(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        ffn_out, moe_aux = self._ffn(h, deterministic, pad_mask)
        x = residual + self.res_dropout(ffn_out, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        if self.moe_experts > 0:
            return x, moe_aux
        return x

    def decode_step(self, x_t, cache, index, src_onehot=None):
        h = self.norm1(x_t) if self.normalize_before else x_t
        residual = h if self.normalize_before else x_t
        out, new_k, new_v = self.slf_attn.decode_step(h, cache["k"], cache["v"], index,
                                                      src_onehot=src_onehot)
        x = residual + out
        if not self.normalize_before:
            x = self.norm1(x)
        h = self.norm2(x) if self.normalize_before else x
        residual = h if self.normalize_before else x
        # MoE decode: a length-1 sequence routes each beam's token to its
        # top expert(s) (capacity 1 per expert per row); aux is discarded
        ffn_out, _ = self._ffn(h, True, None)
        x = residual + ffn_out
        if not self.normalize_before:
            x = self.norm2(x)
        return x, {"k": new_k, "v": new_v}


class TransformerLanguageModel(nn.Module):
    vocab_size: int
    num_blocks: int = 6
    d_model: int = 256
    n_heads: int = 4
    d_ff: int = 1024
    residual_dropout: float = 0.1
    smoothing: float = 0.1
    share_embedding: bool = True
    activation: str = "glu"  # the reference hardcodes glu (model/lm.py:113)
    # MoE note: full-prefix scoring (logits/__call__) enforces the per-expert
    # capacity over the whole sequence (over-capacity tokens pass through on
    # the residual), while the length-1 decode_step routes every token — the
    # two paths agree exactly only in the drop-free regime. For an LM used in
    # both beam fusion AND n-best rescoring, set moe_capacity_factor >=
    # n_experts / moe_top_k so capacity never binds.
    moe_experts: int = 0       # >0: MoE FFN in every block (beyond-reference)
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router_jitter: float = 0.0
    moe_aux_weight: float = 0.01
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.d_model,
            embedding_init=nn.initializers.normal(1.0), dtype=self.dtype, name="embedding",
        )
        self.blocks = [
            TransformerLMLayer(
                d_model=self.d_model, n_heads=self.n_heads, d_ff=self.d_ff,
                residual_dropout=self.residual_dropout, activation=self.activation,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                moe_router_jitter=self.moe_router_jitter,
                dtype=self.dtype, name=f"block_{i}",
            )
            for i in range(self.num_blocks)
        ]
        if not self.share_embedding:
            self.output_layer = TorchLinear(self.vocab_size, dtype=self.dtype, name="output_layer")
        else:
            self.output_bias = self.param(
                "output_bias", torch_bias_init(self.d_model), (self.vocab_size,)
            )

    def _embed(self, tokens, start: int = 0):
        t = tokens.shape[1]
        x = self.embedding(tokens)
        pe = sinusoid_position_encoding(jnp.arange(start, start + t), self.d_model)[None]
        return x * jnp.asarray(np.sqrt(self.d_model), self.dtype) + pe.astype(self.dtype)

    def _project(self, h):
        if self.share_embedding:
            emb = self.embedding.embedding.astype(self.dtype)
            logits = jnp.einsum("btd,vd->btv", h, emb, preferred_element_type=jnp.float32)
            return logits + self.output_bias.astype(jnp.float32)
        return self.output_layer(h).astype(jnp.float32)

    def _forward(self, tokens, pad_mask=None, *, deterministic: bool = True):
        """→ (logits f32[B,T,V], moe_aux | None)."""
        u = tokens.shape[1]
        mask = causal_mask(u)
        if pad_mask is not None:
            mask = jnp.logical_and(mask, attn_mask_from_pad(pad_mask))
        moe = self.moe_experts > 0
        # MoE dispatch gating only (the attention mask stays causal-only for
        # reference parity): PAD tokens claim no expert capacity
        dispatch_mask = (tokens != PAD) if moe else None
        x = self._embed(tokens)
        moe_aux = jnp.zeros((), jnp.float32) if moe else None
        for blk in self.blocks:
            out = blk(x, mask, deterministic=deterministic, pad_mask=dispatch_mask)
            if moe:
                x, aux_i = out
                moe_aux = moe_aux + aux_i
            else:
                x = out
        return self._project(x), moe_aux

    def logits(self, tokens, pad_mask=None, *, deterministic: bool = True):
        return self._forward(tokens, pad_mask, deterministic=deterministic)[0]

    def __call__(self, src, tgt, tgt_length, *, deterministic: bool = True):
        """src = BOS⧺tokens, tgt = tokens⧺EOS. Returns (loss, aux).

        Reference parity: the self-attn mask is causal ONLY (get_seq_mask,
        model/lm.py:14-18) — padded keys are attendable; the loss masks
        padded outputs."""
        logits, moe_aux = self._forward(src, deterministic=deterministic)
        loss = label_smoothing_loss(logits, tgt, self.smoothing, pad_id=PAD)
        aux = {}
        if moe_aux is not None:
            aux["moe_aux"] = moe_aux
            loss = loss + self.moe_aux_weight * moe_aux
        return loss, aux

    def init_cache(self, batch: int, max_len: int):
        d_k = self.d_model // self.n_heads
        shape = (batch, self.n_heads, max_len, d_k)
        return [
            {"k": jnp.zeros(shape, self.dtype), "v": jnp.zeros(shape, self.dtype)}
            for _ in range(self.num_blocks)
        ]

    def decode_step(self, token_t, cache, index):
        """token_t: i[B] → (log_probs f32[B, V], new cache). ``index`` may be
        a scalar (lockstep beam) or i32[B] (ragged per-row positions)."""
        h, new_cache = self.decode_hidden(token_t, cache, index)
        logits = self._project(h[:, None, :])[:, 0, :]
        return jax.nn.log_softmax(logits, axis=-1), new_cache

    def decode_hidden(self, token_t, cache, index, src=None):
        """Pre-projection hidden of one step: (h [B, D], new cache). Feeds the
        fused two-head shallow-fusion top-k (``ops.project_topk``).

        ``src``: optional i32[B, K, U] beam-ancestry map (B·K = rows) — the
        same map the decoder threads through ``decode_hidden_step``. When
        given, the LM's KV caches are UNORDERED append-only buffers selected
        inside the attention (``modules.ancestral_decode_context``) and the
        beam search never physically gathers them: the LM consumes exactly
        the decoder's token sequence, so the decoder's ancestry is the LM's.
        Measured (r5, B512 beam5 on v5e): the per-step tree_map gather of a
        6-block LM cache was the whole 12 ms/step shallow-fusion overhead.
        Scalar ``index`` only (lockstep beam)."""
        x = self._embed(token_t[:, None], start=0)
        index = jnp.asarray(index, jnp.int32)
        pe0 = sinusoid_position_encoding(jnp.zeros((1,), jnp.int32), self.d_model)[None]  # [1,1,D]
        if index.ndim == 0:
            pe_t = sinusoid_position_encoding(index[None], self.d_model)[None]  # [1,1,D]
        else:
            pe_t = sinusoid_position_encoding(index, self.d_model)[:, None]  # [B,1,D]
        x = x + (pe_t - pe0).astype(self.dtype)
        src_onehot = None
        if src is not None:
            # one-hot once for every block; exact 0/1 so selection is exact
            src_onehot = jax.nn.one_hot(src, src.shape[1], dtype=jnp.float32)
        new_cache = []
        for blk, lc in zip(self.blocks, cache):
            x, nlc = blk.decode_step(x, lc, index, src_onehot=src_onehot)
            new_cache.append(nlc)
        return x[:, 0, :], new_cache

    def vocab_head(self):
        """(weight [V, D], bias [V]) of the output projection."""
        return vocab_head_params(self)


class RecurrentLanguageModel(nn.Module):
    vocab_size: int
    num_layers: int = 2
    hidden_size: int = 1024
    dropout: float = 0.1
    residual_dropout: float = 0.1  # accepted for config parity
    smoothing: float = 0.1
    share_embedding: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.hidden_size,
            embedding_init=nn.initializers.normal(1.0), dtype=self.dtype, name="embedding",
        )
        # one nn.RNN per stacked layer; the same module serves the full
        # sequence path and the one-step decode path (length-1 sequence), so
        # params are shared between training and beam-search fusion.
        self.rnns = [
            nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype),
                return_carry=True,
                name=f"lstm_{i}",
            )
            for i in range(self.num_layers)
        ]
        if not self.share_embedding:
            self.output_layer = TorchLinear(self.vocab_size, dtype=self.dtype, name="output_layer")
        else:
            self.output_bias = self.param(
                "output_bias", torch_bias_init(self.hidden_size), (self.vocab_size,)
            )
        self.drop = nn.Dropout(self.dropout)

    def _project(self, h):
        if self.share_embedding:
            emb = self.embedding.embedding.astype(self.dtype)
            logits = jnp.einsum("btd,vd->btv", h, emb, preferred_element_type=jnp.float32)
            return logits + self.output_bias.astype(jnp.float32)
        return self.output_layer(h).astype(jnp.float32)

    def init_hidden(self, batch: int):
        return [
            (jnp.zeros((batch, self.hidden_size), self.dtype),
             jnp.zeros((batch, self.hidden_size), self.dtype))
            for _ in range(self.num_layers)
        ]

    def _run(self, tokens, hidden, *, deterministic: bool = True):
        """tokens: i[B, T] → (h [B, T, D], final hidden)."""
        x = self.embedding(tokens)
        finals = []
        for i, rnn in enumerate(self.rnns):
            carry, x = rnn(x, initial_carry=(hidden[i][0], hidden[i][1]))
            if i + 1 < len(self.rnns):
                x = self.drop(x, deterministic=deterministic)
            finals.append(carry)
        return x, finals

    def logits(self, tokens, pad_mask=None, *, deterministic: bool = True):
        hidden = self.init_hidden(tokens.shape[0])
        h, _ = self._run(tokens, hidden, deterministic=deterministic)
        return self._project(h)

    def __call__(self, src, tgt, tgt_length, *, deterministic: bool = True):
        logits = self.logits(src, deterministic=deterministic)
        return label_smoothing_loss(logits, tgt, self.smoothing, pad_id=PAD), {}

    def decode_step(self, token_t, hidden, index=None):
        """token_t: i[B] → (log_probs f32[B, V], new hidden). Stepwise predict
        (reference ``model/lm.py:75-91``)."""
        h, new_hidden = self.decode_hidden(token_t, hidden, index)
        logits = self._project(h[:, None, :])[:, 0, :]
        return jax.nn.log_softmax(logits, axis=-1), new_hidden

    def decode_hidden(self, token_t, hidden, index=None):
        """Pre-projection hidden of one step: (h [B, D], new hidden)."""
        x = self.embedding(token_t)[:, None, :]  # [B, 1, D]
        new_hidden = []
        for i, rnn in enumerate(self.rnns):
            carry, x = rnn(x, initial_carry=(hidden[i][0], hidden[i][1]))
            new_hidden.append(carry)
        return x[:, 0, :], new_hidden

    def vocab_head(self):
        """(weight [V, D], bias [V]) of the output projection."""
        return vocab_head_params(self)
