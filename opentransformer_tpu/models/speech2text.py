"""End-to-end models: attention-based SpeechToText and pure-CTC.

``SpeechToText`` — parity with reference ``otrans/model/speech2text.py:15-90``:
frontend → encoder → decoder, teacher forcing with the shifted-target scheme
(target_in = targets[:, :-1], target_out = targets[:, 1:]), label-smoothing
loss, optional hybrid CTC loss (1-w)·att + w·ctc on the encoder memory.

``CTCModel`` — parity with reference ``otrans/model/ctc.py`` (whose decode
path crashes as shipped, SURVEY §8.4 — ours works): frontend → encoder →
CTCAssistor, with the optional causal look-ahead depthwise conv over future
frames.

Targets contract (same as the reference collate): targets[B, U+2] =
BOS ⧺ y ⧺ EOS ⧺ PAD…, ``targets_length`` counts y+EOS (no BOS).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data import PAD
from ..ops.loss import ctc_loss, label_smoothing_loss
from ..ops.masks import length_to_mask, mask_to_length
from .decoder import TransformerDecoder
from .encoder import ConformerEncoder, TransformerEncoder
from .frontend import ConcatFrontEnd, ConvFrontEnd
from .modules import TorchLinear

Dtype = Any

FRONTENDS = {"conv": ConvFrontEnd, "concat": ConcatFrontEnd}
ENCODERS = {"transformer": TransformerEncoder, "conformer": ConformerEncoder}


def _build_frontend(frontend_type: str, cfg: dict, dtype):
    cls = FRONTENDS[frontend_type]
    kw = {k: v for k, v in dict(cfg).items() if k in cls.__dataclass_fields__}
    return cls(dtype=dtype, **kw, name="frontend")


def _build_encoder(encoder_type: str, cfg: dict, dtype):
    cls = ENCODERS[encoder_type]
    kw = {k: v for k, v in dict(cfg).items() if k in cls.__dataclass_fields__}
    return cls(dtype=dtype, **kw, name="encoder")


class CTCAssistor(nn.Module):
    """Frame-level vocabulary projection + CTC loss head.

    Reference ``otrans/model/ctc.py:12-66``: Linear to vocab with
    nn.CTCLoss(blank=0, zero_infinity=True); optional causal look-ahead
    depthwise conv mixing ``lookahead_steps`` future frames into each frame
    before projection.
    """

    vocab_size: int
    lookahead_steps: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.output_layer = TorchLinear(self.vocab_size, dtype=self.dtype)

    @nn.compact
    def _hidden(self, memory):
        """Pre-projection hidden states (look-ahead conv applied if any).

        The look-ahead conv is depthwise over [t .. t+lookahead]: pad right
        only (causal in reverse — sees only current + future frames). Its
        width equals the input width, unknown until the first call, so it is
        declared inline here (param path ``look_ahead_conv`` unchanged from
        earlier revisions).
        """
        h = memory
        if self.lookahead_steps > 0:
            d = memory.shape[-1]
            h = jnp.pad(h, ((0, 0), (0, self.lookahead_steps), (0, 0)))
            h = nn.Conv(
                features=d,
                kernel_size=(self.lookahead_steps + 1,),
                feature_group_count=d,
                padding="VALID",
                use_bias=False,  # reference parity: lookahead conv has no bias
                dtype=self.dtype,
                name="look_ahead_conv",
            )(h)
        return h

    def project(self, memory):
        return self.output_layer(self._hidden(memory)).astype(jnp.float32)

    def project_topk(self, memory, k: int, with_label: int | None = None):
        """Fused frame-wise log_softmax(project(memory)) top-k — the full
        [B, T, V] distribution never materializes (Pallas on TPU; see
        ``ops/project_topk.py``). Returns (logp f32[B, T, k], ids i32[B, T, k]).
        Greedy CTC (k=1) reads only ids; values are normalized log-probs.

        ``with_label`` additionally returns that single label's log-prob
        f32[B, T] (exact: its logit minus the row logsumexp) — the sparse
        prefix-beam path always needs blank even outside the top-k."""
        from ..ops.project_topk import project_logp_topk

        h = self._hidden(memory)
        p = self.output_layer.variables["params"]["dense"]
        w, bias = p["kernel"], p["bias"]  # kernel [D, V] (flax Dense layout)
        b_, t_ = h.shape[0], h.shape[1]
        h2 = h.reshape(b_ * t_, -1)
        if with_label is None:
            vals, idx = project_logp_topk(h2, w.T, bias, k)
            return vals.reshape(b_, t_, k), idx.reshape(b_, t_, k)
        vals, idx, lse = project_logp_topk(h2, w.T, bias, k, with_lse=True)
        logit_l = jnp.einsum("nd,d->n", h2, w[:, with_label].astype(h2.dtype),
                             preferred_element_type=jnp.float32)
        label_lp = logit_l + bias[with_label].astype(jnp.float32) - lse
        return (vals.reshape(b_, t_, k), idx.reshape(b_, t_, k),
                label_lp.reshape(b_, t_))

    def __call__(self, memory, memory_lengths, labels, label_lengths):
        logits = self.project(memory)
        return ctc_loss(logits, memory_lengths, labels, label_lengths, blank_id=0)


class SpeechToText(nn.Module):
    """frontend → encoder → decoder with label smoothing (+ optional CTC)."""

    frontend_type: str
    frontend_cfg: dict
    encoder_type: str
    encoder_cfg: dict
    decoder_cfg: dict
    ctc_weight: float = 0.0
    smoothing: float = 0.1
    lookahead_steps: int = 0
    moe_aux_weight: float = 0.01  # weight of the MoE load-balance loss
    dtype: Dtype = jnp.float32

    def setup(self):
        self.frontend = _build_frontend(self.frontend_type, self.frontend_cfg, self.dtype)
        self.encoder = _build_encoder(self.encoder_type, self.encoder_cfg, self.dtype)
        dec_kw = {
            k: v
            for k, v in dict(self.decoder_cfg).items()
            if k in TransformerDecoder.__dataclass_fields__
        }
        self.decoder = TransformerDecoder(dtype=self.dtype, **dec_kw, name="decoder")
        if self.ctc_weight > 0.0:
            self.assistor = CTCAssistor(
                vocab_size=self.decoder_cfg["vocab_size"],
                lookahead_steps=self.lookahead_steps,
                dtype=self.dtype, name="ctc",
            )

    def encode(self, feats, feat_mask, *, deterministic: bool = True, train: bool = False,
               return_aux: bool = False):
        x, mask = self.frontend(
            feats.astype(self.dtype), feat_mask, deterministic=deterministic, train=train
        )
        enc_out = self.encoder(x, mask, deterministic=deterministic, **(
            {"train": train} if self.encoder_type == "conformer" else {}
        ))
        memory, memory_mask = enc_out[0], enc_out[1]
        if return_aux:
            # MoE encoders return a 3rd element: the load-balance aux loss
            return memory, memory_mask, (enc_out[2] if len(enc_out) > 2 else None)
        return memory, memory_mask

    def __call__(self, feats, feat_mask, targets, targets_length, *, deterministic: bool = True, train: bool = False):
        """Returns (scalar loss f32, aux losses dict)."""
        memory, memory_mask, moe_aux = self.encode(
            feats, feat_mask, deterministic=deterministic, train=train, return_aux=True
        )

        target_in = targets[:, :-1]
        target_out = targets[:, 1:]
        # reference parity: the decoder self-attn mask is causal ONLY — padded
        # target positions are attendable keys (decoder/utils.py:7-11); the
        # loss masks padded outputs, so this only changes (and matches) the
        # logits of valid positions.
        logits = self.decoder(target_in, memory, memory_mask, None, deterministic=deterministic)
        att_loss = label_smoothing_loss(logits, target_out, self.smoothing, pad_id=PAD)

        aux = {}
        if self.ctc_weight > 0.0:
            # reference parity: CTC labels are y + EOS with targets_length
            # counting EOS (model/speech2text.py:60-69 passes target_out and
            # truth_length straight into nn.CTCLoss) — the CTC head learns to
            # emit <S/E> as the final symbol
            labels = target_out
            label_lengths = targets_length
            mem_lengths = mask_to_length(memory_mask)
            closs = self.assistor(memory, mem_lengths, labels, label_lengths)
            aux["ctc_loss"] = closs
            aux["att_loss"] = att_loss
            loss = (1.0 - self.ctc_weight) * att_loss + self.ctc_weight * closs
        else:
            loss = att_loss
        if moe_aux is not None:
            aux["moe_aux"] = moe_aux
            loss = loss + self.moe_aux_weight * moe_aux
        return loss, aux

    # -- pipeline-parallel split points (parallel/pipeline.py 1F1B schedule) --
    def pipeline_pre(self, feats, feat_mask, *, deterministic: bool = True, train: bool = False):
        """Frontend + encoder pre-block work; the encoder block stack itself
        is driven microbatch-wise by the 1F1B schedule. Returns
        (x0, memory_mask, attn_mask, pos_emb)."""
        x, mask = self.frontend(
            feats.astype(self.dtype), feat_mask, deterministic=deterministic, train=train
        )
        x, attn_mask, pos_emb = self.encoder.prepare(x, mask, deterministic=deterministic)
        return x, mask, attn_mask, pos_emb

    def pipeline_head(self, memory, memory_mask, targets, targets_length, *, deterministic: bool = True):
        """Encoder finalize + decoder + loss — the post-block tail of
        ``__call__`` applied to one pipeline microbatch. Returns scalar loss
        (hybrid CTC folded in; aux losses are not split out on this path)."""
        memory = self.encoder.finalize(memory)
        target_in = targets[:, :-1]
        target_out = targets[:, 1:]
        logits = self.decoder(target_in, memory, memory_mask, None, deterministic=deterministic)
        loss = label_smoothing_loss(logits, target_out, self.smoothing, pad_id=PAD)
        if self.ctc_weight > 0.0:
            mem_lengths = mask_to_length(memory_mask)
            closs = self.assistor(memory, mem_lengths, target_out, targets_length)
            loss = (1.0 - self.ctc_weight) * loss + self.ctc_weight * closs
        return loss

    # -- decode-side entry points (used via model.apply(..., method=...)) ---
    def init_cache(self, memory, max_len: int, beam_width: int = 1):
        return self.decoder.init_cache(memory, max_len, beam_width)

    def decode_step(self, token_t, cache, index, memory_pad_mask, src=None):
        return self.decoder.decode_step(token_t, cache, index, memory_pad_mask, src)

    def decode_step_topk(self, token_t, cache, index, memory_pad_mask, src, k: int):
        return self.decoder.decode_step_topk(token_t, cache, index, memory_pad_mask, src, k)

    def decode_hidden_step(self, token_t, cache, index, memory_pad_mask, src=None):
        return self.decoder.decode_hidden_step(token_t, cache, index, memory_pad_mask, src)

    def vocab_head(self):
        return self.decoder.vocab_head()

    def decode_full(self, targets_in, memory, memory_pad_mask):
        """Full-prefix logits (greedy/debug path)."""
        return self.decoder(targets_in, memory, memory_pad_mask, None, deterministic=True)

    def ctc_logits(self, memory):
        return self.assistor.project(memory)


class CTCModel(nn.Module):
    """frontend → encoder → CTC head (reference ``otrans/model/ctc.py:69-134``)."""

    frontend_type: str
    frontend_cfg: dict
    encoder_type: str
    encoder_cfg: dict
    vocab_size: int
    lookahead_steps: int = 0
    moe_aux_weight: float = 0.01  # weight of the MoE load-balance loss
    dtype: Dtype = jnp.float32

    def setup(self):
        self.frontend = _build_frontend(self.frontend_type, self.frontend_cfg, self.dtype)
        self.encoder = _build_encoder(self.encoder_type, self.encoder_cfg, self.dtype)
        self.assistor = CTCAssistor(
            vocab_size=self.vocab_size, lookahead_steps=self.lookahead_steps, dtype=self.dtype, name="ctc"
        )

    def encode(self, feats, feat_mask, *, deterministic: bool = True, train: bool = False,
               return_aux: bool = False):
        x, mask = self.frontend(
            feats.astype(self.dtype), feat_mask, deterministic=deterministic, train=train
        )
        enc_out = self.encoder(x, mask, deterministic=deterministic, **(
            {"train": train} if self.encoder_type == "conformer" else {}
        ))
        if return_aux:
            return enc_out[0], enc_out[1], (enc_out[2] if len(enc_out) > 2 else None)
        return enc_out[0], enc_out[1]

    def __call__(self, feats, feat_mask, targets, targets_length, *, deterministic: bool = True, train: bool = False):
        memory, memory_mask, moe_aux = self.encode(
            feats, feat_mask, deterministic=deterministic, train=train, return_aux=True
        )
        # reference parity: labels = y + EOS, lengths include EOS
        target_out = targets[:, 1:]
        mem_lengths = mask_to_length(memory_mask)
        loss = self.assistor(memory, mem_lengths, target_out, targets_length)
        aux = {}
        if moe_aux is not None:
            aux["moe_aux"] = moe_aux
            loss = loss + self.moe_aux_weight * moe_aux
        return loss, aux

    def recognize_logits(self, feats, feat_mask):
        """Frame log-probs for CTC decoding: (f32[B, T', V], bool[B, T'])."""
        memory, memory_mask = self.encode(feats, feat_mask)
        logits = self.assistor.project(memory)
        return jax.nn.log_softmax(logits, axis=-1), memory_mask

    def recognize_argmax(self, feats, feat_mask):
        """Per-frame argmax ids for greedy CTC without materializing the
        [B, T, V] distribution (fused projection top-1, ``ops/project_topk``;
        XLA fallback off-TPU). Returns (ids i32[B, T'], mask bool[B, T']).
        Same ids as ``argmax(recognize_logits(...))`` in f32 — the reference
        decodes greedily from exactly that argmax
        (``otrans/recognize/ctc.py:38-43``). Under bf16 the fused path
        accumulates logits in f32 (more precise than recognize_logits, whose
        Dense output rounds to bf16), so ids can differ where two logits tie
        at bf16 resolution."""
        memory, memory_mask = self.encode(feats, feat_mask)
        _, idx = self.assistor.project_topk(memory, 1)
        return idx[:, :, 0], memory_mask

    def recognize_topk(self, feats, feat_mask, k: int):
        """Per-frame top-k candidates + exact blank log-prob for the sparse
        native prefix-beam path: the host receives [B, T', k] candidate lists
        instead of the full [B, T', V] distribution (~V/k less device→host
        traffic; the host decoder pruned to its top ``prune_k`` per frame
        anyway, so with k == prune_k results match — up to exact f32 ties at
        the k-th slot, where lax.top_k's smallest-id rule and partial_sort's
        unspecified equal-value order can pick different candidate sets, and
        up to bf16 rounding (the fused path accumulates in f32). Reference
        semantics ``otrans/recognize/ctc.py:19-25`` via ctcdecode's
        cutoff_top_n. Returns (vals f32[B, T', k], ids i32[B, T', k],
        blank_lp f32[B, T'], mask bool[B, T'])."""
        from ..data import BLK

        memory, memory_mask = self.encode(feats, feat_mask)
        vals, idx, blank_lp = self.assistor.project_topk(
            memory, k, with_label=BLK)
        return vals, idx, blank_lp, memory_mask
