"""Recognizers: model + optional LM → n-best transcripts.

Parity surface (reference ``otrans/recognize/base.py`` and
``recognize/__init__.py:5-16``): ``build_recognizer`` factory keyed by model
type, LM shallow fusion (transformer or RNN LM), n-best LM rescoring,
id→text translation with EOS stop and PAD skip.

Everything numeric is jitted; only string assembly happens on host.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from ..data import EOS, PAD
from ..models.lm import RecurrentLanguageModel, TransformerLanguageModel
from .beam import BeamHypotheses, beam_search, greedy_search
from .ctc_decode import ctc_collapse_ids


def make_lm_adapter(lm_model, lm_params, max_len: int):
    """(lm_init, lm_step) closures for shallow fusion inside the beam loop."""
    if lm_model is None:
        return None, None
    if isinstance(lm_model, TransformerLanguageModel):
        if lm_model.moe_experts > 0:
            # full-prefix scoring (rescoring) enforces per-expert capacity
            # over the whole sequence while the length-1 decode_step (beam
            # fusion) routes every token — the paths agree only in the
            # drop-free regime (models/lm.py MoE note)
            drop_free = lm_model.moe_experts / max(lm_model.moe_top_k, 1)
            if lm_model.moe_capacity_factor < drop_free:
                logger.warning(
                    "MoE LM built for recognition with moe_capacity_factor="
                    "%.2f < n_experts/top_k = %.2f: beam-fusion and n-best "
                    "rescoring scores diverge whenever expert capacity binds; "
                    "raise moe_capacity_factor to >= %.2f for the drop-free "
                    "regime", lm_model.moe_capacity_factor, drop_free, drop_free)

        def lm_init(n: int):
            d_k = lm_model.d_model // lm_model.n_heads
            shape = (n, lm_model.n_heads, max_len + 1, d_k)
            return [
                {"k": jnp.zeros(shape, lm_model.dtype), "v": jnp.zeros(shape, lm_model.dtype)}
                for _ in range(lm_model.num_blocks)
            ]

        def lm_step(tokens, state, index):
            return lm_model.apply(lm_params, tokens, state, index, method="decode_step")

        return lm_init, lm_step

    if isinstance(lm_model, RecurrentLanguageModel):

        def lm_init(n: int):
            return [
                (jnp.zeros((n, lm_model.hidden_size), lm_model.dtype),
                 jnp.zeros((n, lm_model.hidden_size), lm_model.dtype))
                for _ in range(lm_model.num_layers)
            ]

        def lm_step(tokens, state, index):
            return lm_model.apply(lm_params, tokens, state, method="decode_step")

        return lm_init, lm_step

    raise TypeError(f"unsupported LM type {type(lm_model)}")


class Recognizer:
    def __init__(self, model, params, idx2unit: Optional[dict] = None):
        self.model = model
        self.params = params
        self.idx2unit = idx2unit or {}

    def translate(self, ids) -> str:
        """id sequence → text; stop at EOS, skip PAD (reference
        ``recognize/base.py:90-116``)."""
        out = []
        for i in np.asarray(ids).tolist():
            if i == EOS:
                break
            if i == PAD:
                continue
            out.append(self.idx2unit.get(int(i), "<UNK>"))
        return " ".join(out)

    def nbest_translate(self, tokens) -> list[list[str]]:
        """[B, K, U] token array (BOS stripped by caller) → texts."""
        return [[self.translate(hyp) for hyp in utt] for utt in np.asarray(tokens)]


def make_memory_search(model, beam_width: int, max_len: int,
                       penalty: float = 0.6, lamda: float = 5.0,
                       lm=None, lm_params=None, lm_weight: float = 0.1,
                       eos_id: Optional[int] = None, force_beam: bool = False,
                       fused_topk: bool = True):
    """Jitted ``(params, memory, memory_mask) -> BeamHypotheses`` search over
    a precomputed encoder memory: the KV-cached beam (beam=1: greedy) with
    optional LM shallow fusion. The shared decode core behind the offline
    recognizer, long-form/windowed decoding, single-stream online attention,
    and the multi-stream attention server — change the search contract here,
    not at each call site. ``eos_id`` overrides the end token (benchmarks and
    parity tests pass an out-of-vocab id to force full-length decodes)."""
    from ..data import EOS
    eos = EOS if eos_id is None else int(eos_id)

    # The beam consumes only the per-step top-k of the (LM-fused) next-token
    # distribution: use the fused projection→log-softmax→top-k kernel when
    # available (Pallas on TPU — no [B·K, V] log-probs in HBM). Without an
    # LM that's the model's decode_step_topk; with shallow fusion it's the
    # two-head combined kernel over the model and LM hidden states.
    # fused kernel: top-k in one lane tile; fused_topk=False forces the
    # plain decode_step + lax.top_k path (benchmark fallback guard)
    fits_kernel = fused_topk and beam_width <= 128
    has_topk = (lm is None and fits_kernel
                and hasattr(type(model), "decode_step_topk"))
    has_topk_lm = (
        lm is not None
        and fits_kernel
        and hasattr(type(model), "decode_hidden_step")
        and hasattr(type(lm), "decode_hidden")
        and hasattr(type(lm), "vocab_head")
        and getattr(model, "decoder_cfg", {}).get("vocab_size")
        == getattr(lm, "vocab_size", None)
    )
    # transformer LMs accept the beam ancestry map: their KV caches stay
    # unordered append-only (like the decoder's) and the beam loop skips the
    # per-step physical lm_state gather. RNN LM state has no positional
    # cache — it must still be gathered.
    lm_ancestral = has_topk_lm and isinstance(lm, TransformerLanguageModel)

    @jax.jit
    def search(params, memory, memory_mask) -> BeamHypotheses:
        def decode_step(tokens, cache, index, mem_mask, src=None):
            return model.apply(params, tokens, cache, index, mem_mask, src,
                               method="decode_step")

        def init_cache(mem, n, beam=1):
            return model.apply(params, mem, n, beam, method="init_cache")

        decode_topk = None
        if has_topk:
            def decode_topk(tokens, cache, index, mem_mask, src, k):
                return model.apply(params, tokens, cache, index, mem_mask,
                                   src, k, method="decode_step_topk")

        if lm is not None:
            lm_i, lm_s = make_lm_adapter(lm, lm_params, max_len)
        else:
            lm_i = lm_s = None

        decode_topk_lm = None
        if has_topk_lm:
            from ..ops.project_topk import project2_logp_topk

            w_m, b_m = model.apply(params, method="vocab_head")
            w_l, b_l = lm.apply(lm_params, method="vocab_head")

            def decode_topk_lm(tokens, cache, lm_state, index, mem_mask, src, k):
                h, new_cache = model.apply(params, tokens, cache, index,
                                           mem_mask, src,
                                           method="decode_hidden_step")
                if lm_ancestral:
                    # unordered LM caches: the decoder's ancestry map selects
                    # LM cache rows too — no per-step lm_state gather (the
                    # gather was the whole 12 ms/step fusion overhead, r5)
                    h_l, new_state = lm.apply(lm_params, tokens, lm_state,
                                              index, src, method="decode_hidden")
                else:
                    h_l, new_state = lm.apply(lm_params, tokens, lm_state, index,
                                              method="decode_hidden")
                vals, idx = project2_logp_topk(
                    h, w_m, b_m, h_l, w_l, b_l, lm_weight, k)
                return vals, idx, new_cache, new_state

        if beam_width == 1 and lm is None and not force_beam:
            return greedy_search(decode_step, init_cache, memory, memory_mask,
                                 max_len, eos_id=eos, decode_topk=decode_topk)
        return beam_search(
            decode_step, init_cache, memory, memory_mask,
            beam_width=beam_width, max_len=max_len, penalty=penalty,
            lamda=lamda, lm_step=lm_s, lm_init=lm_i, lm_weight=lm_weight,
            eos_id=eos, decode_topk=decode_topk, decode_topk_lm=decode_topk_lm,
            lm_ancestral=lm_ancestral)

    return search


class SpeechToTextRecognizer(Recognizer):
    """Batch beam search with KV cache + optional LM fusion + rescoring."""

    def __init__(
        self,
        model,
        params,
        lm=None,
        lm_params=None,
        beam_width: int = 5,
        max_len: int = 100,
        penalty: float = 0.6,
        lamda: float = 5.0,
        lm_weight: float = 0.1,
        ctc_weight: float = 0.0,
        idx2unit: Optional[dict] = None,
    ):
        super().__init__(model, params, idx2unit)
        self.lm = lm
        self.lm_params = lm_params
        self.beam_width = int(beam_width)
        self.max_len = int(max_len)
        self.penalty = float(penalty)
        self.lamda = float(lamda)
        self.lm_weight = float(lm_weight)
        # joint CTC/attention rescoring (needs a hybrid-trained model)
        self.ctc_weight = float(ctc_weight)
        self._jit_recognize = self._build()

    def _build(self):
        model, ctc_w = self.model, self.ctc_weight
        # CTC rescoring combines length-penalized beam scores, so beam=1
        # must run the beam path (penalized scores), not the greedy shortcut
        search = make_memory_search(
            model, self.beam_width, self.max_len, self.penalty, self.lamda,
            lm=self.lm, lm_params=self.lm_params, lm_weight=self.lm_weight,
            force_beam=ctc_w > 0.0)

        @jax.jit
        def run(params, feats, feat_mask) -> BeamHypotheses:
            memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
            hyp = search(params, memory, memory_mask)
            if ctc_w > 0.0:
                ctc_logits = model.apply(params, memory, method="ctc_logits")
                hyp = ctc_rescore_scores(ctc_logits, memory_mask, hyp, ctc_w)
            return hyp

        return run

    def recognize_arrays(self, feats, feat_mask) -> BeamHypotheses:
        return self._jit_recognize(self.params, feats, feat_mask)

    def recognize(self, feats, feat_mask):
        """Returns (nbest texts [B][K], scores f32[B, K])."""
        hyp = self.recognize_arrays(feats, feat_mask)
        tokens = np.asarray(hyp.tokens)[:, :, 1:]  # strip BOS
        return self.nbest_translate(tokens), np.asarray(hyp.scores)


class CTCRecognizer(Recognizer):
    """CTC decoding: on-device vectorized greedy collapse (the reference's
    host python loop, ``recognize/ctc.py:38-58``, vectorized), or prefix beam
    search via the native C++ decoder with optional ARPA n-gram fusion
    (replacing the reference's external ``ctcdecode_edited``)."""

    def __init__(self, model, params, idx2unit=None, beam_width: int = 1,
                 nbest: int = 1, lm_path: str = None, alpha: float = 0.0,
                 beta: float = 0.0, prune_k: int = 32):
        super().__init__(model, params, idx2unit)
        self.beam_width = int(beam_width)
        self.nbest = int(nbest)
        self.alpha, self.beta = float(alpha), float(beta)
        self.lm = None
        if lm_path:
            from .native_ctc import NgramLM

            units = [idx2unit.get(i, f"<{i}>") for i in range(max(idx2unit) + 1)] if idx2unit else []
            self.lm = NgramLM(lm_path, units)

        @jax.jit
        def greedy(params, feats, feat_mask):
            # fused projection top-1: the [B, T, V] log-probs never exist
            ids, mask = model.apply(params, feats, feat_mask, method="recognize_argmax")
            return ctc_collapse_ids(ids, mask)

        @jax.jit
        def logits(params, feats, feat_mask):
            return model.apply(params, feats, feat_mask, method="recognize_logits")

        # device-pruned candidates for the native prefix beam: ships
        # [B, T, prune_k] (+ blank lp) to the host instead of [B, T, V].
        # Default 32 == ctc_beam_decode's prune_k (ctcdecode's cutoff_top_n
        # analog, default 40 in the reference's decoder) → identical results
        # clamp to the vocab and to the fused kernel's one-lane-tile limit
        prune_k = min(int(prune_k), int(getattr(model, "vocab_size", prune_k)), 128)

        @jax.jit
        def topk(params, feats, feat_mask):
            return model.apply(params, feats, feat_mask, prune_k,
                               method="recognize_topk")

        self._jit_greedy = greedy
        self._jit_logits = logits
        self._jit_topk = topk
        self._prune_k = prune_k

    def recognize(self, feats, feat_mask):
        if self.beam_width <= 1:
            tokens, lengths = self._jit_greedy(self.params, feats, feat_mask)
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
            texts = [[self.translate(tokens[i, : lengths[i]])] for i in range(tokens.shape[0])]
            return texts, np.zeros((tokens.shape[0], 1), np.float32)

        from .native_ctc import ctc_beam_decode_sparse
        from ..ops.masks import mask_to_length

        vals, ids, blank_lp, mask = self._jit_topk(self.params, feats, feat_mask)
        counts = np.asarray(mask_to_length(mask), np.int32)
        tokens, lens, scores = ctc_beam_decode_sparse(
            np.asarray(vals), np.asarray(ids), np.asarray(blank_lp), counts,
            beam_width=self.beam_width,
            alpha=self.alpha, beta=self.beta, lm=self.lm, nbest=self.nbest,
        )
        texts = [
            [self.translate(tokens[i, k, : lens[i, k]]) for k in range(self.nbest)]
            for i in range(tokens.shape[0])
        ]
        return texts, scores


class TransducerRecognizer(Recognizer):
    """Frame-synchronous greedy transducer decoding (one jitted while_loop,
    ``models/transducer.py:greedy_decode``). The reference's transducer
    support is vestigial — checkpoint keys and CLI flags only
    (``eval.py:45-53,223-226``); this family actually decodes."""

    def __init__(self, model, params, idx2unit=None, max_symbols: int = 200,
                 beam_width: int = 1, nbest: int = 1, expansions: int = 2,
                 max_per_frame: int = 8, lm=None, lm_params=None,
                 lm_weight: float = 0.0):
        super().__init__(model, params, idx2unit)
        self.beam_width = int(beam_width)
        self.nbest = min(int(nbest), max(1, int(beam_width)))
        if lm is not None and lm_weight != 0.0 and self.beam_width <= 1:
            logger.warning(
                "transducer LM fusion applies to beam decoding only; greedy "
                "(-bw 1 / -md greedy) ignores the LM")
        if lm is not None and lm_weight != 0.0 and self.beam_width > 1:
            # both LM families work: the transformer LM's cached decode_step
            # accepts per-row indices (ragged per-hypothesis positions)
            lm_init, lm_step = make_lm_adapter(lm, lm_params, max_symbols)
        else:
            lm_init = lm_step = None
            lm_weight = 0.0

        @jax.jit
        def greedy(params, feats, feat_mask):
            return model.apply(params, feats, feat_mask, max_symbols,
                               max_per_frame, method="greedy_decode")

        @jax.jit
        def beam(params, feats, feat_mask):
            return model.apply(params, feats, feat_mask, self.beam_width,
                               max_symbols, expansions, lm_init, lm_step,
                               lm_weight, method="beam_decode")

        self._jit_greedy = greedy
        self._jit_beam = beam

    def recognize(self, feats, feat_mask):
        if self.beam_width <= 1:
            tokens, n = self._jit_greedy(self.params, feats, feat_mask)
            tokens, n = np.asarray(tokens), np.asarray(n)
            texts = [[self.translate(tokens[i, : n[i]])] for i in range(len(n))]
            return texts, np.zeros((len(n), 1), np.float32)
        tokens, lens, scores = self._jit_beam(self.params, feats, feat_mask)
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        texts = [
            [self.translate(tokens[i, j, : lens[i, j]]) for j in range(self.nbest)]
            for i in range(tokens.shape[0])
        ]
        return texts, np.asarray(scores)[:, : self.nbest]


def ctc_rescore_scores(logits, memory_mask, hyp: BeamHypotheses, weight: float) -> BeamHypotheses:
    """Joint CTC/attention n-best rescoring: final = (1-w)·att + w·ctc.

    The reference accepted ``ctc_weight`` at decode time but never used it
    (``recognize/speech2text.py:18``, SURVEY vestiges); here it works. The
    CTC score of each hypothesis is the (negated) CTC loss of the label
    sequence against the hybrid model's CTC head — vectorized over B·K.
    Requires a model trained with ``ctc_weight > 0``.
    """
    import optax

    from ..ops.masks import mask_to_length

    b, k, u = hyp.tokens.shape
    t = logits.shape[1]
    logits_bk = jnp.repeat(logits, k, axis=0)  # [B*K, T, V]
    frame_lens = jnp.repeat(mask_to_length(memory_mask), k, axis=0)
    frame_pad = (jnp.arange(t)[None, :] >= frame_lens[:, None]).astype(jnp.float32)

    # labels: strip BOS, keep EOS (the hybrid head is trained with y + EOS,
    # reference convention); hyp.lengths counts BOS + y, so y+EOS = lengths
    labels = hyp.tokens[:, :, 1:].reshape(b * k, u - 1)
    label_lens = hyp.lengths.reshape(b * k)
    pos = jnp.arange(u - 1)[None, :]
    label_pad = (pos >= label_lens[:, None]).astype(jnp.float32)
    labels = jnp.where(pos < label_lens[:, None], labels, 0)

    neg_logp = optax.ctc_loss(
        logits_bk.astype(jnp.float32), frame_pad, labels, label_pad, blank_id=0
    )
    ctc_scores = jnp.where(jnp.isfinite(neg_logp), -neg_logp, -1e9).reshape(b, k)
    new_scores = (1.0 - weight) * hyp.scores + weight * ctc_scores
    order = jnp.argsort(-new_scores, axis=1)
    return BeamHypotheses(
        tokens=jnp.take_along_axis(hyp.tokens, order[:, :, None], axis=1),
        scores=jnp.take_along_axis(new_scores, order, axis=1),
        lengths=jnp.take_along_axis(hyp.lengths, order, axis=1),
    )


def ctc_rescore(model, params, feats, feat_mask, hyp: BeamHypotheses, weight: float = 0.3):
    """Standalone CTC rescoring entry (re-encodes; recognizers fuse it)."""
    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
    logits = model.apply(params, memory, method="ctc_logits")
    return ctc_rescore_scores(logits, memory_mask, hyp, weight)


def lm_rescore(recognizer: Recognizer, lm, lm_params, hyp: BeamHypotheses, weight: float = 0.1):
    """N-best rescoring by mean LM log-prob (reference ``recognize/base.py:52-88``
    defined this but never wired it; here it's callable)."""
    b, k, u = hyp.tokens.shape
    tokens = hyp.tokens.reshape(b * k, u)
    logits = lm.apply(lm_params, tokens, method="logits")
    logp = jax.nn.log_softmax(logits, axis=-1)
    nxt = tokens[:, 1:]
    tok_lp = jnp.take_along_axis(logp[:, :-1], nxt[..., None], axis=-1)[..., 0]
    pos = jnp.arange(u - 1)[None, :]
    valid = pos < (hyp.lengths.reshape(b * k, 1))  # BOS..len tokens
    mean_lp = jnp.sum(tok_lp * valid, -1) / jnp.maximum(jnp.sum(valid, -1), 1)
    new_scores = hyp.scores + weight * mean_lp.reshape(b, k)
    order = jnp.argsort(-new_scores, axis=1)
    return BeamHypotheses(
        tokens=jnp.take_along_axis(hyp.tokens, order[:, :, None], axis=1),
        scores=jnp.take_along_axis(new_scores, order, axis=1),
        lengths=jnp.take_along_axis(hyp.lengths, order, axis=1),
    )


def build_recognizer(model_type: str, model, params, lm=None, lm_params=None, args: Any = None, idx2unit=None):
    """Factory matching reference ``recognize/__init__.py:5-16``."""
    args = args or {}
    get = args.get if hasattr(args, "get") else lambda k, d=None: getattr(args, k, d)
    if model_type == "speech2text":
        return SpeechToTextRecognizer(
            model, params, lm=lm, lm_params=lm_params,
            beam_width=get("beam_width", 5), max_len=get("max_len", 100),
            penalty=get("penalty", 0.6), lamda=get("lamda", 5.0),
            lm_weight=get("lm_weight", 0.1), ctc_weight=get("ctc_weight", 0.0),
            idx2unit=idx2unit,
        )
    if model_type == "ctc":
        return CTCRecognizer(
            model, params, idx2unit=idx2unit,
            beam_width=get("ctc_beam_width", get("beam_width", 1)),
            nbest=get("nbest", 1), lm_path=get("ngram_lm", None),
            alpha=get("alpha", 0.0), beta=get("beta", 0.0),
            prune_k=get("prune_k", 32) or 32,
        )
    if model_type == "transducer":
        return TransducerRecognizer(
            model, params, idx2unit=idx2unit, max_symbols=get("max_len", 200),
            beam_width=get("beam_width", 1), nbest=get("nbest", 1),
            max_per_frame=get("max_tokens_per_chunk", 8),
            lm=lm, lm_params=lm_params, lm_weight=get("lm_weight", 0.1) if lm is not None else 0.0,
        )
    raise KeyError(f"unknown model type for recognition: {model_type!r}")
