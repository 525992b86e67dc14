"""Beam search tests: KV-cached fast path vs a naive full-prefix reference
implementation (the reference algorithm's semantics re-implemented slowly),
greedy equivalence, CTC collapse, LM fusion smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.data import BOS, EOS
from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.masks import length_to_mask, NEG_INF
from opentransformer_tpu.recognize.base import SpeechToTextRecognizer, lm_rescore
from opentransformer_tpu.recognize.beam import length_penalty
from opentransformer_tpu.recognize.ctc_decode import ctc_greedy_decode, ctc_prefix_beam_search
from tests.test_models import small_model_cfg, make_batch, VOCAB


def naive_beam_search(model, params, feats, feat_mask, beam, max_len, penalty=0.6, lamda=5.0):
    """Slow full-prefix beam search replicating reference semantics
    (otrans/recognize/speech2text.py:39-192) for parity checking."""
    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
    b = feats.shape[0]
    memory = jnp.repeat(memory, beam, axis=0)
    memory_mask = jnp.repeat(memory_mask, beam, axis=0)
    preds = np.full((b * beam, 1), BOS, np.int32)
    scores = np.tile(np.array([[0.0] + [NEG_INF] * (beam - 1)], np.float32), (b, 1)).reshape(-1, 1)
    end_flag = np.zeros((b * beam, 1), bool)

    for _ in range(max_len):
        logits = model.apply(params, jnp.asarray(preds), memory, memory_mask, method="decode_full")
        logp = np.asarray(jax.nn.log_softmax(logits[:, -1], axis=-1))  # [b*beam, V]
        top_v = np.sort(logp, axis=1)[:, ::-1][:, :beam]
        top_i = np.argsort(-logp, axis=1)[:, :beam]
        # finished-beam masking
        for r in range(b * beam):
            if end_flag[r, 0]:
                top_v[r] = [0.0] + [NEG_INF] * (beam - 1)
                top_i[r] = EOS
        cand = (scores + top_v).reshape(b, beam * beam)
        best_flat = np.argsort(-cand, axis=1)[:, :beam]
        best_scores = np.take_along_axis(cand, best_flat, axis=1)
        parent = best_flat // beam
        tok = np.take_along_axis(top_i.reshape(b, beam * beam), best_flat, axis=1)
        new_preds = np.zeros((b * beam, preds.shape[1] + 1), np.int32)
        for ib in range(b):
            for kk in range(beam):
                row = ib * beam + kk
                prow = ib * beam + parent[ib, kk]
                new_preds[row, :-1] = preds[prow]
                new_preds[row, -1] = tok[ib, kk]
        preds = new_preds
        scores = best_scores.reshape(-1, 1)
        end_flag = (preds[:, -1:] == EOS)
        if end_flag.all():
            break

    # finalize: length penalty
    preds = preds.reshape(b, beam, -1)
    scores = scores.reshape(b, beam)
    lengths = np.zeros((b, beam), np.int32)
    for ib in range(b):
        for kk in range(beam):
            seq = preds[ib, kk, 1:]
            eos_pos = np.where(seq == EOS)[0]
            lengths[ib, kk] = (eos_pos[0] if len(eos_pos) else len(seq)) + 1
    final = scores / np.asarray(length_penalty(jnp.asarray(lengths), penalty, lamda))
    order = np.argsort(-final, axis=1)
    return (
        np.take_along_axis(preds, order[:, :, None], axis=1),
        np.take_along_axis(final, order, axis=1),
        np.take_along_axis(lengths, order, axis=1),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(small_model_cfg())
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(7), feats, feat_mask, targets, targets_length)
    return model, params, feats, feat_mask


def test_beam_matches_naive_reference(model_and_params):
    model, params, feats, feat_mask = model_and_params
    max_len, beam = 8, 3
    rec = SpeechToTextRecognizer(model, params, beam_width=beam, max_len=max_len)
    hyp = rec.recognize_arrays(feats, feat_mask)
    ref_tokens, ref_scores, ref_lengths = naive_beam_search(
        model, params, feats, feat_mask, beam, max_len
    )
    got_scores = np.asarray(hyp.scores)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-3, atol=1e-3)
    got = np.asarray(hyp.tokens)
    for ib in range(got.shape[0]):
        for kk in range(got.shape[1]):
            L = ref_lengths[ib, kk]
            np.testing.assert_array_equal(got[ib, kk, :L], ref_tokens[ib, kk, :L])
    np.testing.assert_array_equal(np.asarray(hyp.lengths), ref_lengths)


def test_greedy_is_beam1(model_and_params):
    model, params, feats, feat_mask = model_and_params
    rec1 = SpeechToTextRecognizer(model, params, beam_width=1, max_len=8)
    hyp = rec1.recognize_arrays(feats, feat_mask)
    # naive argmax rollout
    ref_tokens, _, ref_lengths = naive_beam_search(model, params, feats, feat_mask, 1, 8, penalty=0.0)
    got = np.asarray(hyp.tokens)
    for ib in range(got.shape[0]):
        L = ref_lengths[ib, 0]
        np.testing.assert_array_equal(got[ib, 0, :L], ref_tokens[ib, 0, :L])


def test_lm_fusion_and_rescore_smoke(model_and_params):
    from opentransformer_tpu.models.lm import TransformerLanguageModel

    model, params, feats, feat_mask = model_and_params
    lm = TransformerLanguageModel(vocab_size=VOCAB, num_blocks=1, d_model=32, n_heads=2, d_ff=64)
    toks = jnp.ones((2, 5), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(1), toks, toks, jnp.asarray([5, 5]))
    rec = SpeechToTextRecognizer(
        model, params, lm=lm, lm_params=lm_params, beam_width=3, max_len=8, lm_weight=0.2
    )
    texts, scores = rec.recognize(feats, feat_mask)
    assert len(texts) == 2 and len(texts[0]) == 3
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # sorted desc

    hyp = rec.recognize_arrays(feats, feat_mask)
    rescored = lm_rescore(rec, lm, lm_params, hyp, weight=0.5)
    assert np.all(np.diff(np.asarray(rescored.scores), axis=1) <= 1e-6)


def test_ctc_greedy_collapse():
    # hand-built frame posteriors: blank=0
    # sequence: [1 1 0 2 2 0 0 3] -> collapse -> [1, 2, 3]
    ids = [1, 1, 0, 2, 2, 0, 0, 3]
    v = 5
    lp = np.full((1, len(ids), v), -10.0, np.float32)
    for t, s in enumerate(ids):
        lp[0, t, s] = 0.0
    mask = np.ones((1, len(ids)), bool)
    tokens, lengths = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray(mask))
    assert int(lengths[0]) == 3
    np.testing.assert_array_equal(np.asarray(tokens)[0, :3], [1, 2, 3])

    # repeated symbol separated by blank must stay duplicated: [1 0 1] -> [1, 1]
    ids = [1, 0, 1]
    lp = np.full((1, 3, v), -10.0, np.float32)
    for t, s in enumerate(ids):
        lp[0, t, s] = 0.0
    tokens, lengths = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray(np.ones((1, 3), bool)))
    assert int(lengths[0]) == 2
    np.testing.assert_array_equal(np.asarray(tokens)[0, :2], [1, 1])

    # masked frames ignored
    lp = np.full((1, 4, v), -10.0, np.float32)
    for t, s in enumerate([1, 2, 3, 4]):
        lp[0, t, s] = 0.0
    mask = np.asarray([[True, True, False, False]])
    tokens, lengths = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray(mask))
    assert int(lengths[0]) == 2
    np.testing.assert_array_equal(np.asarray(tokens)[0, :2], [1, 2])


def test_ctc_prefix_beam_search_beats_greedy_ambiguity():
    """Classic CTC case where greedy and prefix-sum disagree."""
    # V=2 (blank, 'a'); frames: p(blank)=0.6/0.4, p(a)=0.4/0.6 per frame.
    # greedy path: [blank, a] -> 'a'. prefix sums: P('')=0.24;
    # P('a') = 0.4*0.4(a,blank? ...) — total mass of 'a' > ''.
    probs = np.log(np.array([[0.6, 0.4], [0.4, 0.6]], np.float32))
    out = ctc_prefix_beam_search(probs, 2, beam_width=4, blank=0)
    total = {p: s for p, s in out}
    assert (1,) in total and () in total
    # P('') = .6*.4 = .24 ; P('a') = .6*.6 + .4*.4 + .4*.6 = .76
    np.testing.assert_allclose(np.exp(total[()]), 0.24, rtol=1e-5)
    np.testing.assert_allclose(np.exp(total[(1,)]), 0.76, rtol=1e-5)


def test_ctc_joint_rescoring():
    """ctc_weight>0 at decode time re-ranks with CTC scores (the reference's
    dead flag, made functional)."""
    from opentransformer_tpu.models.registry import build_model as bm

    cfg = small_model_cfg(ctc_weight=0.3)
    model = bm(cfg)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(3), feats, feat_mask, targets, targets_length)

    rec0 = SpeechToTextRecognizer(model, params, beam_width=3, max_len=8)
    rec1 = SpeechToTextRecognizer(model, params, beam_width=3, max_len=8, ctc_weight=0.5)
    hyp0 = rec0.recognize_arrays(feats, feat_mask)
    hyp1 = rec1.recognize_arrays(feats, feat_mask)
    # rescoring must produce sorted finite scores and change them
    s1 = np.asarray(hyp1.scores)
    assert np.all(np.diff(s1, axis=1) <= 1e-6)
    assert np.all(np.isfinite(s1))
    assert not np.allclose(np.asarray(hyp0.scores), s1)

    # weight==0 path keeps the attention-only result exactly
    rec_zero = SpeechToTextRecognizer(model, params, beam_width=3, max_len=8, ctc_weight=0.0)
    hyp_zero = rec_zero.recognize_arrays(feats, feat_mask)
    np.testing.assert_array_equal(np.asarray(hyp0.tokens), np.asarray(hyp_zero.tokens))


def test_beam_with_lm_fusion_matches_naive(model_and_params):
    """Fused-LM beam search must equal a naive full-prefix implementation
    with the same shallow-fusion rule (logp + w*lm_logp)."""
    from opentransformer_tpu.models.lm import TransformerLanguageModel

    model, params, feats, feat_mask = model_and_params
    lm = TransformerLanguageModel(vocab_size=VOCAB, num_blocks=1, d_model=32, n_heads=2, d_ff=64)
    toks = jnp.ones((2, 5), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(9), toks, toks, jnp.asarray([5, 5]))
    beam, max_len, w = 3, 7, 0.35

    rec = SpeechToTextRecognizer(
        model, params, lm=lm, lm_params=lm_params,
        beam_width=beam, max_len=max_len, lm_weight=w,
    )
    hyp = rec.recognize_arrays(feats, feat_mask)

    # naive: full-prefix decoder + full-prefix LM each step
    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
    b = feats.shape[0]
    memory = jnp.repeat(memory, beam, axis=0)
    memory_mask_t = jnp.repeat(memory_mask, beam, axis=0)
    preds = np.full((b * beam, 1), BOS, np.int32)
    scores = np.tile(np.array([[0.0] + [NEG_INF] * (beam - 1)], np.float32), (b, 1)).reshape(-1, 1)
    end_flag = np.zeros((b * beam, 1), bool)
    for _ in range(max_len):
        logits = model.apply(params, jnp.asarray(preds), memory, memory_mask_t, method="decode_full")
        logp = np.asarray(jax.nn.log_softmax(logits[:, -1], axis=-1))
        lm_logits = lm.apply(lm_params, jnp.asarray(preds), method="logits")
        lm_logp = np.asarray(jax.nn.log_softmax(lm_logits[:, -1], axis=-1))
        logp = logp + w * lm_logp
        top_v = np.sort(logp, axis=1)[:, ::-1][:, :beam]
        top_i = np.argsort(-logp, axis=1)[:, :beam]
        for r in range(b * beam):
            if end_flag[r, 0]:
                top_v[r] = [0.0] + [NEG_INF] * (beam - 1)
                top_i[r] = EOS
        cand = (scores + top_v).reshape(b, beam * beam)
        best_flat = np.argsort(-cand, axis=1)[:, :beam]
        best_scores = np.take_along_axis(cand, best_flat, axis=1)
        parent = best_flat // beam
        tok = np.take_along_axis(top_i.reshape(b, beam * beam), best_flat, axis=1)
        new_preds = np.zeros((b * beam, preds.shape[1] + 1), np.int32)
        for ib in range(b):
            for kk in range(beam):
                row, prow = ib * beam + kk, ib * beam + parent[ib, kk]
                new_preds[row, :-1] = preds[prow]
                new_preds[row, -1] = tok[ib, kk]
        preds, scores = new_preds, best_scores.reshape(-1, 1)
        end_flag = preds[:, -1:] == EOS
        if end_flag.all():
            break

    preds = preds.reshape(b, beam, -1)
    scores = scores.reshape(b, beam)
    lengths = np.zeros((b, beam), np.int32)
    for ib in range(b):
        for kk in range(beam):
            seq = preds[ib, kk, 1:]
            eos_pos = np.where(seq == EOS)[0]
            lengths[ib, kk] = (eos_pos[0] if len(eos_pos) else len(seq)) + 1
    final = scores / np.asarray(length_penalty(jnp.asarray(lengths), 0.6, 5.0))
    order = np.argsort(-final, axis=1)
    ref_scores = np.take_along_axis(final, order, axis=1)
    ref_tokens = np.take_along_axis(preds, order[:, :, None], axis=1)
    ref_lengths = np.take_along_axis(lengths, order, axis=1)

    np.testing.assert_allclose(np.asarray(hyp.scores), ref_scores, rtol=2e-3, atol=2e-3)
    got = np.asarray(hyp.tokens)
    for ib in range(b):
        for kk in range(beam):
            L = ref_lengths[ib, kk]
            np.testing.assert_array_equal(got[ib, kk, :L], ref_tokens[ib, kk, :L])


def test_beam5_long_matches_naive(model_and_params):
    """Wider beam + longer horizon parity check."""
    model, params, feats, feat_mask = model_and_params
    beam, max_len = 5, 14
    rec = SpeechToTextRecognizer(model, params, beam_width=beam, max_len=max_len, penalty=1.0)
    hyp = rec.recognize_arrays(feats, feat_mask)
    ref_tokens, ref_scores, ref_lengths = naive_beam_search(
        model, params, feats, feat_mask, beam, max_len, penalty=1.0
    )
    np.testing.assert_allclose(np.asarray(hyp.scores), ref_scores, rtol=2e-3, atol=2e-3)
    got = np.asarray(hyp.tokens)
    for ib in range(got.shape[0]):
        for kk in range(got.shape[1]):
            L = ref_lengths[ib, kk]
            np.testing.assert_array_equal(got[ib, kk, :L], ref_tokens[ib, kk, :L])


def test_fused_topk_beam_matches_unfused(model_and_params):
    """beam_search with decode_topk (fused projection top-k path) must equal
    the unfused decode_step + lax.top_k path hypothesis-for-hypothesis."""
    from opentransformer_tpu.recognize.beam import beam_search, greedy_search

    model, params, feats, feat_mask = model_and_params
    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")

    def decode_step(tokens, cache, index, mem_mask, src=None):
        return model.apply(params, tokens, cache, index, mem_mask, src,
                           method="decode_step")

    def init_cache(mem, n, beam=1):
        return model.apply(params, mem, n, beam, method="init_cache")

    def decode_topk(tokens, cache, index, mem_mask, src, k):
        return model.apply(params, tokens, cache, index, mem_mask, src, k,
                           method="decode_step_topk")

    for fused in (None, decode_topk):
        hyp = beam_search(decode_step, init_cache, memory, memory_mask,
                          beam_width=3, max_len=8, decode_topk=fused)
        if fused is None:
            base = hyp
        else:
            np.testing.assert_array_equal(np.asarray(hyp.tokens), np.asarray(base.tokens))
            np.testing.assert_allclose(np.asarray(hyp.scores), np.asarray(base.scores),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(hyp.lengths), np.asarray(base.lengths))

    g0 = greedy_search(decode_step, init_cache, memory, memory_mask, max_len=8)
    g1 = greedy_search(decode_step, init_cache, memory, memory_mask, max_len=8,
                       decode_topk=decode_topk)
    np.testing.assert_array_equal(np.asarray(g1.tokens), np.asarray(g0.tokens))
    np.testing.assert_allclose(np.asarray(g1.scores), np.asarray(g0.scores),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("lm_family", ["transformer", "rnn"])
def test_fused_lm_beam_matches_unfused(model_and_params, lm_family):
    """Shallow fusion through the fused two-head top-k (decode_topk_lm) must
    equal the unfused decode_step + lm_step + lax.top_k path, for both LM
    families."""
    from opentransformer_tpu.models.lm import (
        RecurrentLanguageModel,
        TransformerLanguageModel,
    )
    from opentransformer_tpu.ops.project_topk import project2_logp_topk
    from opentransformer_tpu.recognize.base import make_lm_adapter
    from opentransformer_tpu.recognize.beam import beam_search

    model, params, feats, feat_mask = model_and_params
    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
    max_len, w = 8, 0.3

    if lm_family == "transformer":
        lm = TransformerLanguageModel(vocab_size=VOCAB, num_blocks=1,
                                      d_model=32, n_heads=2, d_ff=64)
    else:
        lm = RecurrentLanguageModel(vocab_size=VOCAB, num_layers=1,
                                    hidden_size=32)
    toks = jnp.ones((2, 6), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(11), toks, toks, jnp.asarray([5, 5]))

    def decode_step(tokens, cache, index, mem_mask, src=None):
        return model.apply(params, tokens, cache, index, mem_mask, src,
                           method="decode_step")

    def init_cache(mem, n, beam=1):
        return model.apply(params, mem, n, beam, method="init_cache")

    lm_init, lm_step = make_lm_adapter(lm, lm_params, max_len)

    w_m, b_m = model.apply(params, method="vocab_head")
    w_l, b_l = lm.apply(lm_params, method="vocab_head")

    def decode_topk_lm(tokens, cache, lm_state, index, mem_mask, src, k):
        h, new_cache = model.apply(params, tokens, cache, index, mem_mask,
                                   src, method="decode_hidden_step")
        h_l, new_state = lm.apply(lm_params, tokens, lm_state, index,
                                  method="decode_hidden")
        vals, idx = project2_logp_topk(h, w_m, b_m, h_l, w_l, b_l, w, k)
        return vals, idx, new_cache, new_state

    common = dict(beam_width=3, max_len=max_len, lm_init=lm_init,
                  lm_step=lm_step, lm_weight=w)
    base = beam_search(decode_step, init_cache, memory, memory_mask, **common)
    fused = beam_search(decode_step, init_cache, memory, memory_mask,
                        decode_topk_lm=decode_topk_lm, **common)
    np.testing.assert_array_equal(np.asarray(fused.tokens), np.asarray(base.tokens))
    np.testing.assert_allclose(np.asarray(fused.scores), np.asarray(base.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fused.lengths), np.asarray(base.lengths))

    if lm_family == "transformer":
        # ancestral LM caches: the beam never gathers lm_state; the decoder's
        # ancestry map selects LM cache rows inside the attention instead
        # (the production make_memory_search path for transformer LMs)
        def decode_topk_lm_anc(tokens, cache, lm_state, index, mem_mask, src, k):
            h, new_cache = model.apply(params, tokens, cache, index, mem_mask,
                                       src, method="decode_hidden_step")
            h_l, new_state = lm.apply(lm_params, tokens, lm_state, index, src,
                                      method="decode_hidden")
            vals, idx = project2_logp_topk(h, w_m, b_m, h_l, w_l, b_l, w, k)
            return vals, idx, new_cache, new_state

        anc = beam_search(decode_step, init_cache, memory, memory_mask,
                          decode_topk_lm=decode_topk_lm_anc,
                          lm_ancestral=True, **common)
        np.testing.assert_array_equal(np.asarray(anc.tokens), np.asarray(base.tokens))
        np.testing.assert_allclose(np.asarray(anc.scores), np.asarray(base.scores),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(anc.lengths), np.asarray(base.lengths))
