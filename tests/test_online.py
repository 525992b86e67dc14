"""Frame-synchronous streaming: incremental encode/CTC must match batch.

The batch reference point is the SAME model applied offline with
``chunk_attn_mask`` — streaming (recognize/online.py) must reproduce it
bit-near-exactly chunk by chunk, including the conv-frontend lookahead and
the final partial chunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.masks import length_to_mask
from opentransformer_tpu.recognize.online import (
    StreamingCTCRecognizer,
    StreamingEncoderSession,
)

FRONTEND = {
    "input_size": 12, "output_size": 24, "in_channel": 1, "mid_channel": 4,
    "out_channel": 8, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2],
    "dropout": 0.0, "act_func_type": "relu", "front_end_layer_norm": False,
}
ENCODER = {
    "d_model": 24, "n_heads": 2, "d_ff": 32, "n_blocks": 3,
    "residual_dropout": 0.0, "normalize_before": False, "activation": "glu",
    "relative_positional": False, "chunk_size": 4, "left_chunks": 2,
}


def _s2t_cfg():
    return {
        "type": "speech2text", "frontend_type": "conv", "frontend": FRONTEND,
        "encoder_type": "transformer", "encoder": ENCODER,
        "decoder_type": "transformer",
        "decoder": {"vocab_size": 20, "d_model": 24, "n_heads": 2, "d_ff": 32,
                    "memory_dim": 24, "n_blocks": 1, "residual_dropout": 0.0,
                    "activation": "glu", "normalize_before": False,
                    "share_embedding": True},
        "ctc_weight": 0.0, "smoothing": 0.1,
    }


def _ctc_cfg():
    return {
        "type": "ctc", "frontend_type": "conv", "frontend": FRONTEND,
        "encoder_type": "transformer", "encoder": ENCODER,
        "vocab_size": 20, "lookahead_steps": 0,
    }


def _init(cfg, t=80, b=2, seed=0):
    model = build_model(cfg)
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(b, t, FRONTEND["input_size"])).astype(np.float32)
    mask = np.ones((b, t), bool)
    if cfg["type"] == "speech2text":
        tgt = np.ones((b, 5), np.int64)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask),
                            jnp.asarray(tgt.astype(np.int32)), jnp.asarray([4, 4]))
    else:
        tgt = np.ones((b, 6), np.int64)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask),
                            jnp.asarray(tgt.astype(np.int32)), jnp.asarray([5, 5]))
    return model, params, feats, mask


@pytest.mark.parametrize("tail_frames", [0, 9])
def test_streaming_encode_matches_batch(tail_frames):
    """feed()-ing 16-raw-frame chunks + finish(tail) reproduces the batch
    chunked encode exactly over every emitted frame."""
    model, params, feats, mask = _init(_s2t_cfg(), t=64 + tail_frames)
    b, t, _ = feats.shape

    memory, memory_mask = model.apply(
        params, jnp.asarray(feats), jnp.asarray(mask), method="encode")

    sess = StreamingEncoderSession(model, params, batch=b)
    rc = sess.raw_chunk
    for s in range(64 // rc):
        sess.feed(feats[:, s * rc:(s + 1) * rc])
    stream_mem, t_valid = sess.finish(feats[:, 64:] if tail_frames else None)

    t_batch = int(np.asarray(jnp.sum(memory_mask[0])))
    assert t_valid == t_batch
    np.testing.assert_allclose(
        np.asarray(stream_mem[:, :t_valid]), np.asarray(memory[:, :t_valid]),
        rtol=1e-5, atol=1e-5)


def test_streaming_encode_rejects_unchunked():
    cfg = _s2t_cfg()
    cfg["encoder"] = {**ENCODER, "chunk_size": 0}
    model, params, _, _ = _init(cfg)
    with pytest.raises(ValueError):
        StreamingEncoderSession(model, params)


def test_streaming_ctc_matches_batch_greedy():
    """Incremental greedy CTC equals offline greedy decoding on the same
    chunked model (same collapse rule)."""
    model, params, feats, mask = _init(_ctc_cfg(), t=73, seed=3)
    b = feats.shape[0]

    log_probs, mem_mask = model.apply(
        params, jnp.asarray(feats), jnp.asarray(mask), method="recognize_logits")
    ids = np.asarray(jnp.argmax(log_probs, axis=-1))
    lens = np.asarray(jnp.sum(mem_mask, axis=1))
    batch_tokens = []
    for i in range(b):
        out, last = [], 0
        for t in range(int(lens[i])):
            v = int(ids[i, t])
            if v != 0 and v != last:
                out.append(v)
            last = v
        batch_tokens.append(out)

    rec = StreamingCTCRecognizer(model, params, batch=b)
    rc = rec.session.raw_chunk
    n_full = feats.shape[1] // rc
    for s in range(n_full):
        rec.feed(feats[:, s * rc:(s + 1) * rc])
    hyps = rec.finish(feats[:, n_full * rc:])
    assert rec.tokens == batch_tokens
    assert hyps == [" ".join(map(str, t)) for t in batch_tokens]


def test_streaming_transducer_matches_offline_greedy():
    """Chunk-resumed RNNT greedy equals the offline greedy_decode on the same
    chunked-attention transducer (predictor state carries across chunks)."""
    from opentransformer_tpu.recognize.online import StreamingTransducerRecognizer

    cfg = {
        "type": "transducer", "frontend_type": "conv", "frontend": FRONTEND,
        "encoder_type": "transformer", "encoder": ENCODER,
        "vocab_size": 20, "predictor": {"num_layers": 1}, "d_joint": 24,
    }
    model = build_model(cfg)
    rng = np.random.default_rng(5)
    b, t = 2, 73
    feats = rng.normal(size=(b, t, FRONTEND["input_size"])).astype(np.float32)
    mask = np.ones((b, t), bool)
    targets = np.ones((b, 5), np.int64)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask),
                        jnp.asarray(targets.astype(np.int32)), jnp.asarray([4, 4]))

    tokens, n = model.apply(params, jnp.asarray(feats), jnp.asarray(mask),
                            method="greedy_decode")
    tokens, n = np.asarray(tokens), np.asarray(n)
    offline = [tokens[i, : n[i]].tolist() for i in range(b)]

    rec = StreamingTransducerRecognizer(model, params, batch=b)
    rc = rec.session.raw_chunk
    n_full = t // rc
    for s in range(n_full):
        rec.feed(feats[:, s * rc:(s + 1) * rc])
    rec.finish(feats[:, n_full * rc:])
    assert rec.tokens == offline, (rec.tokens, offline)


CONFORMER_ENC = {
    "d_model": 24, "n_heads": 2, "d_ff": 32, "nblocks": 2,
    "cov_kernel_size": 7, "residual_dropout": 0.0, "conv_dropout": 0.0,
    "macaron_style": True, "conv_first": False, "conv_norm_type": "layer",
    "conv_causal": True, "relative_positional": True, "activation": "glu",
    "chunk_size": 4, "left_chunks": 2,
}


@pytest.mark.parametrize("relative_positional", [True, False])
def test_streaming_conformer_matches_batch(relative_positional):
    """Causal-conv chunked conformer: streamed encode (rel-pos chunk
    attention + carried conv state) equals the batch encode exactly."""
    cfg = {
        "type": "ctc", "frontend_type": "conv", "frontend": FRONTEND,
        "encoder_type": "conformer",
        "encoder": {**CONFORMER_ENC, "relative_positional": relative_positional},
        "vocab_size": 20, "lookahead_steps": 0,
    }
    model, params, feats, mask = _init(cfg, t=64 + 9, seed=7)
    b = feats.shape[0]

    memory, memory_mask = model.apply(
        params, jnp.asarray(feats), jnp.asarray(mask), method="encode")

    sess = StreamingEncoderSession(model, params, batch=b)
    rc = sess.raw_chunk
    for s in range(64 // rc):
        sess.feed(feats[:, s * rc:(s + 1) * rc])
    stream_mem, t_valid = sess.finish(feats[:, 64:])

    t_batch = int(np.asarray(jnp.sum(memory_mask[0])))
    assert t_valid == t_batch
    np.testing.assert_allclose(
        np.asarray(stream_mem[:, :t_valid]), np.asarray(memory[:, :t_valid]),
        rtol=2e-5, atol=2e-5)


def test_streaming_conformer_requires_causal_conv():
    cfg = {
        "type": "ctc", "frontend_type": "conv", "frontend": FRONTEND,
        "encoder_type": "conformer",
        "encoder": {**CONFORMER_ENC, "conv_causal": False},
        "vocab_size": 20, "lookahead_steps": 0,
    }
    model, params, _, _ = _init(cfg, t=40, seed=7)
    with pytest.raises(Exception, match="conv_causal"):
        sess = StreamingEncoderSession(model, params, batch=2)
        sess.feed(np.zeros((2, sess.raw_chunk, FRONTEND["input_size"]), np.float32))
        sess.feed(np.zeros((2, sess.raw_chunk, FRONTEND["input_size"]), np.float32))


@pytest.mark.parametrize("tail_frames", [0, 9])
def test_streaming_transformer_relpos_matches_batch(tail_frames):
    """Rel-pos transformer encoder streams: relative offsets are position-
    invariant, so the per-chunk attention (RelPosSelfAttention.chunk_step)
    reproduces the batch chunked encode exactly."""
    cfg = _s2t_cfg()
    cfg["encoder"] = {**ENCODER, "relative_positional": True}
    model, params, feats, mask = _init(cfg, t=64 + tail_frames, seed=11)
    b = feats.shape[0]

    memory, memory_mask = model.apply(
        params, jnp.asarray(feats), jnp.asarray(mask), method="encode")

    sess = StreamingEncoderSession(model, params, batch=b)
    rc = sess.raw_chunk
    for s in range(64 // rc):
        sess.feed(feats[:, s * rc:(s + 1) * rc])
    stream_mem, t_valid = sess.finish(feats[:, 64:] if tail_frames else None)

    t_batch = int(np.asarray(jnp.sum(memory_mask[0])))
    assert t_valid == t_batch
    np.testing.assert_allclose(
        np.asarray(stream_mem[:, :t_valid]), np.asarray(memory[:, :t_valid]),
        rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_streaming_moe_encoder_matches_batch(encoder_type):
    """MoE blocks stream: in the drop-free capacity regime
    (capacity_factor >= n_experts / top_k) per-token expert outputs are
    independent of how the sequence is windowed, so streamed == batch."""
    moe = {"moe_experts": 2, "moe_top_k": 1, "moe_capacity_factor": 2.0}
    if encoder_type == "transformer":
        cfg = _s2t_cfg()
        cfg["encoder"] = {**ENCODER, **moe}
    else:
        cfg = {
            "type": "ctc", "frontend_type": "conv", "frontend": FRONTEND,
            "encoder_type": "conformer",
            "encoder": {**CONFORMER_ENC, **moe},
            "vocab_size": 20, "lookahead_steps": 0,
        }
    model, params, feats, mask = _init(cfg, t=64 + 9, seed=13)
    b = feats.shape[0]

    out = model.apply(params, jnp.asarray(feats), jnp.asarray(mask), method="encode")
    memory, memory_mask = out[0], out[1]

    sess = StreamingEncoderSession(model, params, batch=b)
    rc = sess.raw_chunk
    for s in range(64 // rc):
        sess.feed(feats[:, s * rc:(s + 1) * rc])
    stream_mem, t_valid = sess.finish(feats[:, 64:])

    t_batch = int(np.asarray(jnp.sum(memory_mask[0])))
    assert t_valid == t_batch
    np.testing.assert_allclose(
        np.asarray(stream_mem[:, :t_valid]), np.asarray(memory[:, :t_valid]),
        rtol=2e-5, atol=2e-5)


def test_streaming_attention_final_matches_offline_beam():
    """StreamingAttentionRecognizer: the FINAL transcript equals the
    offline beam search over the same chunked-encoder memory (the streamed
    encoder is bit-exact with batch encode; memory bucket padding is masked
    out of the attention), and PARTIAL results are produced along the way.

    An out-of-vocab eos_id forces every decode to run the full max_len
    steps (random-init models otherwise emit EOS immediately and the
    parity would be vacuous)."""
    from opentransformer_tpu.recognize.beam import beam_search
    from opentransformer_tpu.recognize.online import StreamingAttentionRecognizer

    NO_EOS = 10_000
    cfg = _s2t_cfg()
    model, params, feats, mask = _init(cfg, t=64 + 9, b=1, seed=3)

    # offline reference: batch chunked encode + the standard beam search
    memory, memory_mask = model.apply(
        params, jnp.asarray(feats), jnp.asarray(mask), method="encode")

    def decode_step(tokens, cache, index, mem_mask, src=None):
        return model.apply(params, tokens, cache, index, mem_mask, src,
                           method="decode_step")

    def init_cache(mem, n, beam=1):
        return model.apply(params, mem, n, beam, method="init_cache")

    hyp = beam_search(decode_step, init_cache, memory, memory_mask,
                      beam_width=3, max_len=12, penalty=0.6, lamda=5.0,
                      eos_id=NO_EOS)
    toks, lens = np.asarray(hyp.tokens), np.asarray(hyp.lengths)
    offline = toks[0, 0, 1:int(lens[0, 0])].tolist()
    assert len(offline) == 12, offline  # full-length, non-vacuous parity

    rec = StreamingAttentionRecognizer(
        model, params, batch=1, beam_width=3, max_len=12, mem_bucket=8,
        eos_id=NO_EOS)
    rc = rec.session.raw_chunk
    partials = []
    for s in range(64 // rc):
        partials.append(rec.feed(feats[:, s * rc:(s + 1) * rc])[0])
    final = rec.finish(feats[:, 64:])
    streamed = [int(x) for x in final[0].split()] if final[0] else []

    assert streamed == offline, (streamed, offline)
    # partials were recomputed as chunks arrived (list grows / stabilizes)
    assert len(partials) == 64 // rc

    # reset + re-stream must reproduce the same final (compiled fns reused)
    rec.reset()
    for s in range(64 // rc):
        rec.feed(feats[:, s * rc:(s + 1) * rc])
    final2 = rec.finish(feats[:, 64:])
    assert final2 == final
