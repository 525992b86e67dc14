"""Batched multi-stream CTC: N concurrent streams, one dispatch per tick.

Parity oracle: StreamingCTCRecognizer (single-stream, per-chunk jitted
steps), itself bit-exact with the offline chunked encode (test_online.py).
The multi-stream server must produce the SAME transcripts while advancing
ragged, interleaved streams in one fused step per tick.
"""

import threading

import numpy as np
import pytest

from opentransformer_tpu.recognize.multistream import (
    MultiStreamCTC,
    MultiStreamTransducer,
)
from opentransformer_tpu.recognize.online import (
    StreamingCTCRecognizer,
    StreamingTransducerRecognizer,
)
from tests.test_online import ENCODER, FRONTEND, _ctc_cfg, _init


def _rnnt_cfg():
    return {
        "type": "transducer", "frontend_type": "conv", "frontend": FRONTEND,
        "encoder_type": "transformer", "encoder": ENCODER,
        "vocab_size": 20, "predictor": {"num_layers": 1}, "d_joint": 24,
    }


def _sequential_transcripts(model, params, utts):
    rec = StreamingCTCRecognizer(model, params, batch=1)
    out = []
    for feats in utts:
        rec.reset()
        rc = rec.session.raw_chunk
        x = feats[None]
        n_full = x.shape[1] // rc
        for s in range(n_full):
            rec.feed(x[:, s * rc : (s + 1) * rc])
        out.append(rec.finish(x[:, n_full * rc :])[0])
    return out


def _make_utts(n, seeds, lens):
    utts = []
    for seed, t in zip(seeds, lens):
        rng = np.random.default_rng(seed)
        utts.append(rng.normal(size=(t, 12)).astype(np.float32) * 2.0)
    return utts


def test_multistream_matches_single_stream_ragged():
    """4 streams of different lengths, fed in interleaved odd-size pieces,
    must transcribe identically to the single-stream path — and the device
    dispatch count must be ticks, not ticks x streams."""
    model, params, _, _ = _init(_ctc_cfg(), t=80, b=2)
    lens = [64, 73, 41, 96]  # include non-chunk-multiple tails
    utts = _make_utts(4, [11, 12, 13, 14], lens)
    want = _sequential_transcripts(model, params, utts)

    ms = MultiStreamCTC(model, params, n_streams=4)
    finals = [None] * 4
    slots = []
    for i in range(4):
        slots.append(ms.open_stream(
            f"u{i}", lambda _t: None,
            lambda text, _i=i: finals.__setitem__(_i, text)))
    # interleave pushes in ragged pieces so streams sit at different depths
    cursors = [0] * 4
    pieces = [7, 13, 5, 24, 64, 96]
    while any(cursors[i] < lens[i] for i in range(4)):
        for i in range(4):
            for p in pieces:
                if cursors[i] >= lens[i]:
                    break
                n = min(p, lens[i] - cursors[i])
                ms.push(slots[i], utts[i][cursors[i] : cursors[i] + n])
                cursors[i] += n
            if ms.ready():
                ms.tick()
    for i in range(4):
        ms.close(slots[i])
    while ms.ready():
        ms.tick()

    assert finals == want
    # one fused dispatch per tick; ticks < total chunks (batching happened)
    assert ms.chunks_advanced > ms.ticks


def test_multistream_slot_reuse_no_state_leak():
    """A slot freed by a finished stream must serve a new stream cleanly
    (stale cache is masked by cache_len=0, not zeroed)."""
    model, params, _, _ = _init(_ctc_cfg(), t=80, b=2)
    utts = _make_utts(3, [21, 22, 23], [64, 48, 64])
    want = _sequential_transcripts(model, params, utts)

    ms = MultiStreamCTC(model, params, n_streams=2)
    got = []
    for u in utts:  # 3 streams through 2 slots forces reuse
        got.append(ms.run_stream(u, lambda _t: None))
    assert got == want


def test_multistream_concurrent_run_stream_threads():
    """>=4 threads driving run_stream concurrently (the serve usage):
    transcripts equal the sequential path; ticks serialize safely."""
    model, params, _, _ = _init(_ctc_cfg(), t=80, b=2)
    lens = [64, 56, 88, 48]
    utts = _make_utts(4, [31, 32, 33, 34], lens)
    want = _sequential_transcripts(model, params, utts)

    ms = MultiStreamCTC(model, params, n_streams=4)
    got = [None] * 4
    partial_counts = [0] * 4

    def worker(i):
        def on_partial(_t, _i=i):
            partial_counts[_i] += 1
        got[i] = ms.run_stream(utts[i], on_partial)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert got == want
    assert any(c > 0 for c in partial_counts)  # partials did stream out


def test_multistream_empty_stream_finalizes():
    """A stream closed with too few frames for even one encoder frame must
    still emit its (empty) FINAL rather than hang."""
    model, params, _, _ = _init(_ctc_cfg(), t=80, b=2)
    ms = MultiStreamCTC(model, params, n_streams=2)
    assert ms.run_stream(np.zeros((0, 12), np.float32), lambda _t: None) == ""
    assert ms.run_stream(np.zeros((3, 12), np.float32), lambda _t: None) == ""


def _sequential_rnnt(model, params, utts):
    rec = StreamingTransducerRecognizer(model, params, batch=1)
    out = []
    for feats in utts:
        rec.reset()
        rc = rec.session.raw_chunk
        x = feats[None]
        n_full = x.shape[1] // rc
        for s in range(n_full):
            rec.feed(x[:, s * rc : (s + 1) * rc])
        out.append(rec.finish(x[:, n_full * rc :])[0])
    return out


def test_multistream_transducer_matches_single_stream():
    """Ragged interleaved RNNT streams: per-row greedy_frames lattice walks
    with carried prediction-network state must match the single-stream
    recognizer, including slot reuse (fresh-mask state reset)."""
    model, params, _, _ = _init(_rnnt_cfg(), t=80, b=2)
    lens = [64, 73, 41, 96, 57]
    utts = _make_utts(5, [41, 42, 43, 44, 45], lens)
    want = _sequential_rnnt(model, params, utts)

    ms = MultiStreamTransducer(model, params, n_streams=3)
    finals = {}
    slots = {}
    order = [0, 1, 2]  # 5 streams through 3 slots forces reuse mid-run
    for i in order:
        slots[i] = ms.open_stream(
            f"u{i}", lambda _t: None,
            lambda text, _i=i: finals.__setitem__(_i, text))
    cursors = [0] * 5
    opened = set(order)
    guard = 0
    while len(finals) < 5:
        guard += 1
        assert guard < 10_000, "multi-stream transducer did not drain"
        for i in list(opened):
            if cursors[i] < lens[i]:
                n = min(17, lens[i] - cursors[i])
                ms.push(slots[i], utts[i][cursors[i] : cursors[i] + n])
                cursors[i] += n
                if cursors[i] >= lens[i]:
                    ms.close(slots[i])
        if ms.ready():
            ms.tick()
        # claim freed slots for the remaining streams
        for i in range(5):
            if i not in opened and len(ms._free) > 0:
                slots[i] = ms.open_stream(
                    f"u{i}", lambda _t: None,
                    lambda text, _i=i: finals.__setitem__(_i, text),
                    timeout=0.01)
                if slots[i] is not None:
                    opened.add(i)
    assert [finals[i] for i in range(5)] == want
    assert ms.chunks_advanced > ms.ticks  # batching happened


def test_multistream_rejects_lookahead():
    cfg = _ctc_cfg()
    cfg["lookahead_steps"] = 2
    model, params, _, _ = _init(cfg, t=80, b=2)
    with pytest.raises(NotImplementedError):
        MultiStreamCTC(model, params, n_streams=2)


def test_multistream_attention_matches_single_stream():
    """Batched attention streaming: 3 ragged interleaved speech2text streams
    must produce the SAME final transcripts as the single-stream
    StreamingAttentionRecognizer (itself offline-beam-exact), with one
    encoder dispatch per tick plus one batched beam dispatch per decode
    round. An out-of-vocab eos forces full-length hypotheses so the parity
    is non-vacuous."""
    from opentransformer_tpu.recognize.multistream import MultiStreamAttention
    from opentransformer_tpu.recognize.online import StreamingAttentionRecognizer
    from tests.test_online import _s2t_cfg

    NO_EOS = 10_000
    model, params, _, _ = _init(_s2t_cfg(), t=80, b=2, seed=5)
    lens = [64, 73, 41]
    utts = _make_utts(3, [31, 32, 33], lens)

    # single-stream oracle
    rec = StreamingAttentionRecognizer(
        model, params, batch=1, beam_width=3, max_len=10, mem_bucket=8,
        eos_id=NO_EOS)
    want = []
    for feats in utts:
        rec.reset()
        rc = rec.session.raw_chunk
        x = feats[None]
        n_full = x.shape[1] // rc
        for s in range(n_full):
            rec.feed(x[:, s * rc:(s + 1) * rc])
        want.append(rec.finish(x[:, n_full * rc:])[0])
    assert any(len(w.split()) == 10 for w in want), want  # non-vacuous

    ms = MultiStreamAttention(
        model, params, n_streams=3, beam_width=3, max_len=10, mem_bucket=8,
        eos_id=NO_EOS)
    finals = [None] * 3
    partial_seen = [0] * 3
    slots = []
    for i in range(3):
        slots.append(ms.open_stream(
            f"u{i}",
            lambda _t, _i=i: partial_seen.__setitem__(_i, partial_seen[_i] + 1),
            lambda text, _i=i: finals.__setitem__(_i, text)))
    cursors = [0] * 3
    pieces = [9, 17, 40, 96]
    while any(cursors[i] < lens[i] for i in range(3)):
        for i in range(3):
            for p in pieces:
                if cursors[i] >= lens[i]:
                    break
                n = min(p, lens[i] - cursors[i])
                ms.push(slots[i], utts[i][cursors[i]:cursors[i] + n])
                cursors[i] += n
            if ms.ready():
                ms.tick()
    for i in range(3):
        ms.close(slots[i])
    while ms.ready():
        ms.tick()

    assert finals == want
    assert ms.chunks_advanced > ms.ticks  # batching happened
    assert ms.decode_dispatches <= ms.ticks  # one beam dispatch per tick max
    assert any(n > 0 for n in partial_seen)  # PARTIALs flowed


def test_multistream_attention_slot_reuse():
    """Freed attention slots must serve new streams with cleared memory."""
    from opentransformer_tpu.recognize.multistream import MultiStreamAttention
    from opentransformer_tpu.recognize.online import StreamingAttentionRecognizer
    from tests.test_online import _s2t_cfg

    NO_EOS = 10_000
    model, params, _, _ = _init(_s2t_cfg(), t=80, b=2, seed=5)
    utts = _make_utts(3, [41, 42, 43], [64, 48, 56])

    rec = StreamingAttentionRecognizer(
        model, params, batch=1, beam_width=2, max_len=8, mem_bucket=8,
        eos_id=NO_EOS)
    want = []
    for feats in utts:
        rec.reset()
        rc = rec.session.raw_chunk
        x = feats[None]
        n_full = x.shape[1] // rc
        for s in range(n_full):
            rec.feed(x[:, s * rc:(s + 1) * rc])
        want.append(rec.finish(x[:, n_full * rc:])[0])

    ms = MultiStreamAttention(
        model, params, n_streams=2, beam_width=2, max_len=8, mem_bucket=8,
        eos_id=NO_EOS)
    got = [ms.run_stream(u, lambda _t: None) for u in utts]
    assert got == want
