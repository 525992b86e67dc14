"""Serving CLI: dynamic batching, bucket padding, stream + TCP front-ends."""

import os
import socket
import threading

import numpy as np
import pytest
import yaml

from tests.test_e2e import FEAT_DIM, make_config, make_corpus


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    """A 2-epoch checkpoint on the synthetic (kaldi-feature) corpus plus a
    wav.scp of synthetic waveforms for the serving front-end (transcripts
    are garbage at this depth — serving mechanics, not CER, are under
    test). num_mel_bins matches the model input so served wavs extract to
    compatible features."""
    import scipy.io.wavfile as siw

    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path_factory.mktemp("serve"))
    make_corpus(root, n_utts=24)
    conf = make_config(root)
    cfg = yaml.safe_load(open(conf))
    cfg["train"]["epochs"] = 2
    cfg["data"]["num_mel_bins"] = cfg["model"]["frontend"]["input_size"]
    yaml.safe_dump(cfg, open(conf, "w"))
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir,
                     "--log_interval", "100"]) == 0

    rng = np.random.default_rng(7)
    scp = []
    for i in range(6):
        p = os.path.join(root, f"req{i}.wav")
        siw.write(p, 16000, (rng.normal(size=8000) * 3000).astype(np.int16))
        scp.append(f"req{i} {p}")
    with open(os.path.join(root, "req.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    return root, expdir


def _scp_lines(root, n=6):
    lines = open(os.path.join(root, "req.scp")).read().splitlines()[:n]
    assert len(lines) == n
    return lines


def test_serve_stream_mode(trained_exp, tmp_path):
    """File-in/file-out serving: every request answered once, batches padded
    to fixed shapes (single bucket → recognize compiles once)."""
    from opentransformer_tpu.cli.serve import main as serve_main

    root, expdir = trained_exp
    reqs = tmp_path / "req.scp"
    reqs.write_text("\n".join(_scp_lines(root)) + "\n")
    out = tmp_path / "out.tsv"

    assert serve_main([
        "-m", expdir, "-i", str(reqs), "-o", str(out),
        "--max-batch", "4", "--batch-timeout-ms", "15",
        "--bucket-frames", "600", "-bw", "2", "-ml", "12",
    ]) == 0

    lines = out.read_text().splitlines()
    ids = sorted(l.split("\t")[0] for l in lines)
    expect = sorted(l.split()[0] for l in _scp_lines(root))
    assert ids == expect  # every request answered exactly once


def test_serve_batcher_stats_and_padding(trained_exp):
    """Direct batcher check: 5 requests over max_batch=4 run as 2 batches;
    latency stats populate; over-bucket inputs truncate instead of crash."""
    import argparse

    from opentransformer_tpu.cli.serve import DynamicBatcher, _Request, _build

    root, expdir = trained_exp
    ns = argparse.Namespace(
        load_model=expdir, config=None, load_language_model=None,
        beam_width=2, nbest=1, penalty=0.6, lamda=5.0, max_len=12,
        lm_weight=0.1, bucket_frames="64", max_batch=4,
        batch_timeout_ms=10.0, piece2word=False,
    )
    batcher, _ = _build(ns)
    batcher.start()

    results = {}
    done = threading.Semaphore(0)

    def reply(utt_id, text):
        results[utt_id] = text
        done.release()

    rng = np.random.default_rng(0)
    for i in range(5):
        t = 100 if i == 0 else 50  # request 0 exceeds the 64-frame bucket
        batcher.submit(_Request(f"u{i}", rng.normal(size=(t, FEAT_DIM)).astype(np.float32), reply))
    for _ in range(5):
        assert done.acquire(timeout=120)
    batcher.drain_and_stop()

    assert set(results) == {f"u{i}" for i in range(5)}
    stats = batcher.stats()
    assert stats["requests"] == 5
    assert stats["latency_ms_p50"] > 0 and stats["audio_seconds"] > 0


def test_serve_tcp_mode(trained_exp, tmp_path):
    """TCP front-end: a client connection sends wav.scp lines and gets every
    answer back before the connection closes."""
    from opentransformer_tpu.cli.serve import main as serve_main

    root, expdir = trained_exp
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]

    t = threading.Thread(
        target=serve_main,
        args=([
            "-m", expdir, "--port", str(port), "--max-batch", "4",
            "--batch-timeout-ms", "15", "--bucket-frames", "600",
            "-bw", "2", "-ml", "12",
        ],),
        daemon=True,
    )
    t.start()

    lines = _scp_lines(root, n=4)
    deadline = 120
    import time
    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            conn = socket.create_connection(("127.0.0.1", port), timeout=2)
            break
        except OSError:
            time.sleep(0.5)
    else:
        pytest.fail("server never came up")

    with conn:
        conn.sendall(("\n".join(lines) + "\n").encode())
        conn.shutdown(socket.SHUT_WR)
        conn.settimeout(deadline)
        buf = b""
        while buf.count(b"\n") < len(lines):
            chunk = conn.recv(4096)
            if not chunk:
                break
            buf += chunk
    got = sorted(l.split("\t")[0] for l in buf.decode().splitlines())
    assert got == sorted(l.split()[0] for l in lines)


@pytest.fixture(scope="module")
def streaming_exp(tmp_path_factory):
    """A briefly-trained chunked-attention CTC checkpoint + request wavs
    (streaming-serving mechanics are under test, not CER)."""
    import scipy.io.wavfile as siw

    from opentransformer_tpu.cli.run import main as run_main
    from tests.test_ctc_e2e import make_ctc_corpus
    from tests.test_e2e import N_UNITS

    root = str(tmp_path_factory.mktemp("serve_stream"))
    make_ctc_corpus(root, n_utts=24)
    cfg = {
        "data": {
            "dataset_type": "kaldi",
            "vocab": os.path.join(root, "vocab"),
            "batch_size": 8,
            "num_mel_bins": FEAT_DIM,
            "train": {"feat": [os.path.join(root, "feats.scp")],
                      "text": [os.path.join(root, "text")]},
            "test": {"feat": [os.path.join(root, "feats.scp")],
                     "text": [os.path.join(root, "text")]},
        },
        "model": {
            "type": "ctc",
            "frontend_type": "conv",
            "frontend": {"input_size": FEAT_DIM, "output_size": 32,
                         "mid_channel": 8, "out_channel": 16,
                         "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
            "encoder_type": "transformer",
            # chunked attention makes the model frame-synchronously servable
            "encoder": {"d_model": 32, "n_heads": 2, "d_ff": 64, "n_blocks": 2,
                        "residual_dropout": 0.0, "chunk_size": 4,
                        "left_chunks": 2},
            "vocab_size": 3 + N_UNITS,
            "lookahead_steps": 0,
        },
        "train": {"optimizer_type": "adam", "optimizer": {"lr": 3e-3},
                  "scheduler_type": "constant", "scheduler": {"lr": 3e-3},
                  "clip_grad": 5, "epochs": 2, "save_name": "ctc"},
    }
    conf = os.path.join(root, "conf.yaml")
    yaml.safe_dump(cfg, open(conf, "w"))
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir,
                     "--log_interval", "100"]) == 0

    rng = np.random.default_rng(11)
    scp = []
    for i in range(3):
        p = os.path.join(root, f"req{i}.wav")
        siw.write(p, 16000, (rng.normal(size=12000) * 3000).astype(np.int16))
        scp.append(f"req{i} {p}")
    reqs = os.path.join(root, "req.scp")
    with open(reqs, "w") as f:
        f.write("\n".join(scp) + "\n")
    return reqs, expdir


def test_serve_streaming_mode(streaming_exp, tmp_path):
    """--streaming: every utterance gets exactly one FINAL line (partials
    optional — they appear only when the hypothesis changes mid-stream)."""
    from opentransformer_tpu.cli.serve import main as serve_main

    reqs, expdir = streaming_exp
    out = tmp_path / "out.tsv"
    assert serve_main([
        "-m", expdir, "-i", reqs, "-o", str(out), "--streaming",
        "--streams", "1",
    ]) == 0
    lines = [l.split("\t") for l in out.read_text().splitlines()]
    finals = [l for l in lines if l[1] == "FINAL"]
    assert sorted(l[0] for l in finals) == ["req0", "req1", "req2"]
    for l in lines:
        assert l[1] in ("PARTIAL", "FINAL")
    # partials for an utterance precede its FINAL
    order = [(l[0], l[1]) for l in lines]
    for utt in ("req0", "req1", "req2"):
        evts = [k for u, k in order if u == utt]
        assert evts[-1] == "FINAL" and all(e == "PARTIAL" for e in evts[:-1])


def test_serve_streaming_tcp(streaming_exp):
    """TCP streaming session: a client sends wav lines, receives PARTIAL*
    then FINAL per utterance on the same connection."""
    import time

    from opentransformer_tpu.cli.serve import main as serve_main

    reqs, expdir = streaming_exp
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    t = threading.Thread(
        target=serve_main,
        args=(["-m", expdir, "--port", str(port), "--streaming",
               "--streams", "2"],),
        daemon=True,
    )
    t.start()
    lines = open(reqs).read().splitlines()[:2]
    t0 = time.time()
    while time.time() - t0 < 120:
        try:
            conn = socket.create_connection(("127.0.0.1", port), timeout=2)
            break
        except OSError:
            time.sleep(0.5)
    else:
        pytest.fail("server never came up")
    with conn:
        conn.sendall(("\n".join(lines) + "\n").encode())
        conn.shutdown(socket.SHUT_WR)
        conn.settimeout(120)
        buf = b""
        while buf.count(b"FINAL") < 2:
            chunk = conn.recv(4096)
            if not chunk:
                break
            buf += chunk
    finals = [l for l in buf.decode().splitlines() if "\tFINAL\t" in l]
    assert sorted(l.split("\t")[0] for l in finals) == ["req0", "req1"]


def test_serve_streaming_pcm_concurrent(streaming_exp, tmp_path):
    """Binary PCM transport + batched multi-stream serving: 4 CONCURRENT
    TCP streams speaking the length-prefixed int16 protocol transcribe
    identically to the same audio served sequentially via wav lines (which
    also proves incremental fbank == file fbank). The CTC front advances
    all 4 in one fused step per tick (dispatch-count parity is asserted
    directly in tests/test_multistream.py)."""
    import struct
    import time

    import scipy.io.wavfile as siw

    from opentransformer_tpu.cli.serve import main as serve_main

    _, expdir = streaming_exp
    rng = np.random.default_rng(77)
    wavs = {}
    for i in range(4):
        n = int(rng.integers(9000, 15000))
        wavs[f"pcm{i}"] = (rng.normal(size=n) * 3000).astype(np.int16)

    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    t = threading.Thread(
        target=serve_main,
        args=(["-m", expdir, "--port", str(port), "--streaming",
               "--streams", "4"],),
        daemon=True,
    )
    t.start()
    t0 = time.time()
    while time.time() - t0 < 120:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=2).close()
            break
        except OSError:
            time.sleep(0.5)
    else:
        pytest.fail("server never came up")

    # sequential reference: one wav-line connection per utterance
    expected = {}
    for utt, pcm in wavs.items():
        path = str(tmp_path / f"{utt}.wav")
        siw.write(path, 16000, pcm)
        with socket.create_connection(("127.0.0.1", port), timeout=60) as c:
            c.sendall(f"{utt} {path}\n".encode())
            c.shutdown(socket.SHUT_WR)
            c.settimeout(120)
            buf = b""
            while b"FINAL" not in buf:
                chunk = c.recv(4096)
                if not chunk:
                    break
                buf += chunk
        final = [l for l in buf.decode().splitlines() if "\tFINAL\t" in l][0]
        expected[utt] = final.split("\t", 2)[2]

    # concurrent PCM: 4 streams at once, odd-size audio pieces
    results = {}
    saw_partial = {}

    def stream(utt, pcm):
        with socket.create_connection(("127.0.0.1", port), timeout=60) as c:
            c.settimeout(120)
            c.sendall(f"PCM {utt} 16000\n".encode())
            raw = pcm.tobytes()
            pos, sizes = 0, [1111, 3333, 777, 10 ** 9]
            for sz in sizes:
                piece = raw[pos : pos + sz * 2]
                if not piece:
                    break
                c.sendall(struct.pack("<I", len(piece)) + piece)
                pos += len(piece)
                time.sleep(0.01)  # interleave with the other streams
            c.sendall(struct.pack("<I", 0))
            buf = b""
            while b"FINAL" not in buf:
                chunk = c.recv(4096)
                if not chunk:
                    break
                buf += chunk
        lines = [l.split("\t") for l in buf.decode().splitlines()]
        saw_partial[utt] = any(l[1] == "PARTIAL" for l in lines)
        results[utt] = [l[2] for l in lines if l[1] == "FINAL"][0]

    threads = [threading.Thread(target=stream, args=(u, p))
               for u, p in wavs.items()]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
    assert results == expected
    # partials only appear when a hypothesis grows mid-stream (the briefly-
    # trained model may emit none); growth-driven partial emission with real
    # tokens is asserted in tests/test_multistream.py
    for utt, text in results.items():
        if len(text.split()) > 1:
            assert saw_partial[utt], utt


def test_eval_multichip_decode_matches_single(trained_exp, tmp_path):
    """eval.py -n 2: batch rows shard over a 2-device 'data' mesh; the SPMD
    beam search must produce the same transcripts as single-device decode."""
    from opentransformer_tpu.cli.eval import main as eval_main

    _, expdir = trained_exp
    assert eval_main(["-m", expdir, "-bw", "2", "-ml", "12", "-d", "test",
                      "-s", "one"]) == 0
    assert eval_main(["-m", expdir, "-bw", "2", "-ml", "12", "-d", "test",
                      "-n", "2", "-s", "two"]) == 0
    outs = {}
    for d in os.listdir(expdir):
        if "_one_" in d or d.endswith("_one"):
            outs["one"] = open(os.path.join(expdir, d, "predict.txt")).read()
        if "_two_" in d or d.endswith("_two"):
            outs["two"] = open(os.path.join(expdir, d, "predict.txt")).read()
    assert set(outs) == {"one", "two"}, os.listdir(expdir)
    assert outs["one"] == outs["two"]


def test_eval_long_form_non_s2t_falls_back(streaming_exp):
    """--long_form on a ctc model must fall back to offline decode (it
    previously crashed with NameError after the 'ignored' warning)."""
    from opentransformer_tpu.cli.eval import main as eval_main

    _, expdir = streaming_exp
    assert eval_main(["-m", expdir, "--long_form", "-d", "test",
                      "-s", "lffb"]) == 0


def test_serve_warmup_and_lm_fusion(trained_exp, tmp_path):
    """--warmup precompiles the bucket shapes, and -lm routes shallow fusion
    through the batched recognizer (same loader path as eval.py)."""
    import yaml as _yaml

    from opentransformer_tpu.cli.run import main as run_main
    from opentransformer_tpu.cli.serve import main as serve_main

    root, expdir = trained_exp
    conf = os.path.join(root, "conf_speech2text.yaml")  # written by make_config
    cfg = _yaml.safe_load(open(conf))
    lm_cfg = {
        "data": {
            "dataset_type": "text", "batch_size": 8,
            "src_vocab": cfg["data"]["vocab"], "tgt_vocab": cfg["data"]["vocab"],
            "train": {"src": cfg["data"]["train"]["text"],
                      "tgt": cfg["data"]["train"]["text"]},
        },
        "model": {"type": "transformer_lm",
                  "vocab_size": cfg["model"]["decoder"]["vocab_size"],
                  "num_blocks": 1, "d_model": 16, "n_heads": 2, "d_ff": 32},
        "train": {"optimizer_type": "adam", "optimizer": {},
                  "scheduler_type": "constant", "scheduler": {"lr": 1e-3},
                  "epochs": 1, "save_name": "lm"},
    }
    lm_conf = os.path.join(root, "lm.yaml")
    _yaml.safe_dump(lm_cfg, open(lm_conf, "w"))
    lm_expdir = os.path.join(root, "lm_exp")
    assert run_main(["-c", lm_conf, "-n", "1", "--expdir", lm_expdir,
                     "--log_interval", "100"]) == 0

    out = tmp_path / "out.tsv"
    reqs = os.path.join(root, "req.scp")
    assert serve_main([
        "-m", expdir, "-i", reqs, "-o", str(out), "--warmup",
        "--max-batch", "2", "--bucket-frames", "600",
        "-bw", "2", "-ml", "12", "-lm", lm_expdir, "-lmw", "0.2",
    ]) == 0
    assert len(out.read_text().splitlines()) == 6


def test_streaming_fbank_causal_cmvn():
    """Per-utterance-CMVN configs stream with causal running CMVN: frame t
    is normalized by the scalar mean/std of all unnormalized frames <= t,
    regardless of chunking, and the stream converges toward the offline
    normalize_per_utterance stats as the utterance grows."""
    from opentransformer_tpu.cli.serve import FeatureExtractor, StreamingFbank

    rng = np.random.default_rng(5)
    pcm = (rng.normal(size=48000) * 3000.0).astype(np.float32)  # 3 s @ 16 kHz

    ex_norm = FeatureExtractor({"normalization": True, "num_mel_bins": 8})
    ex_raw = FeatureExtractor({"normalization": False, "num_mel_bins": 8})

    def run(ex, chunks):
        sf = StreamingFbank(ex, 16000)
        outs = [sf.feed(c) for c in chunks] + [sf.finish()]
        return np.concatenate([o for o in outs if o.shape[0]], axis=0)

    # odd-size chunking must not change the result (stats are per-frame)
    chunks_a = [pcm[:7000], pcm[7000:19000], pcm[19000:]]
    chunks_b = [pcm[i:i + 4096] for i in range(0, len(pcm), 4096)]
    norm_a = run(ex_norm, chunks_a)
    norm_b = run(ex_norm, chunks_b)
    np.testing.assert_allclose(norm_a, norm_b, rtol=1e-5, atol=1e-5)

    # exact causal contract vs the raw features
    raw = run(ex_raw, chunks_a)
    assert raw.shape == norm_a.shape
    n_el = np.arange(1, raw.shape[0] + 1) * raw.shape[1]
    csum = np.cumsum(raw.sum(axis=1, dtype=np.float64))
    csq = np.cumsum((raw.astype(np.float64) ** 2).sum(axis=1))
    mean = csum / n_el
    std = np.maximum(np.sqrt(np.maximum(csq / n_el - mean**2, 0.0)), 1e-10)
    expect = (raw - mean[:, None]) / std[:, None]
    np.testing.assert_allclose(norm_a, expect.astype(np.float32), rtol=1e-4, atol=1e-4)

    # converges to per-utterance CMVN: the last frame matches the offline
    # normalization of the full utterance to first order
    from opentransformer_tpu.ops.fbank import normalize_per_utterance
    offline = normalize_per_utterance(raw)
    np.testing.assert_allclose(norm_a[-1], offline[-1], rtol=0.05, atol=0.05)
