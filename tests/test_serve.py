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
