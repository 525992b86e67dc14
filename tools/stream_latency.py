#!/usr/bin/env python
"""Multi-stream serving latency on the real chip (VERDICT r2 item 6).

Drives the batched multi-stream CTC server (recognize/multistream.py — the
`serve.py --streaming` engine) with N concurrent streams at the flagship
encoder geometry and reports per-tick latency percentiles, per-stream RTF,
and aggregate real-time capacity.

Two drive modes:

  * saturated (default): every stream's audio is buffered up front; ticks
    fire back-to-back. Measures the server's capacity — each tick advances
    every stream one chunk in ONE fused dispatch.
  * paced (--paced): frames arrive at real time (chunk duration per chunk);
    a tick fires as soon as any stream has a full chunk. Measures the
    latency a live client sees per PARTIAL under real arrival patterns.

Caveat for numbers from this image: the chip is reached through a tunnel
whose per-dispatch latency is 0.3-2 s and variable (CLAUDE.md); each tick is
one dispatch, so tick latency here is dominated by the tunnel, not compute.
On a locally attached TPU the dispatch overhead is ~ms. Both the measured
wall numbers and the dispatch-dominated caveat are reported.

    python tools/stream_latency.py [-n 16] [--seconds 10] [--paced]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# flagship-scale streaming CTC: d256 / 12L chunked encoder, vocab 4233
# (the offline flagship geometry of __graft_entry__.py with chunk attention)
FRONTEND = {
    "input_size": 40, "output_size": 256, "in_channel": 1, "mid_channel": 64,
    "out_channel": 128, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2],
    "dropout": 0.0, "act_func_type": "relu",
}
ENCODER = {
    "d_model": 256, "n_heads": 4, "d_ff": 2048, "n_blocks": 12,
    "residual_dropout": 0.0, "normalize_before": False, "activation": "glu",
    "relative_positional": False, "chunk_size": 16, "left_chunks": 4,
}


def build_server(n_streams: int):
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.recognize.multistream import MultiStreamCTC

    cfg = {"type": "ctc", "frontend_type": "conv", "frontend": FRONTEND,
           "encoder_type": "transformer", "encoder": ENCODER,
           "vocab_size": 4233, "lookahead_steps": 0}
    model = build_model(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 96, 40)), jnp.float32)
    mask = jnp.ones((2, 96), bool)
    tgt = jnp.ones((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt,
                        jnp.asarray([4, 4], jnp.int32))
    return MultiStreamCTC(model, params, n_streams=n_streams)


def percentiles(xs, ps=(50, 90, 99)):
    xs = np.asarray(xs, np.float64) * 1000.0  # ms
    return {f"p{p}": round(float(np.percentile(xs, p)), 1) for p in ps}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--streams", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio seconds per stream (10 ms frames)")
    ap.add_argument("--paced", action="store_true",
                    help="real-time arrival instead of saturated drive")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    print(f"device: {dev}")

    n = args.streams
    t_frames = int(args.seconds * 100)
    ms = build_server(n)
    raw_chunk = ms.raw_chunk  # feature frames consumed per tick per stream
    chunk_audio_s = raw_chunk * 0.01
    rng = np.random.default_rng(1)
    utts = [rng.normal(size=(t_frames, 40)).astype(np.float32) * 2.0
            for _ in range(n)]

    # warmup: compile the fused tick step (full-slot and, for the flush
    # tail, partially-advancing ticks reuse the same [N,...] shapes)
    slot = ms.open_stream("warm", lambda _t: None, lambda _t: None)
    ms.push(slot, utts[0][: ms.window + raw_chunk])
    ms.close(slot)
    while ms.ready():
        ms.tick()

    finals = {}
    partial_lat: list[float] = []  # paced: chunk-ready -> partial wall time
    slots = []
    for i in range(n):
        slots.append(ms.open_stream(
            f"s{i}", lambda _t: None,
            lambda text, _i=i: finals.__setitem__(_i, text)))

    tick_times: list[float] = []
    t_start = time.perf_counter()
    if args.paced:
        cursors = [0] * n
        next_due = t_start
        while len(finals) < n:
            now = time.perf_counter()
            if now >= next_due:
                # one chunk of audio "arrives" on every open stream
                for i in range(n):
                    if cursors[i] < t_frames:
                        nfr = min(raw_chunk, t_frames - cursors[i])
                        ms.push(slots[i], utts[i][cursors[i]: cursors[i] + nfr])
                        cursors[i] += nfr
                        if cursors[i] >= t_frames:
                            ms.close(slots[i])
                next_due += chunk_audio_s
            if ms.ready():
                t0 = time.perf_counter()
                ms.tick()
                dt = time.perf_counter() - t0
                tick_times.append(dt)
                partial_lat.append(dt)
            else:
                time.sleep(0.001)
    else:
        for i in range(n):
            ms.push(slots[i], utts[i])
            ms.close(slots[i])
        while len(finals) < n:
            if ms.ready():
                t0 = time.perf_counter()
                ms.tick()
                tick_times.append(time.perf_counter() - t0)
            else:
                time.sleep(0.001)
    wall = time.perf_counter() - t_start

    audio_total = n * args.seconds
    mode = "paced" if args.paced else "saturated"
    print(f"mode={mode} streams={n} audio={args.seconds:.0f}s/stream "
          f"chunk={raw_chunk} frames ({chunk_audio_s * 1000:.0f} ms) "
          f"encoder=d{ENCODER['d_model']}x{ENCODER['n_blocks']}L "
          f"chunk_size={ENCODER['chunk_size']} left={ENCODER['left_chunks']}")
    print(f"ticks={ms.ticks} chunks_advanced={ms.chunks_advanced} "
          f"(fused batching x{ms.chunks_advanced / max(ms.ticks, 1):.1f})")
    print(f"per-tick latency ms: {percentiles(tick_times)} "
          "(1 dispatch/tick; on this image the tunnel adds 0.3-2 s/dispatch)")
    print(f"wall={wall:.2f}s for {audio_total:.0f}s audio -> per-stream RTF="
          f"{wall / args.seconds / n:.4f} (aggregate {audio_total / wall:.1f}x "
          f"real-time across {n} streams)")
    sustainable = n * chunk_audio_s / float(np.percentile(tick_times, 50))
    print(f"sustainable load at p50 tick: ~{sustainable:.1f} concurrent "
          "real-time streams per chip")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
