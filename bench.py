#!/usr/bin/env python
"""Benchmark: batch beam-search decoding throughput on one TPU chip.

North-star (BASELINE.md): decoded utts/sec/chip + RTFx at CER parity on
AISHELL-1; throughput goal >=20x real-time per v5e chip. This bench measures
the full decode path (conv frontend -> 12L encoder -> KV-cached 6L decoder
beam search, beam=5, AISHELL flagship geometry d=256 / vocab 4233, bf16
compute) on synthetic 5-second utterances, with EOS disabled so every decode
runs the full max_len steps — a worst-case (no early exit) measurement.

Prints ONE JSON line:
  {"metric": ..., "value": RTFx, "unit": "x_realtime", "vs_baseline": RTFx/20}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 512
FRAMES = 500  # 10ms frames -> 5.0 s of audio per utterance
MAX_LEN = 24  # decode steps forced (no early exit); AISHELL avg ~15 chars
BEAM = 5
ITERS = 8


def main() -> None:
    import os

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import FLAGSHIP_MODEL_CFG
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.ops.masks import length_to_mask
    from opentransformer_tpu.recognize.beam import beam_search

    model = build_model(FLAGSHIP_MODEL_CFG, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(BATCH, FRAMES, 40)), jnp.float32)
    mask = length_to_mask(jnp.asarray([FRAMES] * BATCH), FRAMES)
    tgt = jnp.ones((BATCH, 8), jnp.int32)
    tlen = jnp.asarray([6] * BATCH, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt, tlen)

    def build_decode(fused: bool):
        def decode_one(params, feats, mask):
            memory, memory_mask = model.apply(params, feats, mask, method="encode")

            def decode_step(tokens, cache, index, mem_mask, src=None):
                return model.apply(params, tokens, cache, index, mem_mask, src,
                                   method="decode_step")

            def init_cache(mem, n, beam=1):
                return model.apply(params, mem, n, beam, method="init_cache")

            def decode_topk(tokens, cache, index, mem_mask, src, k):
                # fused projection→log-softmax→top-k (Pallas on TPU): the
                # [B·K, V] log-prob tensor never hits HBM (ops/project_topk.py)
                return model.apply(params, tokens, cache, index, mem_mask,
                                   src, k, method="decode_step_topk")

            hyp = beam_search(
                decode_step, init_cache, memory, memory_mask,
                beam_width=BEAM, max_len=MAX_LEN, penalty=0.6,
                eos_id=-1,  # force full-length decodes (worst case)
                decode_topk=decode_topk if fused else None,
            )
            # reduce to a scalar so timing can fetch 8 bytes: through the
            # remote relay block_until_ready is unreliable and full-token
            # fetches are bandwidth-bound (~0.7 MB/s) — neither measures
            # decode compute
            return jnp.sum(hyp.tokens)

        @jax.jit
        def decode_stack(params, keys, mask):
            # all ITERS batches decode inside ONE program (lax.scan): the
            # tunnel's per-dispatch latency (0.3-2 s, varies run to run —
            # CLAUDE.md) amortizes over the whole stack, so the measurement
            # is device decode throughput, mirroring the train bench's
            # steps_per_exec approach. Inputs are generated on-device from
            # per-batch PRNG keys (distinct per batch so nothing dedupes;
            # ~82M normals across the stack, negligible next to the decode)
            # rather than shipped over the ~96 MB/s tunnel (1.2 GB f32).
            def step(c, key):
                f = jax.random.normal(key, (BATCH, FRAMES, 40), jnp.float32)
                return c, decode_one(params, f, mask)

            _, sums = jax.lax.scan(step, 0, keys)
            return jnp.sum(sums)

        return decode_stack

    warm_keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
    timed_keys = jax.random.split(jax.random.PRNGKey(2), ITERS)
    decode = build_decode(True)
    fused_note = "fused-topk"
    try:
        float(decode(params, warm_keys, mask))  # warmup / compile
    except Exception as e:  # Pallas regression must not take the bench down
        import sys

        print(f"fused decode path failed ({type(e).__name__}: {e}); "
              "falling back to unfused", file=sys.stderr)
        decode = build_decode(False)
        fused_note = "unfused-topk-fallback"
        float(decode(params, warm_keys, mask))

    t0 = time.perf_counter()
    float(decode(params, timed_keys, mask))
    elapsed = time.perf_counter() - t0

    utts = BATCH * ITERS
    audio_seconds = utts * FRAMES * 0.01
    rtfx = audio_seconds / elapsed
    utts_per_sec = utts / elapsed

    out = {
        "metric": "aishell_flagship_beam5_decode_rtfx_per_chip",
        "value": round(rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 20.0, 3),
        "utts_per_sec_per_chip": round(utts_per_sec, 2),
        "config": f"B{BATCH} T{FRAMES} beam{BEAM} steps{MAX_LEN} bf16 "
                  f"no-early-exit x{ITERS}-batch-scan {fused_note}",
        "device": str(jax.devices()[0]),
    }
    try:
        out.update(train_throughput(model))
    except Exception as e:  # decode RTFx stays the headline metric
        out["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


def train_throughput(model, b=16, t=512, u=32, iters=20):
    """Secondary metric: full training-step throughput (fwd+bwd+clip+adam)
    on the flagship geometry — the surface the reference's Trainer spends
    its life in (otrans/train/trainer.py hot loop). Uses the Trainer's
    multi-step path (steps_per_exec): all `iters` updates run as ONE
    lax.scan program, so the measurement is device throughput, not tunnel
    dispatch latency. Params are freshly initialized."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.train.trainer import Trainer

    from __graft_entry__ import TRAIN_CFG

    trainer = Trainer({**TRAIN_CFG, "steps_per_exec": iters}, model,
                      log_interval=10 ** 9)
    rng = np.random.default_rng(2)
    tgt = np.ones((b, u + 2), np.int32)
    tgt[:, 1:-1] = rng.integers(3, 4000, (b, u))
    mk = jnp.ones((b, t), bool)
    batch = (None, {"inputs": jnp.asarray(rng.normal(size=(b, t, 40)), jnp.float32),
                    "mask": mk},
             {"targets": jnp.asarray(tgt), "targets_length": jnp.asarray([u + 1] * b)})
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer._grad_fn = trainer._build_grad_fn()
    trainer._update_fn = trainer._build_update_fn()
    multi = trainer._build_multi_fn()
    args0 = trainer.batch_fn(batch)

    def stacked_args(seed):
        # distinct feats per step and per call (identical dispatches dedup
        # on the tunnel; see module docstring); leaves are [N, A=1, B, ...]
        # (the multi-step program scans accumulation windows per update)
        r = np.random.default_rng(seed)
        feats = jnp.asarray(r.normal(size=(iters, 1, b, t, 40)), jnp.float32)
        rest = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (iters, 1) + a.shape), args0[1:]
        )
        return (feats,) + rest

    lrs = jnp.full((iters,), 1e-4, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    warm = stacked_args(3)
    timed = stacked_args(4)
    float(timed[0][0, 0, 0, 0, 0])  # force the timed batch resident on device

    v, opt, ns = state.params, state.opt_state, state.nan_skips
    v, opt, ns, losses, _, _ = multi(v, opt, ns, warm, lrs, keys)  # compile
    float(losses[-1, -1])
    keys2 = jax.random.split(jax.random.PRNGKey(5), iters)
    t0 = time.perf_counter()
    v, opt, ns, losses, _, gnorms = multi(v, opt, ns, timed, lrs, keys2)
    # 8-byte fetch: program outputs materialize when the whole scan finishes
    float(losses[-1, -1])
    dt = time.perf_counter() - t0
    frames_per_sec = iters * b * t / dt
    return {
        "train_updates_per_sec_per_chip": round(iters / dt, 3),
        "train_audio_sec_per_sec_per_chip": round(frames_per_sec * 0.01, 1),
        "train_config": f"B{b} T{t} U{u} x{iters}-step-scan fwd+bwd+clip+adam bf16",
    }


if __name__ == "__main__":
    main()
