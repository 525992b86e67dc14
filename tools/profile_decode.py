#!/usr/bin/env python
"""Decode-path cost decomposition on the real chip.

Times the flagship beam-5 decode (bench.py geometry) in pieces so kernel
work targets the real bottleneck instead of the theoretical one:

  encode        — frontend + 12L encoder on [B, T, 40]
  search N      — beam search ONLY, on a precomputed memory, max_len=N
                  (slope between two N values = ms per decode step, with the
                  loop-setup constant removed)
  surgery runs  — same search with one component shrunk (d_ff, vocab,
                  n_blocks) — the delta attributes per-step cost to that
                  component

Timing through the tunnel follows CLAUDE.md: scalar-reduce inside jit,
distinct inputs per iteration, one 8-byte fetch per measurement.

Usage: python tools/profile_decode.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 512
FRAMES = 500
BEAM = 5
ITERS = 3


def build(cfg_overrides=None):
    from __graft_entry__ import FLAGSHIP_MODEL_CFG
    from opentransformer_tpu.models.registry import build_model

    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in FLAGSHIP_MODEL_CFG.items()}
    for path, val in (cfg_overrides or {}).items():
        sect, key = path.split(".")
        cfg[sect][key] = val
    model = build_model(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(BATCH, FRAMES, 40)), jnp.float32)
    from opentransformer_tpu.ops.masks import length_to_mask

    mask = length_to_mask(jnp.asarray([FRAMES] * BATCH), FRAMES)
    tgt = jnp.ones((BATCH, 8), jnp.int32)
    tlen = jnp.asarray([6] * BATCH, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt, tlen)
    return model, params, feats, mask


def timed(fn, make_inputs, iters=ITERS):
    """Median-free simple timing: warmup once, then time `iters` distinct
    dispatches and return seconds per call."""
    float(fn(*make_inputs(0)))
    args = [make_inputs(i + 1) for i in range(iters)]
    t0 = time.perf_counter()
    for a in args:
        float(fn(*a))
    return (time.perf_counter() - t0) / iters


def micro():
    """Time each decode-step op at real shapes inside a 24-iteration scan
    (one dispatch, chained data dependencies — pure device time)."""
    STEPS = 24
    b, k, h, dh, d, t, u, v, dff = 512, BEAM, 4, 64, 256, FRAMES // 4, 25, 4233, 2048
    n = b * k
    bf = jnp.bfloat16
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=bf):
        return jnp.asarray(rng.normal(size=shape) * 0.05, dtype)

    def scan_op(name, f, x0, *consts):
        @jax.jit
        def run(x0, *consts):
            def body(c, _):
                return f(c, *consts), ()
            y, _ = jax.lax.scan(body, x0, None, length=STEPS)
            return jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32))

        float(run(x0, *consts))
        xs = [jax.tree_util.tree_map(lambda a: a + jnp.asarray(i * 1e-6, a.dtype), x0)
              for i in range(ITERS)]
        t0 = time.perf_counter()
        for xi in xs:
            float(run(xi, *consts))
        dt = (time.perf_counter() - t0) / ITERS / STEPS
        print(f"micro {name:28s}: {dt * 1e6:9.1f} us/step", flush=True)
        return dt

    x = arr(n, d)
    # per-layer matmuls (6x per step)
    wqkv = arr(d, 3 * d)
    scan_op("qkv_matmul x6", lambda c, w: (c @ w)[:, :d] * 0.999, x, wqkv)
    wff1, wff2 = arr(d, 2 * dff), arr(dff, d)
    scan_op("ffn_glu x6", lambda c, w1, w2: (
        (lambda y: (y[:, :dff] * jax.nn.sigmoid(y[:, dff:])) @ w2)(c @ w1)) * 0.999,
        x, wff1, wff2)
    wv = arr(d, v)

    def vocab_op(c, w):
        logits = (c @ w).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, -1)
        vals, idx = jax.lax.top_k(lp, k)
        return c * 0.999 + jnp.mean(vals).astype(c.dtype)

    scan_op("vocab+logsoftmax+topk x1", vocab_op, x, wv)

    # layernorm (3x per layer = 18x per step)
    gamma, beta = arr(d, dtype=jnp.float32), arr(d, dtype=jnp.float32)

    def ln(c, g, bta):
        xf = c.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + bta).astype(c.dtype) * 0.999

    scan_op("layernorm x18", ln, x, gamma, beta)

    # cross attention math (attend_beamed shapes), 6x per step
    ck, cv = arr(b, h, t, dh), arr(b, h, t, dh)

    def cross(c, ck, cv):
        q = c.reshape(b, k, h, 1, dh)
        s = jnp.einsum("bkhqd,bhtd->bkhqt", q, ck, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s / 8.0, -1).astype(bf)
        ctx = jnp.einsum("bkhqt,bhtd->bkhqd", w, cv, preferred_element_type=jnp.float32)
        return ctx.astype(bf).reshape(n, d) * 0.999

    scan_op("cross_attn_math x6", cross, arr(n, d), ck, cv)

    # ancestral self attention math, 6x per step
    sk, sv = arr(n, h, u, dh), arr(n, h, u, dh)
    oh = jax.nn.one_hot(np.tile(np.arange(k), (b, u, 1)).transpose(0, 2, 1) % k, k,
                        dtype=jnp.float32)  # [b,k,u,k]

    def ancestral(c, sk, sv, oh):
        from opentransformer_tpu.models.modules import ancestral_decode_context
        q = c.reshape(n, h, 1, dh)
        valid = jnp.arange(u) <= u  # all valid
        ctx = ancestral_decode_context(q, sk, sv, valid, oh, bf)
        return ctx.reshape(n, d) * 0.999

    scan_op("ancestral_self_attn x6", ancestral, arr(n, d), sk, sv, oh)

    # cache append (dynamic_update_slice) 6x per step (k and v)
    def cache_write(carry, _unused):
        cache, step = carry
        kt = cache[:, :, :1] * 0.999
        cache = jax.lax.dynamic_update_slice_in_dim(cache, kt, step % u, axis=2)
        return (cache, step + 1)

    @jax.jit
    def run_cache(cache):
        def body(c, _):
            return cache_write(c, None), ()
        (y, _), _ = jax.lax.scan(body, (cache, jnp.asarray(0, jnp.int32)), None, length=STEPS)
        return jnp.sum(y[:, 0, 0].astype(jnp.float32))

    float(run_cache(sk))
    t0 = time.perf_counter()
    for i in range(ITERS):
        float(run_cache(sk + jnp.asarray(i * 1e-6, bf)))
    print(f"micro {'cache_write x12':28s}: "
          f"{(time.perf_counter() - t0) / ITERS / STEPS * 1e6:9.1f} us/step", flush=True)

    # beam bookkeeping: top_k over beam^2 + gathers
    sc = arr(b, k, dtype=jnp.float32)
    tok = jnp.ones((n, u), jnp.int32)

    def book(carry):
        sc, tok = carry
        best, flat = jax.lax.top_k((sc[:, :, None] + sc[:, None, :]).reshape(b, k * k), k)
        parent = flat // k
        fp = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
        tok = jnp.take(tok, fp, axis=0)
        return (best * 0.999, tok)

    scan_op("beam_bookkeeping x1", book, (sc, tok))


def conformer_compare(b=256):
    """Matched-batch transformer-vs-conformer decode decomposition.

    BENCH r3 reported rtfx_conformer 5,449 vs 20,004 for the transformer —
    but the transformer headline ran at B512 while the conformer row ran at
    B256, so the '3.7x' conflated encoder cost with batch efficiency. This
    times encode and search separately at the SAME batch for both encoders
    (the decoder is identical, so any true gap must live in encode:
    rel-pos attention + the conv module)."""
    import bench as bench_mod
    from opentransformer_tpu.ops.masks import length_to_mask
    from opentransformer_tpu.recognize.base import make_memory_search

    mask = length_to_mask(jnp.asarray([FRAMES] * b), FRAMES)
    rng = np.random.default_rng(3)
    for enc in ("transformer", "conformer"):
        model, _ = bench_mod.flagship_model(enc)
        params = bench_mod.init_params(model)

        @jax.jit
        def encode(p, f, m, _model=model):
            memory, memory_mask = _model.apply(p, f, m, method="encode")
            return jnp.sum(memory.astype(jnp.float32)), memory, memory_mask

        def enc_inputs(i):
            return (params,
                    jnp.asarray(rng.normal(size=(b, FRAMES, 40)), jnp.float32),
                    mask)

        t_enc = timed(lambda p, f, m: encode(p, f, m)[0], enc_inputs)
        _, memory, memory_mask = encode(*enc_inputs(0))
        search = make_memory_search(model, BEAM, 24, eos_id=-1)

        @jax.jit
        def run(p, mem, mem_mask, _s=search):
            return jnp.sum(_s(p, mem, mem_mask).tokens)

        def s_inputs(i):
            eps = jnp.asarray(rng.normal(size=(1, 1, memory.shape[-1])) * 1e-3,
                              memory.dtype)
            return params, memory + eps, memory_mask

        t_search = timed(run, s_inputs)
        audio = b * FRAMES * 0.01
        print(f"{enc:12s} B{b}: encode {t_enc * 1e3:8.2f} ms | "
              f"search24 {t_search * 1e3:8.2f} ms | "
              f"RTFx {audio / (t_enc + t_search):8.0f}", flush=True)


def lm_compare(b=BATCH):
    """Matched-batch LM shallow-fusion overhead attribution (VERDICT r4 #5).

    Times the beam search on one precomputed memory with no LM, a 1-block
    LM, and the full 6-block LM (all through the fused two-head
    projection→top-k kernel). Deltas attribute the fusion overhead:
      (1L − none)  ≈ two-head kernel + LM embedding/cache plumbing
      (6L − 1L)/5  ≈ per-LM-block decode step cost
    """
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.recognize.base import make_memory_search

    model, params, feats, mask = build()

    @jax.jit
    def encode(p, f, m):
        memory, memory_mask = model.apply(p, f, m, method="encode")
        return jnp.sum(memory.astype(jnp.float32)), memory, memory_mask

    _, memory, memory_mask = encode(params, feats[:b], mask[:b])
    memory = jax.block_until_ready(memory)

    def lm_of(n_blocks):
        # NB the LM field is num_blocks (reference transformer_lm.yaml key);
        # an "n_blocks" key here would be silently dropped by the registry's
        # field filter and every variant would be the 6-block default — that
        # bug produced r5's first (wrong) "LM depth is free" attribution
        lm = build_model({"type": "transformer_lm", "vocab_size": 4233,
                          "d_model": 256, "n_heads": 4, "d_ff": 2048,
                          "num_blocks": n_blocks, "residual_dropout": 0.0},
                         dtype=jnp.bfloat16)
        lm_params = lm.init(jax.random.PRNGKey(1),
                            jnp.ones((2, 8), jnp.int32),
                            jnp.ones((2, 8), jnp.int32),
                            jnp.asarray([8, 8], jnp.int32))
        return lm, lm_params

    results = {}
    for label, lm_args in [("no-LM", None), ("LM-0L", lm_of(0)),
                           ("LM-1L", lm_of(1)), ("LM-6L", lm_of(6))]:
        lm, lm_params = lm_args if lm_args else (None, None)
        times = {}
        for max_len in (24, 4):
            search = make_memory_search(model, BEAM, max_len, eos_id=-1,
                                        lm=lm, lm_params=lm_params)

            @jax.jit
            def run(p, mem, mem_mask):
                return jnp.sum(search(p, mem, mem_mask).tokens)

            rng2 = np.random.default_rng(max_len * 7 + 13)

            def inputs(i):
                eps = jnp.asarray(
                    rng2.normal(size=(1, 1, memory.shape[-1])) * 1e-3,
                    memory.dtype)
                return params, memory + eps, memory_mask

            t = timed(run, inputs)
            times[max_len] = t
            print(f"search B{b} max_len={max_len:3d} {label:6s}: "
                  f"{t * 1e3:8.2f} ms", flush=True)
        per_step = (times[24] - times[4]) / 20.0
        results[label] = per_step
        print(f"  -> per-step ({label})  : {per_step * 1e3:8.3f} ms",
              flush=True)
    base, zero, one, six = (results["no-LM"], results["LM-0L"],
                            results["LM-1L"], results["LM-6L"])
    print(f"\nfusion overhead per step : {(six - base) * 1e3:8.3f} ms "
          f"({six / base:.2f}x no-LM)")
    print(f"  second head + embedding, NO LM cache (0L - none): {(zero - base) * 1e3:8.3f} ms")
    print(f"  first block's cache + attn (1L - 0L)            : {(one - zero) * 1e3:8.3f} ms")
    print(f"  per-LM-block cost ((6L - 1L)/5)                 : {(six - one) / 5 * 1e3:8.3f} ms")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip surgery runs")
    ap.add_argument("--micro", action="store_true", help="micro-op timings only")
    ap.add_argument("--conformer", action="store_true",
                    help="matched-batch transformer vs conformer decomposition")
    ap.add_argument("--lm", action="store_true",
                    help="matched-batch LM shallow-fusion attribution")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.micro:
        return micro()
    if args.conformer:
        return conformer_compare()
    if args.lm:
        return lm_compare()

    from opentransformer_tpu.recognize.base import make_memory_search

    model, params, feats, mask = build()

    @jax.jit
    def encode(params, feats, mask):
        memory, memory_mask = model.apply(params, feats, mask, method="encode")
        return jnp.sum(memory.astype(jnp.float32)), memory, memory_mask

    rng = np.random.default_rng(1)

    def enc_inputs(i):
        return params, jnp.asarray(rng.normal(size=(BATCH, FRAMES, 40)), jnp.float32), mask

    t_enc = timed(lambda p, f, m: encode(p, f, m)[0], enc_inputs)
    print(f"encode                 : {t_enc * 1e3:8.2f} ms", flush=True)

    _, memory, memory_mask = encode(params, feats, mask)
    memory = jax.block_until_ready(memory)

    def search_time(max_len, mdl=None, prm=None, label=""):
        mdl = mdl or model
        prm = prm if prm is not None else params
        search = make_memory_search(mdl, BEAM, max_len, eos_id=-1)

        @jax.jit
        def run(p, mem, mem_mask):
            hyp = search(p, mem, mem_mask)
            return jnp.sum(hyp.tokens)

        rng2 = np.random.default_rng(max_len * 7 + 13)

        def inputs(i):
            # perturb memory per call so dispatches don't dedup
            eps = jnp.asarray(rng2.normal(size=(1, 1, memory.shape[-1])) * 1e-3,
                              memory.dtype)
            return prm, memory + eps, memory_mask

        t = timed(run, inputs)
        print(f"search max_len={max_len:3d} {label:12s}: {t * 1e3:8.2f} ms", flush=True)
        return t

    t24 = search_time(24)
    t4 = search_time(4)
    per_step = (t24 - t4) / 20.0
    print(f"  -> per-step (slope)  : {per_step * 1e3:8.3f} ms", flush=True)

    if args.quick:
        return

    # surgery: shrink ONE component, re-time, attribute the delta
    for label, overrides in [
        ("d_ff=256", {"decoder.d_ff": 256}),
        ("vocab=512", {"decoder.vocab_size": 512}),
        ("dec_blocks=3", {"decoder.n_blocks": 3}),
    ]:
        mdl, prm, f2, m2 = build(overrides)
        _, mem2, memmask2 = jax.jit(
            lambda p, f, m: (0.0, *mdl.apply(p, f, m, method="encode"))
        )(prm, f2, m2)
        search = make_memory_search(mdl, BEAM, 24, eos_id=-1)

        @jax.jit
        def run(p, mem, mem_mask):
            return jnp.sum(search(p, mem, mem_mask).tokens)

        rng3 = np.random.default_rng(99)

        def inputs(i):
            eps = jnp.asarray(rng3.normal(size=(1, 1, mem2.shape[-1])) * 1e-3, mem2.dtype)
            return prm, mem2 + eps, memmask2

        t = timed(run, inputs)
        print(f"search 24 {label:15s}: {t * 1e3:8.2f} ms  (delta vs full "
              f"{(t24 - t) * 1e3:+8.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
