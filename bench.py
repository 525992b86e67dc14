#!/usr/bin/env python
"""Benchmark: decode + train throughput on one TPU chip, plus recognition
quality on trained weights.

North-star (BASELINE.md): decoded utts/sec/chip + RTFx at CER parity on
AISHELL-1; throughput goal >=20x real-time per v5e chip. Rows measured:

  * headline: RTFx AT CER PARITY on the trained synth_bench weights when
    the exported checkpoint exists and scores <= 2% CER (BASELINE.md's
    definition); otherwise the worst-case untrained number under an
    explicit `..._worst_case_untrained` metric name;
  * worst case: batch beam decode on random weights (flagship geometry
    d=256 / vocab 4233, 12L encoder + KV-cached 6L decoder, beam=5, bf16,
    EOS disabled so every decode runs all max_len steps) — BASELINE #1;
  * trained: CER + RTFx on the SAME trained weights (early exit ON) over
    the synthetic benchmark test split (data/synth.py), weights from
    egs/synth_bench/trained/ — the quality half of the north-star metric;
  * conformer: worst-case decode with the conformer encoder (config #3);
  * lm_fusion: beam decode with transformer-LM shallow fusion through the
    fused two-head projection→top-k kernel (config #4);
  * train: full training-step throughput (fwd+bwd+clip+adam) with MFU from
    XLA's own FLOP count — B16/B64 through the Trainer's steps_per_exec
    path, plus large-batch rows (B256/B512/B64x4-accum) with
    device-generated features (a host-stacked B256 input would be 4.2 GB
    of tunnel H2D).

Timing through the tunnel: block_until_ready is unreliable and per-dispatch
latency is 0.3-2 s (CLAUDE.md), so every measurement scans its batches
inside ONE jitted program, reduces to a scalar on device, fetches 8 bytes,
and reports the MEDIAN of several timed calls (dispatch jitter shrinks to a
fraction of one call).

Prints ONE JSON line:
  {"metric": ..., "value": RTFx, "unit": "x_realtime", "vs_baseline": RTFx/20, ...}
"""

from __future__ import annotations

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 512
FRAMES = 500  # 10ms frames -> 5.0 s of audio per utterance
MAX_LEN = 24  # decode steps forced (no early exit); AISHELL avg ~15 chars
BEAM = 5
ITERS = 8
TIMED_CALLS = 3
TRAINED_NPZ = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "egs", "synth_bench", "trained", "flagship_synth_f16.npz")
V5E_PEAK_BF16 = 1.97e14  # FLOP/s per chip


def median_timed(fn, calls=TIMED_CALLS):
    """fn() must end in an 8-byte device fetch; returns median elapsed."""
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _search_fn(model, lm=None, lm_params=None, beam=BEAM, max_len=MAX_LEN,
               eos_id=-1, lm_weight=0.1, fused_topk=True):
    from opentransformer_tpu.recognize.base import make_memory_search

    return make_memory_search(model, beam, max_len, penalty=0.6,
                              lm=lm, lm_params=lm_params, lm_weight=lm_weight,
                              eos_id=eos_id, fused_topk=fused_topk)


def _decode_stack(model, search, batch, frames, iters):
    """ONE jitted program decoding `iters` random batches (worst case)."""

    @jax.jit
    def run(params, keys, mask):
        def step(c, key):
            f = jax.random.normal(key, (batch, frames, 40), jnp.float32)
            memory, memory_mask = model.apply(params, f, mask, method="encode")
            hyp = search(params, memory, memory_mask)
            return c, jnp.sum(hyp.tokens)

        _, sums = jax.lax.scan(step, 0, keys)
        return jnp.sum(sums)

    return run


def worst_case_decode(model, params, mask, batch=BATCH, frames=FRAMES,
                      iters=ITERS, lm=None, lm_params=None):
    keysets = [jax.random.split(jax.random.PRNGKey(s), iters)
               for s in range(1, TIMED_CALLS + 2)]
    try:
        search = _search_fn(model, lm=lm, lm_params=lm_params)
        run = _decode_stack(model, search, batch, frames, iters)
        float(run(params, keysets[0], mask))  # warmup / compile
    except Exception as e:  # Pallas regression must not take the bench down
        import sys

        print(f"fused decode path failed ({type(e).__name__}: {e}); "
              "falling back to unfused", file=sys.stderr)
        search = _search_fn(model, lm=lm, lm_params=lm_params, fused_topk=False)
        run = _decode_stack(model, search, batch, frames, iters)
        float(run(params, keysets[0], mask))
    it = iter(keysets[1:])
    elapsed = median_timed(lambda: float(run(params, next(it), mask)))
    utts = batch * iters
    audio_seconds = utts * frames * 0.01
    return audio_seconds / elapsed, utts / elapsed


def flagship_model(encoder_type="transformer"):
    from __graft_entry__ import FLAGSHIP_MODEL_CFG
    from opentransformer_tpu.models.registry import build_model

    cfg = dict(FLAGSHIP_MODEL_CFG)
    if encoder_type == "conformer":
        cfg = {**cfg, "encoder_type": "conformer",
               "encoder": {"d_model": 256, "n_heads": 4, "d_ff": 2048,
                           "nblocks": 12, "residual_dropout": 0.1,
                           "relative_positional": True}}
    return build_model(cfg, dtype=jnp.bfloat16), cfg


def init_params(model, frames=FRAMES, b=2):
    from opentransformer_tpu.ops.masks import length_to_mask

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(b, frames, 40)), jnp.float32)
    mask = length_to_mask(jnp.asarray([frames] * b), frames)
    tgt = jnp.ones((b, 8), jnp.int32)
    return model.init(jax.random.PRNGKey(0), feats, mask, tgt,
                      jnp.asarray([6] * b, jnp.int32))


def trained_quality_and_speed():
    """CER + RTFx on the SAME trained weights, early exit ON (VERDICT r2 #1).

    Regenerates the deterministic synthetic test split (data/synth.py),
    decodes it with the trained flagship weights (egs/synth_bench/trained/),
    scores CER against the references, and times the decode as a scanned
    stack of row-rotations (distinct inputs per iteration so nothing CSEs
    or dedups; same audio, realistic early-exit step counts)."""
    if not os.path.exists(TRAINED_NPZ):
        return {"trained": "absent (run egs/synth_bench/run.sh)"}
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from export_trained_synth import load_trained_params

    from opentransformer_tpu.data import synth
    from opentransformer_tpu.ops.levenshtein import ErrorRateAccumulator

    model, _ = flagship_model()
    params = jax.tree_util.tree_map(jnp.asarray, load_trained_params(TRAINED_NPZ))

    utts = list(synth.gen_split("test"))
    n = len(utts)
    t_pad = synth.MAX_FRAMES + (-synth.MAX_FRAMES) % 8  # 1152
    b_pad = n + (-n) % 128
    feats = np.zeros((b_pad, t_pad, synth.FEAT_DIM), np.float32)
    lengths = np.zeros((b_pad,), np.int32)
    refs = []
    for i, (_, x, toks) in enumerate(utts):
        feats[i, : len(x)] = x
        lengths[i] = len(x)
        refs.append([t + 3 for t in toks])  # unit ids (specials offset)
    lengths[n:] = 1
    from opentransformer_tpu.ops.masks import length_to_mask

    max_len = synth.MAX_TOKENS + 2
    search = _search_fn(model, eos_id=1)  # early exit ON (real EOS)
    feats_d = jnp.asarray(feats)
    mask_d = length_to_mask(jnp.asarray(lengths), t_pad)

    @jax.jit
    def decode_tokens(params, feats, mask):
        memory, memory_mask = model.apply(params, feats, mask, method="encode")
        hyp = search(params, memory, memory_mask)
        return hyp.tokens  # [B, K, L]

    tokens = np.asarray(decode_tokens(params, feats_d, mask_d))
    cer = ErrorRateAccumulator()
    for i in range(n):
        hyp = []
        for tok in tokens[i, 0, 1:]:  # best beam, strip BOS
            if tok == 1:  # EOS
                break
            if tok != 0:
                hyp.append(int(tok))
        cer.update([str(t) for t in refs[i]], [str(t) for t in hyp])

    # throughput: iters distinct row-rotations of the same split in ONE scan
    iters = 4

    @jax.jit
    def timed_stack(params, feats, mask, shifts):
        def step(c, shift):
            f = jnp.roll(feats, shift, axis=0)
            m = jnp.roll(mask, shift, axis=0)
            memory, memory_mask = model.apply(params, f, m, method="encode")
            hyp = search(params, memory, memory_mask)
            return c, jnp.sum(hyp.tokens)

        _, sums = jax.lax.scan(step, 0, shifts)
        return jnp.sum(sums)

    shift_sets = [jnp.arange(1 + 7 * s, 1 + 7 * s + iters, dtype=jnp.int32)
                  for s in range(TIMED_CALLS + 1)]
    float(timed_stack(params, feats_d, mask_d, shift_sets[0]))  # compile
    it = iter(shift_sets[1:])
    elapsed = median_timed(
        lambda: float(timed_stack(params, feats_d, mask_d, next(it))))
    audio_seconds = iters * float(np.sum(lengths[:n])) * 0.01
    return {
        "cer_trained_pct": round(cer.rate * 100, 3),
        "rtfx_trained": round(audio_seconds / elapsed, 2),
        "utts_per_sec_trained": round(iters * n / elapsed, 2),
        "trained_config": f"synth_bench test n={n} pad{t_pad} beam{BEAM} "
                          f"early-exit-on x{iters}-scan bf16",
    }


def train_throughput(model, b=16, t=512, u=32, iters=20, label="", fused=False):
    """Full training-step throughput (fwd+bwd+clip+adam) on the flagship
    geometry — the surface the reference's Trainer spends its life in
    (otrans/train/trainer.py hot loop). All `iters` updates run as ONE
    lax.scan program (the Trainer's steps_per_exec path) so the measurement
    is device throughput, not tunnel dispatch. MFU uses XLA's own FLOP
    count for the compiled program against the v5e bf16 peak."""
    from opentransformer_tpu.train.trainer import Trainer

    from __graft_entry__ import TRAIN_CFG

    trainer = Trainer({**TRAIN_CFG, "steps_per_exec": iters,
                       "fused_update": fused}, model, log_interval=10 ** 9)
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
    v, opt, ns = state.params, state.opt_state, state.nan_skips

    # XLA's FLOP count for the whole N-update program (fwd+bwd+optimizer)
    flops_per_update = None
    try:
        compiled = multi.lower(v, opt, ns, stacked_args(9), lrs,
                               jax.random.split(jax.random.PRNGKey(0), iters)
                               ).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_update = float(cost["flops"]) / iters
    except Exception as e:
        import sys

        print(f"cost_analysis unavailable ({type(e).__name__}: {e})",
              file=sys.stderr)

    warm = stacked_args(3)
    timed = [stacked_args(4 + i) for i in range(TIMED_CALLS)]
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    v, opt, ns, losses, _, _ = multi(v, opt, ns, warm, lrs, keys)  # compile
    float(losses[-1, -1])

    results = {"v": v, "opt": opt, "ns": ns, "i": 0}

    def one_call():
        k = jax.random.split(jax.random.PRNGKey(5 + results["i"]), iters)
        v2, o2, n2, losses, _, _ = multi(results["v"], results["opt"],
                                         results["ns"], timed[results["i"]],
                                         lrs, k)
        results.update(v=v2, opt=o2, ns=n2, i=results["i"] + 1)
        float(losses[-1, -1])  # 8-byte fetch when the whole scan finishes

    dt = median_timed(one_call)
    ups = iters / dt
    out = {
        f"train_updates_per_sec{label}": round(ups, 3),
        f"train_audio_sec_per_sec{label}": round(ups * b * t * 0.01, 1),
        f"train_config{label}": f"B{b} T{t} U{u} x{iters}-step-scan "
                                "fwd+bwd+clip+adam bf16"
                                + (" fused-flat-update" if fused else ""),
    }
    if flops_per_update:
        out[f"train_mfu_pct{label}"] = round(
            100.0 * flops_per_update * ups / V5E_PEAK_BF16, 2)
        out[f"train_tflops_per_update{label}"] = round(flops_per_update / 1e12, 3)
    return out


def train_throughput_devgen(model, b, t, u, iters=20, accum=1, label=""):
    """Training throughput at LARGE per-chip batch (VERDICT r3 #4).

    Same math as `train_throughput` (fwd+bwd through the model, grad
    accumulation, then the Trainer's own `_update_core`: clip + NaN-guard +
    torch-Adam), but features are generated ON DEVICE per scan step from
    PRNG keys — a [20, 256, 512, 40] f32 host-stacked input would be 4.2 GB
    of H2D through the 96 MB/s tunnel and most of HBM, which is why the r3
    bench stopped at B64. Distinct keys per step and per timed call keep the
    dispatches from deduping."""
    from opentransformer_tpu.train.trainer import Trainer

    from __graft_entry__ import TRAIN_CFG

    trainer = Trainer({**TRAIN_CFG, "accum_steps": accum}, model,
                      log_interval=10 ** 9)
    trainer._update_fn = trainer._build_update_fn()  # sets _update_core
    update_core = trainer._update_core

    rng0 = np.random.default_rng(2)
    tgt = np.ones((b, u + 2), np.int32)
    tgt[:, 1:-1] = rng0.integers(3, 4000, (b, u))
    tgt_d = jnp.asarray(tgt)
    tlen = jnp.asarray([u + 1] * b, jnp.int32)
    mask = jnp.ones((b, t), bool)

    def loss_fn(p, feats, kd):
        loss, _aux = model.apply({"params": p}, feats, mask, tgt_d, tlen,
                                 deterministic=False, rngs={"dropout": kd},
                                 train=True)
        return loss

    @jax.jit
    def run(variables, opt_state, nan_skips, lrs, keys):
        def body(carry, xs):
            variables, opt_state, nan_skips = carry
            lr, k = xs
            k_micro, k_upd = jax.random.split(k)

            def micro(gacc, kk):
                kf, kd = jax.random.split(kk)
                feats = jax.random.normal(kf, (b, t, 40), jnp.float32)
                loss, grads = jax.value_and_grad(loss_fn)(
                    variables["params"], feats, kd)
                gacc = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(a.dtype) / accum, gacc, grads)
                return gacc, loss

            gacc0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), variables["params"])
            gacc, losses = jax.lax.scan(micro, gacc0,
                                        jax.random.split(k_micro, accum))
            variables, opt_state, nan_skips, _gnorm = update_core(
                variables, opt_state, gacc, nan_skips, lr, k_upd)
            return (variables, opt_state, nan_skips), losses[-1]

        (variables, opt_state, nan_skips), losses = jax.lax.scan(
            body, (variables, opt_state, nan_skips), (lrs, keys))
        return variables, opt_state, nan_skips, losses[-1]

    batch = (None, {"inputs": jnp.zeros((b, t, 40), jnp.float32), "mask": mask},
             {"targets": tgt_d, "targets_length": tlen})
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    lrs = jnp.full((iters,), 1e-4, jnp.float32)
    v, opt, ns = state.params, state.opt_state, state.nan_skips

    flops_per_update = None
    try:
        keys0 = jax.random.split(jax.random.PRNGKey(0), iters)
        cost = run.lower(v, opt, ns, lrs, keys0).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_update = float(cost["flops"]) / iters
    except Exception as e:
        import sys

        print(f"cost_analysis unavailable ({type(e).__name__}: {e})",
              file=sys.stderr)

    v, opt, ns, last = run(v, opt, ns, lrs,
                           jax.random.split(jax.random.PRNGKey(1), iters))
    float(last)  # compile + warm
    results = {"v": v, "opt": opt, "ns": ns, "i": 0}

    def one_call():
        k = jax.random.split(jax.random.PRNGKey(5 + results["i"]), iters)
        v2, o2, n2, last = run(results["v"], results["opt"], results["ns"],
                               lrs, k)
        results.update(v=v2, opt=o2, ns=n2, i=results["i"] + 1)
        float(last)

    dt = median_timed(one_call)
    ups = iters / dt
    out = {
        f"train_updates_per_sec{label}": round(ups, 3),
        f"train_audio_sec_per_sec{label}": round(ups * accum * b * t * 0.01, 1),
        f"train_config{label}": f"B{b}x{accum}accum T{t} U{u} x{iters}-step-scan "
                                "fwd+bwd+clip+adam bf16 devgen-feats",
    }
    if flops_per_update:
        out[f"train_mfu_pct{label}"] = round(
            100.0 * flops_per_update * ups / V5E_PEAK_BF16, 2)
        out[f"train_tflops_per_update{label}"] = round(flops_per_update / 1e12, 3)
    return out


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from opentransformer_tpu.ops.masks import length_to_mask

    model, _ = flagship_model()
    params = init_params(model)
    mask = length_to_mask(jnp.asarray([FRAMES] * BATCH), FRAMES)

    rtfx, utts_per_sec = worst_case_decode(model, params, mask)
    worst_config = (f"B{BATCH} T{FRAMES} beam{BEAM} steps{MAX_LEN} bf16 "
                    f"no-early-exit x{ITERS}-batch-scan median-of-{TIMED_CALLS} "
                    "fused-topk")
    out = {"device": str(jax.devices()[0])}

    # quality + speed on the SAME trained weights (early exit ON)
    trained = {}
    try:
        trained = trained_quality_and_speed()
        out.update(trained)
    except Exception as e:
        out["trained_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # headline: BASELINE.md defines the metric as RTFx AT CER PARITY, so the
    # trained-weights number is the headline whenever the trained checkpoint
    # exists and actually recognizes (<= 2% CER on the synthetic stand-in);
    # the random-weights worst case is reported under an explicit
    # worst_case_untrained name either way (VERDICT r3 #5)
    cer = trained.get("cer_trained_pct")
    if cer is not None and cer <= 2.0:
        headline = {
            "metric": "aishell_flagship_beam5_decode_rtfx_at_cer_parity_per_chip",
            "value": trained["rtfx_trained"],
            "unit": "x_realtime",
            "vs_baseline": round(trained["rtfx_trained"] / 20.0, 3),
            "utts_per_sec_per_chip": trained["utts_per_sec_trained"],
        }
    else:
        headline = {
            "metric": "aishell_flagship_beam5_decode_rtfx_worst_case_untrained",
            "value": round(rtfx, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtfx / 20.0, 3),
            "utts_per_sec_per_chip": round(utts_per_sec, 2),
        }
    out = {**headline, **out,
           "rtfx_worst_case_untrained": round(rtfx, 2),
           "utts_per_sec_worst_case": round(utts_per_sec, 2),
           "worst_case_config": worst_config}

    # BASELINE tracked config #3: conformer encoder (worst case, B256)
    try:
        conf_model, _ = flagship_model("conformer")
        conf_params = init_params(conf_model)
        cmask = length_to_mask(jnp.asarray([FRAMES] * 256), FRAMES)
        c_rtfx, c_ups = worst_case_decode(conf_model, conf_params, cmask,
                                          batch=256, iters=4)
        out["rtfx_conformer"] = round(c_rtfx, 2)
        out["utts_per_sec_conformer"] = round(c_ups, 2)
    except Exception as e:
        out["conformer_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # BASELINE tracked config #4: transformer-LM shallow fusion through the
    # fused two-head projection→log-softmax→top-k kernel
    try:
        from opentransformer_tpu.models.registry import build_model

        lm = build_model({"type": "transformer_lm", "vocab_size": 4233,
                          "d_model": 256, "n_heads": 4, "d_ff": 2048,
                          "n_blocks": 6, "residual_dropout": 0.0},
                         dtype=jnp.bfloat16)
        lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((2, 8), jnp.int32),
                            jnp.ones((2, 8), jnp.int32),
                            jnp.asarray([8, 8], jnp.int32))
        fmask = length_to_mask(jnp.asarray([FRAMES] * 256), FRAMES)
        f_rtfx, f_ups = worst_case_decode(model, params, fmask, batch=256,
                                          iters=4, lm=lm, lm_params=lm_params)
        out["rtfx_lm_fusion"] = round(f_rtfx, 2)
        out["utts_per_sec_lm_fusion"] = round(f_ups, 2)
    except Exception as e:
        out["lm_fusion_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # training throughput + MFU: B16/B64 through the Trainer's real
    # steps_per_exec path (round-over-round continuity), one fused row to
    # keep the measured fused_update regression visible (docs cite it), and
    # the large-batch lever rows (B256, B512, B64x4-accum at fixed per-chip
    # micro-batch memory) with device-generated features — VERDICT r3 #4
    try:
        out.update(train_throughput(model))
        out.update(train_throughput(model, label="_fused", fused=True))
        out.update(train_throughput(model, b=64, label="_b64"))
        out.update(train_throughput_devgen(model, b=256, t=512, u=32,
                                           label="_b256"))
        out.update(train_throughput_devgen(model, b=512, t=512, u=32,
                                           iters=10, label="_b512"))
        out.update(train_throughput_devgen(model, b=64, t=512, u=32, accum=4,
                                           label="_b64_accum4"))
    except Exception as e:
        out["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
