#!/usr/bin/env python
"""Profile the flagship multi-step training program on the real chip and
print where the time goes (VERDICT r2 item 2: the 9 ms/update vs ~1.5 ms
matmul-roofline gap).

Runs the exact bench.py train program (Trainer multi-step scan: fwd + bwd +
clip + adam, bf16) under ``jax.profiler.trace``, then parses the xplane
capture with xprof and prints the top HLO ops by self time plus the
category breakdown (matmul vs elementwise vs copy/reduce/etc). This turns
"diffuse small-op overhead" into a ranked list.

    python tools/profile_train.py [-b 16] [-t 512] [--iters 8] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_multi(b, t, u, iters):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_MODEL_CFG, TRAIN_CFG
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.train.trainer import Trainer

    model = build_model(FLAGSHIP_MODEL_CFG, dtype=jnp.bfloat16)
    trainer = Trainer({**TRAIN_CFG, "steps_per_exec": iters}, model,
                      log_interval=10 ** 9)
    rng = np.random.default_rng(2)
    tgt = np.ones((b, u + 2), np.int32)
    tgt[:, 1:-1] = rng.integers(3, 4000, (b, u))
    batch = (None,
             {"inputs": jnp.asarray(rng.normal(size=(b, t, 40)), jnp.float32),
              "mask": jnp.ones((b, t), bool)},
             {"targets": jnp.asarray(tgt),
              "targets_length": jnp.asarray([u + 1] * b)})
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer._grad_fn = trainer._build_grad_fn()
    trainer._update_fn = trainer._build_update_fn()
    multi = trainer._build_multi_fn()
    args0 = trainer.batch_fn(batch)

    def stacked(seed):
        r = np.random.default_rng(seed)
        feats = jnp.asarray(r.normal(size=(iters, 1, b, t, 40)), jnp.float32)
        rest = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (iters, 1) + a.shape), args0[1:])
        return (feats,) + rest

    return multi, state, stacked


def build_devgen(b, t, u, iters, accum):
    """The bench.py `train_throughput_devgen` program (fwd + bwd + grad
    accumulation + the Trainer's `_update_core`), features generated ON
    DEVICE per scan step — the only way to profile B>=256 without pushing
    GB of padded features through the tunnel. Returns (run, state)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_MODEL_CFG, TRAIN_CFG
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.train.trainer import Trainer

    model = build_model(FLAGSHIP_MODEL_CFG, dtype=jnp.bfloat16)
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
    return run, state


def summarize_xplane(trace_dir: str, top: int) -> None:
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane capture under {trace_dir}", file=sys.stderr)
        return
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    # gviz DataTable: {cols: [{id, label}...], rows: [{c: [{v}...]}...]};
    # xprof returns [all-ops table, idle-excluded table] — use the first
    table = tables[0]
    ids = [c.get("id") for c in table["cols"]]

    def cell(row, cid):
        return (row["c"][ids.index(cid)] or {}).get("v")

    def gather(side):
        recs = []
        for r in table["rows"]:
            if cell(r, "host_or_device") != side:
                continue
            typ, name = str(cell(r, "type")), str(cell(r, "operation"))
            if typ == "IDLE":
                continue
            recs.append({
                "type": typ, "name": name,
                "self_us": float(cell(r, "total_self_time") or 0.0),
                "occ": int(float(cell(r, "occurrences") or 0)),
                "bound": str(cell(r, "bound_by") or "?"),
            })
        return recs

    recs = gather("Device") or gather("Host")  # CPU traces have Host only
    if not recs:
        # column ids differ across xprof versions — dump what we have
        print("no rows parsed; columns:", ids)
        return
    recs.sort(key=lambda x: -x["self_us"])
    total = sum(x["self_us"] for x in recs)
    print(f"\ntotal device self-time: {total / 1e3:.2f} ms "
          f"({len(recs)} op types)")
    by_cat: dict = {}
    for x in recs:
        by_cat[x["type"]] = by_cat.get(x["type"], 0.0) + x["self_us"]
    print("\nby category:")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us / 1e3:9.2f} ms  {100 * us / total:5.1f}%  {cat}")
    print(f"\ntop {top} ops by self time:")
    for x in recs[:top]:
        print(f"  {x['self_us'] / 1e3:9.3f} ms  {100 * x['self_us'] / total:5.1f}%  "
              f"[{x['bound']:>8}] {x['name'][:80]} x{x['occ']}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-b", type=int, default=16)
    ap.add_argument("-t", type=int, default=512)
    ap.add_argument("-u", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps per update "
                         "(devgen mode only)")
    ap.add_argument("--devgen", action="store_true",
                    help="profile the bench devgen program (on-device "
                         "features; required for B>=256 and for --accum)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/ot_train_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip running; parse an existing --trace-dir")
    args = ap.parse_args(argv)
    if args.accum > 1 and not args.devgen:
        ap.error("--accum requires --devgen")

    if not args.parse_only:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        print(f"device: {jax.devices()[0]}")
        if args.devgen:
            run, state = build_devgen(args.b, args.t, args.u, args.iters,
                                      args.accum)
            lrs = np.full((args.iters,), 1e-4, np.float32)
            v, opt, ns = state.params, state.opt_state, state.nan_skips
            v, opt, ns, last = run(v, opt, ns, lrs,
                                   jax.random.split(jax.random.PRNGKey(1),
                                                    args.iters))
            float(last)  # compile + warm
            os.makedirs(args.trace_dir, exist_ok=True)
            with jax.profiler.trace(args.trace_dir):
                for s in (4, 5):
                    v, opt, ns, last = run(
                        v, opt, ns, lrs,
                        jax.random.split(jax.random.PRNGKey(s), args.iters))
                    float(last)
            print(f"trace written to {args.trace_dir} ({args.iters} updates"
                  f"/call x 2 calls, B{args.b}x{args.accum}accum T{args.t} "
                  "devgen)")
        else:
            multi, state, stacked = build_multi(args.b, args.t, args.u,
                                                args.iters)
            lrs = np.full((args.iters,), 1e-4, np.float32)
            keys = jax.random.split(jax.random.PRNGKey(1), args.iters)
            v, opt, ns = state.params, state.opt_state, state.nan_skips
            v, opt, ns, losses, _, _ = multi(v, opt, ns, stacked(3), lrs, keys)
            float(losses[-1, -1])  # compile + warm
            os.makedirs(args.trace_dir, exist_ok=True)
            with jax.profiler.trace(args.trace_dir):
                for s in (4, 5):
                    v, opt, ns, losses, _, _ = multi(v, opt, ns, stacked(s),
                                                     lrs, keys)
                    float(losses[-1, -1])
            print(f"trace written to {args.trace_dir} "
                  f"({args.iters} updates/call x 2 calls, B{args.b} T{args.t})")
    summarize_xplane(args.trace_dir, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
