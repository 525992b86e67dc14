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
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/ot_train_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip running; parse an existing --trace-dir")
    args = ap.parse_args(argv)

    if not args.parse_only:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        print(f"device: {jax.devices()[0]}")
        multi, state, stacked = build_multi(args.b, args.t, args.u, args.iters)
        lrs = np.full((args.iters,), 1e-4, np.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), args.iters)
        v, opt, ns = state.params, state.opt_state, state.nan_skips
        v, opt, ns, losses, _, _ = multi(v, opt, ns, stacked(3), lrs, keys)
        float(losses[-1, -1])  # compile + warm
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            for s in (4, 5):
                v, opt, ns, losses, _, _ = multi(v, opt, ns, stacked(s), lrs, keys)
                float(losses[-1, -1])
        print(f"trace written to {args.trace_dir} "
              f"({args.iters} updates/call x 2 calls, B{args.b} T{args.t})")
    summarize_xplane(args.trace_dir, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
