#!/usr/bin/env python
"""Does XLA cost_analysis multiply while/scan bodies by trip count?

Compares cost_analysis()["flops"] for:
  single : ONE update (fwd+bwd+clip+adam), no scan
  scan20 : the same update scanned 20x (bench's timed program)
  acc4u  : one update with accum=4, python-UNROLLED micros
  acc4s  : one update with accum=4 via inner lax.scan
If bodies are counted once: scan20 ~= single and acc4s ~= single, while
acc4u ~= 4x single. That makes bench.py's flops/iters division (and its
accum MFU) wrong by the trip counts.

Measured 2026-08-20 on the v5e chip (flagship geometry, B64 T512):
  single        1.4164e12 flops  (hand roofline 2x params x tokens: ~1.3e12)
  scan20/single 0.99997
  acc4u/single  3.9955
  acc4s/single  1.00003
=> bodies counted ONCE. bench.py r1-r4 divided the N-step program's flops
by N and under-reported train MFU by exactly N x (and accumulation rows by
another accum x): the REAL flagship training MFU is ~21% at B16, ~31% at
B64-B256, ~28-29% at B512-B1024, ~35% at B64x4accum — not 1-6%. bench.py
now uses the body-once convention directly (see its train_throughput).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import FLAGSHIP_MODEL_CFG, TRAIN_CFG
from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.train.trainer import Trainer

b, t, u = 64, 512, 32
model = build_model(FLAGSHIP_MODEL_CFG, dtype=jnp.bfloat16)
trainer = Trainer({**TRAIN_CFG, "accum_steps": 1}, model, log_interval=10 ** 9)
trainer._update_fn = trainer._build_update_fn()
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


def micro(variables, gacc, kk, accum):
    kf, kd = jax.random.split(kk)
    feats = jax.random.normal(kf, (b, t, 40), jnp.float32)
    loss, grads = jax.value_and_grad(loss_fn)(variables["params"], feats, kd)
    gacc = jax.tree_util.tree_map(
        lambda a, g: a + g.astype(a.dtype) / accum, gacc, grads)
    return gacc, loss


def zeros_like(variables):
    return jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), variables["params"])


@jax.jit
def single(variables, opt_state, nan_skips, lr, k):
    k_m, k_u = jax.random.split(k)
    gacc, loss = micro(variables, zeros_like(variables), k_m, 1)
    variables, opt_state, nan_skips, _ = update_core(
        variables, opt_state, gacc, nan_skips, lr, k_u)
    return variables, opt_state, nan_skips, loss


@jax.jit
def scan20(variables, opt_state, nan_skips, lrs, keys):
    def body(carry, xs):
        variables, opt_state, nan_skips = carry
        lr, k = xs
        k_m, k_u = jax.random.split(k)
        gacc, loss = micro(variables, zeros_like(variables), k_m, 1)
        variables, opt_state, nan_skips, _ = update_core(
            variables, opt_state, gacc, nan_skips, lr, k_u)
        return (variables, opt_state, nan_skips), loss

    (variables, opt_state, nan_skips), losses = jax.lax.scan(
        body, (variables, opt_state, nan_skips), (lrs, keys))
    return variables, opt_state, nan_skips, losses[-1]


@jax.jit
def acc4u(variables, opt_state, nan_skips, lr, k):
    ks = jax.random.split(k, 5)
    gacc = zeros_like(variables)
    loss = 0.0
    for i in range(4):  # unrolled
        gacc, loss = micro(variables, gacc, ks[i], 4)
    variables, opt_state, nan_skips, _ = update_core(
        variables, opt_state, gacc, nan_skips, lr, ks[4])
    return variables, opt_state, nan_skips, loss


@jax.jit
def acc4s(variables, opt_state, nan_skips, lr, k):
    k_m, k_u = jax.random.split(k)

    def mb(gacc, kk):
        return micro(variables, gacc, kk, 4)

    gacc, losses = jax.lax.scan(mb, zeros_like(variables),
                                jax.random.split(k_m, 4))
    variables, opt_state, nan_skips, _ = update_core(
        variables, opt_state, gacc, nan_skips, lr, k_u)
    return variables, opt_state, nan_skips, losses[-1]


batch = (None, {"inputs": jnp.zeros((b, t, 40), jnp.float32), "mask": mask},
         {"targets": tgt_d, "targets_length": tlen})
state = trainer.init_state(jax.random.PRNGKey(0), batch)
v, opt, ns = state.params, state.opt_state, state.nan_skips


def flops(lowered):
    c = lowered.compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return float(c["flops"])


lr = jnp.float32(1e-4)
k = jax.random.PRNGKey(0)
lrs = jnp.full((20,), 1e-4, jnp.float32)
keys = jax.random.split(k, 20)

out = {
    "single": flops(single.lower(v, opt, ns, lr, k)),
    "scan20": flops(scan20.lower(v, opt, ns, lrs, keys)),
    "acc4_unrolled": flops(acc4u.lower(v, opt, ns, lr, k)),
    "acc4_scan": flops(acc4s.lower(v, opt, ns, lr, k)),
}
out["scan20/single"] = out["scan20"] / out["single"]
out["acc4u/single"] = out["acc4_unrolled"] / out["single"]
out["acc4s/single"] = out["acc4_scan"] / out["single"]
print(json.dumps(out, indent=2))
with open("/tmp/flops_probe.json", "w") as f:
    json.dump(out, f)
