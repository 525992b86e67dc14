#!/usr/bin/env python
"""Decode-precision bisect on the trained flagship (VERDICT r4 item 2).

Decodes the synth_bench test split with the trained flagship weights under
several precision configurations (beam 5, early exit ON, max_len=30 — the
corpus max, so no hypothesis truncates) and appends one JSON line per
config to $OT_PROBE_OUT (default /tmp/probe_results.jsonl):

  f32        : enc f32,  dec f32
  bf16       : enc bf16, dec bf16
  enc32dec16 : enc f32,  dec bf16  -> isolates decoder-side damage
  enc16dec32 : enc bf16, dec f32   -> isolates encoder-side damage
  round16    : params pre-rounded f32->bf16->f32, all-f32 compute
               -> isolates PARAM quantization from activation compute

Measured 2026-08-20 on the v5e chip: ALL configs score 0.045% CER
(round16: 0.033%). The r4 bench's 2.545% "bf16 cliff" was its own
max_len=24 decode truncation (238/8958 expected = 2.66%), not numerics —
see ROADMAP "bf16 decode numerics" for the full table.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from export_trained_synth import load_trained_params
from __graft_entry__ import FLAGSHIP_MODEL_CFG
from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.recognize.base import make_memory_search
from opentransformer_tpu.data import synth
from opentransformer_tpu.ops.levenshtein import ErrorRateAccumulator
from opentransformer_tpu.ops.masks import length_to_mask

OUT = os.environ.get("OT_PROBE_OUT", "/tmp/probe_results.jsonl")
NPZ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "egs", "synth_bench", "trained", "flagship_synth_f16.npz")

params = jax.tree_util.tree_map(jnp.asarray, load_trained_params(NPZ))
params_r16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16).astype(jnp.float32), params)

utts = list(synth.gen_split("test"))
n = len(utts)
t_pad = synth.MAX_FRAMES + (-synth.MAX_FRAMES) % 8
b_pad = n + (-n) % 128
feats = np.zeros((b_pad, t_pad, synth.FEAT_DIM), np.float32)
lengths = np.zeros((b_pad,), np.int32)
refs = []
for i, (_, x, toks) in enumerate(utts):
    feats[i, : len(x)] = x
    lengths[i] = len(x)
    refs.append([t + 3 for t in toks])
lengths[n:] = 1
feats_d = jnp.asarray(feats)
mask_d = length_to_mask(jnp.asarray(lengths), t_pad)
max_len = synth.MAX_TOKENS + 2

model32 = build_model(FLAGSHIP_MODEL_CFG, dtype=jnp.float32)
model16 = build_model(FLAGSHIP_MODEL_CFG, dtype=jnp.bfloat16)
MODELS = {"f32": model32, "bf16": model16}


def run(name, enc, dec, p):
    t0 = time.time()
    enc_m, dec_m = MODELS[enc], MODELS[dec]
    search = make_memory_search(dec_m, 5, max_len, penalty=0.6, eos_id=1)

    @jax.jit
    def decode_tokens(params, feats, mask):
        memory, memory_mask = enc_m.apply(params, feats, mask, method="encode")
        memory = memory.astype(jnp.bfloat16 if dec == "bf16" else jnp.float32)
        hyp = search(params, memory, memory_mask)
        return hyp.tokens

    tokens = np.asarray(decode_tokens(p, feats_d, mask_d))
    cer = ErrorRateAccumulator()
    for i in range(n):
        hyp = []
        for tok in tokens[i, 0, 1:]:
            if tok == 1:
                break
            if tok != 0:
                hyp.append(int(tok))
        cer.update([str(t) for t in refs[i]], [str(t) for t in hyp])
    rec = {"probe": name, "enc": enc, "dec": dec,
           "cer_pct": round(cer.rate * 100, 3),
           "errs": int(round(cer.rate * cer.total)) if hasattr(cer, "total") else None,
           "wall_s": round(time.time() - t0, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


probes = [
    ("bf16", "bf16", "bf16", params),       # warm from bench cache
    ("f32", "f32", "f32", params),
    ("enc32dec16", "f32", "bf16", params),
    ("enc16dec32", "bf16", "f32", params),
    ("round16", "f32", "f32", params_r16),  # same programs as f32 probe
]
for name, enc, dec, p in probes:
    try:
        run(name, enc, dec, p)
    except Exception as e:
        with open(OUT, "a") as f:
            f.write(json.dumps({"probe": name, "error": f"{type(e).__name__}: {e}"[:300]}) + "\n")
        print(f"probe {name} failed: {e}", flush=True)
print("ALL PROBES DONE", flush=True)
