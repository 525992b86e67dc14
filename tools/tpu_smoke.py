#!/usr/bin/env python
"""Real-TPU smoke test for the Pallas kernels: compile + value parity.

The CPU test suite runs every Pallas kernel in interpret mode (exact
semantics, no Mosaic). This script is the missing half: it compiles the
kernels on the actual chip and cross-checks them against the XLA reference
paths, including the flagship decode geometry. Run it whenever the kernels
change or the runtime is updated:

    python tools/tpu_smoke.py           # ~1 min after caches are warm

Exits non-zero on any mismatch or compile failure. If the axon tunnel is
down, jax.devices() blocks — probe with a timeout first (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

import numpy as np

# runnable from anywhere: tools/ lives one level under the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _check(name, got, ref, atol, exact_idx=True):
    vals, idx = got
    ref_vals, ref_idx = ref
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref_vals, ref_idx = np.asarray(ref_vals), np.asarray(ref_idx)
    if exact_idx and not (idx == ref_idx).all():
        bad = int((idx != ref_idx).sum())
        print(f"FAIL {name}: {bad} index mismatches")
        return False
    err = np.max(np.abs(vals - ref_vals))
    if err > atol:
        print(f"FAIL {name}: max |Δval| = {err:.3e} > {atol}")
        return False
    print(f"ok   {name}: max |Δval| = {err:.3e}")
    return True


def main() -> int:
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.ops.project_topk import (
        project2_logp_topk_pallas,
        project2_logp_topk_xla,
        project_logp_topk_pallas,
        project_logp_topk_xla,
    )

    dev = jax.devices()[0]
    print(f"device: {dev}")
    if dev.platform != "tpu":
        print("not a TPU — this smoke test only validates Mosaic compiles")
        return 1

    rng = np.random.default_rng(0)
    ok = True

    # one-head: small ragged, flagship decode geometry (B·K=2560, V=4233),
    # and bf16 hidden states (decode runs the model in bf16)
    for name, (n, d, v, k, dt, atol) in {
        "topk small f32": (37, 48, 300, 5, jnp.float32, 1e-5),
        "topk flagship f32": (2560, 256, 4233, 5, jnp.float32, 1e-4),
        "topk flagship bf16": (2560, 256, 4233, 5, jnp.bfloat16, 5e-2),
        "topk k=1 (greedy/ctc)": (512, 256, 4233, 1, jnp.bfloat16, 5e-2),
    }.items():
        h = jnp.asarray(rng.normal(size=(n, d)), dt)
        w = jnp.asarray(rng.normal(size=(v, d)) * 0.3, jnp.float32)
        b = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
        got = project_logp_topk_pallas(h, w, b, k)
        ref = project_logp_topk_xla(h, w, b, k)
        # bf16: XLA and Mosaic may round differently → indices can flip on
        # near-ties, but then both picks have near-equal values, so the
        # sorted top-k VALUES still compare elementwise within atol
        ok &= _check(name, got, ref, atol, exact_idx=(dt == jnp.float32))

    # two-head (shallow LM fusion at flagship geometry)
    n, d1, d2, v, k = 2560, 256, 256, 4233, 5
    h1 = jnp.asarray(rng.normal(size=(n, d1)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(v, d1)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    h2 = jnp.asarray(rng.normal(size=(n, d2)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(v, d2)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    got = project2_logp_topk_pallas(h1, w1, b1, h2, w2, b2, 0.1, k)
    ref = project2_logp_topk_xla(h1, w1, b1, h2, w2, b2, 0.1, k)
    ok &= _check("topk2 flagship f32", got, ref, 1e-4)

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
