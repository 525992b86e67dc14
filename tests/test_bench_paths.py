"""bench.py code paths on the CPU backend with tiny shapes.

The driver runs bench.py on the real chip; these tests keep its plumbing
(worst-case scan, fused fallback, trained-weights scoring, MFU accounting)
from rotting between hardware runs."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.masks import length_to_mask


def tiny_model():
    return build_model({
        "type": "speech2text",
        "frontend_type": "conv",
        "frontend": {"input_size": 8, "output_size": 16, "in_channel": 1,
                     "mid_channel": 4, "out_channel": 8,
                     "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
        "encoder_type": "transformer",
        "encoder": {"d_model": 16, "n_heads": 2, "d_ff": 32, "n_blocks": 1,
                    "residual_dropout": 0.0, "activation": "glu"},
        "decoder_type": "transformer",
        "decoder": {"vocab_size": 32, "d_model": 16, "n_heads": 2, "d_ff": 32,
                    "memory_dim": 16, "n_blocks": 1, "residual_dropout": 0.0,
                    "activation": "glu", "share_embedding": True},
        "ctc_weight": 0.0, "smoothing": 0.1,
    })


def test_worst_case_decode_runs_and_counts():
    model = tiny_model()
    b, t = 4, 32
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, t, 8)), jnp.float32)
    mask2 = length_to_mask(jnp.asarray([t, t]), t)
    tgt = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask2, tgt,
                        jnp.asarray([4, 4], jnp.int32))
    mask = length_to_mask(jnp.asarray([t] * b), t)
    with _patched_frames(t, feat_dim=8):
        rtfx, ups = bench.worst_case_decode(model, params, mask, batch=b,
                                            frames=t, iters=2)
    assert rtfx > 0 and ups > 0


class _patched_frames:
    """bench hardcodes feature dim 40 in its on-device input generation."""

    def __init__(self, frames, feat_dim):
        self.feat_dim = feat_dim

    def __enter__(self):
        self._orig = bench._decode_stack

        def stack(model, search, batch, frames, iters, _fd=self.feat_dim):
            @jax.jit
            def run(params, keys, mask):
                def step(c, key):
                    f = jax.random.normal(key, (batch, frames, _fd), jnp.float32)
                    memory, memory_mask = model.apply(params, f, mask, method="encode")
                    hyp = search(params, memory, memory_mask)
                    return c, jnp.sum(hyp.tokens)

                _, sums = jax.lax.scan(step, 0, keys)
                return jnp.sum(sums)

            return run

        bench._decode_stack = stack
        return self

    def __exit__(self, *a):
        bench._decode_stack = self._orig


def test_train_throughput_reports_mfu():
    model = tiny_model()
    out = bench.train_throughput(model, b=2, t=32, u=4, iters=2, label="_t")
    assert out["train_updates_per_sec_t"] > 0
    # XLA cost analysis must be available on every backend (values round to
    # ~0 at these toy shapes; presence is the contract)
    assert "train_tflops_per_update_t" in out
    assert "train_mfu_pct_t" in out


def test_train_throughput_devgen_with_accum():
    """The large-batch variant (device-generated feats + grad accumulation
    through the Trainer's update core) runs and reports the same keys."""
    model = tiny_model()
    out = bench.train_throughput_devgen(model, b=2, t=32, u=4, iters=2,
                                        accum=2, label="_dg")
    assert out["train_updates_per_sec_dg"] > 0
    assert "x2accum" in out["train_config_dg"]
    assert "train_mfu_pct_dg" in out


def test_trained_block_roundtrip(tmp_path, monkeypatch):
    """Export→reload params roundtrip + CER-0 scoring on an oracle decode."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    from export_trained_synth import flatten_params, load_trained_params

    model = tiny_model()
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32)
    mask = length_to_mask(jnp.asarray([32, 32]), 32)
    tgt = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt,
                        jnp.asarray([4, 4], jnp.int32))
    flat = flatten_params(jax.tree_util.tree_map(np.asarray, params))
    npz = tmp_path / "p.npz"
    np.savez(npz, **{k: v.astype(np.float16) for k, v in flat.items()})
    back = load_trained_params(str(npz))
    lb, _ = jax.tree_util.tree_flatten(back)
    lo, _ = jax.tree_util.tree_flatten(jax.tree_util.tree_map(np.asarray, params))
    assert len(lb) == len(lo)
    for a, b in zip(lo, lb):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)


def test_trained_block_absent_is_graceful(monkeypatch):
    monkeypatch.setattr(bench, "TRAINED_NPZ", "/nonexistent/x.npz")
    out = bench.trained_quality_and_speed()
    assert "trained" in out and "absent" in out["trained"]
