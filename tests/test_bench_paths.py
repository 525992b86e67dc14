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


def test_verify_manifest_states(tmp_path):
    """sha256 gate (VERDICT r4 #7): absent / no-manifest / mismatch / ok."""
    ok, st = bench.verify_manifest(str(tmp_path / "missing.npz"))
    assert (ok, st) == (False, "absent")

    npz = tmp_path / "w.npz"
    np.savez(npz, a=np.zeros(3, np.float16))
    ok, st = bench.verify_manifest(str(npz))
    assert (ok, st) == (True, "no-manifest")

    import hashlib

    man = tmp_path / "w.manifest.json"
    man.write_text(json.dumps({"sha256": "0" * 64, "regenerate": "x.sh"}))
    ok, st = bench.verify_manifest(str(npz))
    assert not ok and "mismatch" in st

    man.write_text(json.dumps(
        {"sha256": hashlib.sha256(npz.read_bytes()).hexdigest()}))
    ok, st = bench.verify_manifest(str(npz))
    assert (ok, st) == (True, "verified")


def test_run_row_budget_and_errors(monkeypatch):
    """Budget-safety plumbing: optional rows skip past the budget, broken
    rows record errors instead of raising, and emit() prints exactly once."""
    monkeypatch.setattr(bench, "OUT", {})
    monkeypatch.setattr(bench, "_EMITTED", False)

    assert bench.run_row("good", lambda: 7) == 7
    assert bench.OUT["row_seconds"]["good"] >= 0

    assert bench.run_row("bad", lambda: 1 / 0) is None
    assert "ZeroDivisionError" in bench.OUT["bad_error"]

    monkeypatch.setattr(bench, "BUDGET_S", 0.0)  # budget exhausted
    assert bench.run_row("late", lambda: 7, min_budget_s=10.0) is None
    assert any("late" in s for s in bench.OUT["skipped_rows"])
    # mandatory rows run regardless of budget
    assert bench.run_row("must", lambda: 7, min_budget_s=10.0,
                         mandatory=True) == 7


def test_emit_prints_one_json_line(monkeypatch, capsys):
    monkeypatch.setattr(bench, "OUT", {"value": 1.25, "unit": "x_realtime",
                                       "metric": "m", "vs_baseline": 0.1})
    monkeypatch.setattr(bench, "_EMITTED", False)
    bench.emit()
    bench.emit()  # second call is a no-op
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "m" and rec["value"] == 1.25
    assert "bench_wall_s" in rec


def test_headline_prefers_trained_then_anchor(monkeypatch):
    base = {"rtfx_worst_case_untrained": 100.0, "utts_per_sec_worst_case": 9.0}
    monkeypatch.setattr(bench, "OUT", dict(base))
    bench._update_headline()
    assert "worst_case_untrained" in bench.OUT["metric"]

    monkeypatch.setattr(bench, "OUT", {
        **base, "cer_anchor_pct": 0.1, "rtfx_anchor": 55.0,
        "utts_per_sec_anchor": 5.0})
    bench._update_headline()
    assert bench.OUT["metric"].startswith("synth_anchor")
    assert bench.OUT["value"] == 55.0

    monkeypatch.setattr(bench, "OUT", {
        **base, "cer_anchor_pct": 0.1, "rtfx_anchor": 55.0,
        "utts_per_sec_anchor": 5.0, "cer_trained_pct": 0.05,
        "rtfx_trained": 77.0, "utts_per_sec_trained": 7.0})
    bench._update_headline()
    assert "at_cer_parity" in bench.OUT["metric"]
    assert bench.OUT["value"] == 77.0

    # a trained row ABOVE the parity gate falls through to the anchor
    monkeypatch.setattr(bench, "OUT", {
        **base, "cer_anchor_pct": 0.1, "rtfx_anchor": 55.0,
        "utts_per_sec_anchor": 5.0, "cer_trained_pct": 9.9,
        "rtfx_trained": 77.0, "utts_per_sec_trained": 7.0})
    bench._update_headline()
    assert bench.OUT["metric"].startswith("synth_anchor")


def test_import_leaves_no_alarm():
    """Importing bench (this module does) must not arm SIGALRM — an armed
    alarm would os._exit(0) the pytest process mid-suite."""
    import signal

    pending = signal.alarm(0)  # read + clear
    assert pending == 0


def test_trained_quality_and_speed_tiny(tmp_path, monkeypatch):
    """The parity row end-to-end on a tiny geometry: export params, shrink
    the synthetic split, score CER + RTFx through the real code path."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    from export_trained_synth import flatten_params

    from opentransformer_tpu.data import synth

    cfg = {
        "type": "speech2text",
        "frontend_type": "conv",
        "frontend": {"input_size": synth.FEAT_DIM, "output_size": 16,
                     "in_channel": 1, "mid_channel": 4, "out_channel": 8,
                     "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
        "encoder_type": "transformer",
        "encoder": {"d_model": 16, "n_heads": 2, "d_ff": 32, "n_blocks": 1,
                    "residual_dropout": 0.0, "activation": "glu"},
        "decoder_type": "transformer",
        "decoder": {"vocab_size": synth.VOCAB_SIZE, "d_model": 16,
                    "n_heads": 2, "d_ff": 32, "memory_dim": 16, "n_blocks": 1,
                    "residual_dropout": 0.0, "activation": "glu",
                    "share_embedding": True},
        "ctc_weight": 0.0, "smoothing": 0.1,
    }
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 64, synth.FEAT_DIM)), jnp.float32)
    mask = length_to_mask(jnp.asarray([64, 64]), 64)
    tgt = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt,
                        jnp.asarray([4, 4], jnp.int32))
    flat = flatten_params(jax.tree_util.tree_map(np.asarray, params))
    npz = tmp_path / "tiny.npz"
    np.savez(npz, **{k: v.astype(np.float16) for k, v in flat.items()})

    # shrink the split so the CPU decode stays fast (4 utts, pad to 128)
    bench._SPLIT_CACHE.pop("v", None)
    monkeypatch.setattr(synth, "SPLIT_SIZES", {**synth.SPLIT_SIZES, "test": 4})

    def tiny_split():
        from opentransformer_tpu.ops.masks import length_to_mask as l2m

        utts = [(u, x[:120], t) for u, x, t in synth.gen_split("test")]
        n = len(utts)
        feats = np.zeros((n, 128, synth.FEAT_DIM), np.float32)
        lengths = np.zeros((n,), np.int32)
        refs = []
        for i, (_, x, toks) in enumerate(utts):
            feats[i, : len(x)] = x
            lengths[i] = len(x)
            refs.append([t + 3 for t in toks])
        return (jnp.asarray(feats), l2m(jnp.asarray(lengths), 128),
                lengths, n, refs, 6)

    monkeypatch.setattr(bench, "test_split", tiny_split)
    out = bench.trained_quality_and_speed(
        str(npz), cfg, enc_dtype="float32", dec_dtype="float32",
        suffix="_x", iters=2, calls=1)
    assert 0.0 <= out["cer_trained_x_pct"] <= 100.0
    assert out["rtfx_trained_x"] > 0
    assert "float32" in out["trained_x_config"]


def test_tracked_anchor_checkpoint_loads():
    """The committed anchor npz (fresh-checkout at-parity headline) must
    verify against its manifest, build its model from the embedded cfg, and
    produce a full param tree the model accepts."""
    if not os.path.exists(bench.ANCHOR_NPZ):
        pytest.skip("anchor npz not present (pre-export tree)")
    ok, status = bench.verify_manifest(bench.ANCHOR_NPZ)
    assert ok, status

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    from export_trained_synth import load_trained_params

    with open(os.path.splitext(bench.ANCHOR_NPZ)[0] + ".manifest.json") as f:
        man = json.load(f)
    model = build_model(man["model_cfg"])
    params = jax.tree_util.tree_map(jnp.asarray,
                                    load_trained_params(bench.ANCHOR_NPZ))
    feats = jnp.zeros((1, 64, 40), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    memory, memory_mask = model.apply(params, feats, mask, method="encode")
    assert memory.shape[0] == 1 and memory.ndim == 3
