"""Parity tests for the fused vocab-projection → log-softmax top-k kernel.

The Pallas kernel (``ops/project_topk.py``) runs in interpret mode on the
CPU test mesh and is checked value- and index-exact against the unfused XLA
semantics (materialized logits → log_softmax → lax.top_k), including the
smallest-index tie-breaking rule. Reference semantics target:
``otrans/recognize/speech2text.py:96-118`` (full-distribution re-rank).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.ops.project_topk import (
    project_logp_topk,
    project_logp_topk_pallas,
    project_logp_topk_xla,
)


def _rand(n, d, v, dtype=jnp.float32, seed=0):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    h = jax.random.normal(k0, (n, d), dtype)
    w = jax.random.normal(k1, (v, d), jnp.float32) * 0.3
    b = jax.random.normal(k2, (v,), jnp.float32) * 0.1
    return h, w, b


@pytest.mark.parametrize(
    "n,d,v,k,block_v",
    [
        (3, 24, 50, 5, 128),     # tiny, single vocab tile, ragged everything
        (17, 64, 700, 5, 256),   # multiple vocab tiles, ragged tail tile
        (16, 32, 260, 1, 128),   # k=1 (greedy path), ragged tail
        (9, 40, 131, 8, 128),    # k>5, vocab just past one tile
    ],
)
def test_pallas_matches_xla(n, d, v, k, block_v):
    h, w, b = _rand(n, d, v)
    ref_vals, ref_idx = project_logp_topk_xla(h, w, b, k)
    vals, idx = project_logp_topk_pallas(
        h, w, b, k, block_rows=8, block_v=block_v, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
    )


def test_tie_breaking_matches_lax_top_k():
    # duplicate logits across vocab-tile boundaries: identical h rows and
    # duplicated weight rows force exact value ties; lax.top_k keeps the
    # smallest index first, and so must the kernel's min-id merge rule.
    n, d, k = 4, 16, 6
    h = jnp.tile(jnp.linspace(-1.0, 1.0, d)[None, :], (n, 1))
    base = jax.random.normal(jax.random.PRNGKey(3), (7, d))
    w = jnp.tile(base, (40, 1))  # V=280: every logit value appears 40×
    b = jnp.zeros((w.shape[0],))
    ref_vals, ref_idx = project_logp_topk_xla(h, w, b, k)
    vals, idx = project_logp_topk_pallas(
        h, w, b, k, block_rows=8, block_v=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
    )


def test_bf16_hidden_states():
    # decode runs the model in bf16; logits/logsumexp must still be f32
    h, w, b = _rand(12, 48, 300, seed=7)
    h16 = h.astype(jnp.bfloat16)
    ref_vals, ref_idx = project_logp_topk_xla(h16, w, b, 5)
    vals, idx = project_logp_topk_pallas(
        h16, w, b, 5, block_rows=8, block_v=128, interpret=True
    )
    assert vals.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-2, atol=1e-2
    )


def test_values_are_normalized_log_probs():
    h, w, b = _rand(5, 32, 120, seed=11)
    logits = h @ w.T + b
    full_logp = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = project_logp_topk_pallas(
        h, w, b, 4, block_rows=8, block_v=128, interpret=True
    )
    picked = jnp.take_along_axis(full_logp, idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(picked),
                               rtol=1e-5, atol=1e-5)
    # descending order
    dv = np.asarray(vals)
    assert (np.diff(dv, axis=1) <= 1e-6).all()


def test_dispatch_uses_xla_off_tpu():
    h, w, b = _rand(4, 16, 64, seed=2)
    vals, idx = project_logp_topk(h, w, b, 3)  # CPU backend → XLA path
    ref_vals, ref_idx = project_logp_topk_xla(h, w, b, 3)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))


def _tiny_ctc(lookahead_steps=0, seed=0, b=2, t=40):
    from opentransformer_tpu.models.registry import build_model

    cfg = {
        "type": "ctc",
        "frontend_type": "conv",
        "frontend": {"input_size": 20, "output_size": 24, "dropout": 0.0},
        "encoder_type": "transformer",
        "encoder": {"d_model": 24, "n_heads": 2, "d_ff": 32, "n_blocks": 1,
                    "residual_dropout": 0.0, "attention_dropout": 0.0,
                    "ffn_dropout": 0.0, "activation": "relu"},
        "vocab_size": 20, "lookahead_steps": lookahead_steps,
    }
    model = build_model(cfg)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(b, t, 20)), jnp.float32)
    mask = jnp.ones((b, t), bool)
    tgt = jnp.ones((b, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats, mask, tgt,
                        jnp.asarray([5] * b))
    return model, params, feats, mask


@pytest.mark.parametrize("lookahead", [0, 2])
def test_ctc_recognize_argmax_matches_logits(lookahead):
    """CTCModel.recognize_argmax (fused top-1) == argmax(recognize_logits),
    including through the look-ahead conv; project_topk values must equal the
    normalized log-probs of the picked ids."""
    model, params, feats, mask = _tiny_ctc(lookahead)
    logp, m1 = model.apply(params, feats, mask, method="recognize_logits")
    ids, m2 = model.apply(params, feats, mask, method="recognize_argmax")
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(jnp.argmax(logp, axis=-1)))

    vals, idx = model.apply(
        params, feats, mask, 3,
        method=lambda mdl, f, mk, k: mdl.assistor.project_topk(
            mdl.encode(f, mk)[0], k))
    ref_vals, ref_idx = jax.lax.top_k(logp, 3)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)


def test_ctc_assistor_param_paths_stable():
    """The setup-style CTCAssistor must keep the historical param paths
    (checkpoint/compat contract): ctc/output_layer/dense and
    ctc/look_ahead_conv."""
    _, params, _, _ = _tiny_ctc(lookahead_steps=2)
    p = params["params"]["ctc"]
    assert "kernel" in p["output_layer"]["dense"]
    assert "bias" in p["output_layer"]["dense"]
    assert "kernel" in p["look_ahead_conv"]


# ---------------------------------------------------------------------------
# two-head (shallow LM fusion) kernel
# ---------------------------------------------------------------------------


def _rand2(n, d1, d2, v, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    h1 = jax.random.normal(ks[0], (n, d1), dtype)
    w1 = jax.random.normal(ks[1], (v, d1), jnp.float32) * 0.3
    b1 = jax.random.normal(ks[2], (v,), jnp.float32) * 0.1
    h2 = jax.random.normal(ks[3], (n, d2), dtype)
    w2 = jax.random.normal(ks[4], (v, d2), jnp.float32) * 0.3
    b2 = jax.random.normal(ks[5], (v,), jnp.float32) * 0.1
    return h1, w1, b1, h2, w2, b2


@pytest.mark.parametrize(
    "n,d1,d2,v,k,lam",
    [
        (3, 24, 16, 50, 5, 0.3),    # tiny, ragged everything, D1 != D2
        (17, 64, 32, 700, 5, 0.1),  # multiple vocab tiles
        (9, 40, 40, 131, 8, 1.0),   # k>5, lam=1
    ],
)
def test_project2_pallas_matches_xla(n, d1, d2, v, k, lam):
    from opentransformer_tpu.ops.project_topk import (
        project2_logp_topk_pallas,
        project2_logp_topk_xla,
    )

    args = _rand2(n, d1, d2, v)
    ref_vals, ref_idx = project2_logp_topk_xla(*args, lam, k)
    vals, idx = project2_logp_topk_pallas(
        *args, lam, k, block_rows=8, block_v=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)


def test_project2_values_are_combined_log_probs():
    from opentransformer_tpu.ops.project_topk import project2_logp_topk_pallas

    h1, w1, b1, h2, w2, b2 = _rand2(5, 32, 24, 120, seed=5)
    lam = 0.25
    lp1 = jax.nn.log_softmax(h1 @ w1.T + b1, axis=-1)
    lp2 = jax.nn.log_softmax(h2 @ w2.T + b2, axis=-1)
    combined = lp1 + lam * lp2
    vals, idx = project2_logp_topk_pallas(
        h1, w1, b1, h2, w2, b2, lam, 4, block_rows=8, block_v=128,
        interpret=True)
    picked = jnp.take_along_axis(combined, idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(picked),
                               rtol=1e-5, atol=1e-5)
    dv = np.asarray(vals)
    assert (np.diff(dv, axis=1) <= 1e-6).all()


def test_project2_dispatch_uses_xla_off_tpu():
    from opentransformer_tpu.ops.project_topk import (
        project2_logp_topk,
        project2_logp_topk_xla,
    )

    args = _rand2(4, 16, 16, 64, seed=3)
    vals, idx = project2_logp_topk(*args, 0.5, 3)  # CPU backend → XLA path
    ref_vals, ref_idx = project2_logp_topk_xla(*args, 0.5, 3)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))


def test_ctc_recognize_topk_matches_logits():
    """CTCModel.recognize_topk == lax.top_k over recognize_logits plus the
    exact blank log-prob column (the sparse prefix-beam device contract)."""
    model, params, feats, mask = _tiny_ctc(lookahead_steps=2)
    logp, m1 = model.apply(params, feats, mask, method="recognize_logits")
    vals, ids, blank_lp, m2 = model.apply(params, feats, mask, 7,
                                          method="recognize_topk")
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    ref_vals, ref_ids = jax.lax.top_k(logp, 7)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(blank_lp), np.asarray(logp[..., 0]),
                               rtol=1e-5, atol=1e-5)


def test_with_lse_output():
    from opentransformer_tpu.ops.project_topk import (
        project_logp_topk_pallas,
        project_logp_topk_xla,
    )

    h, w, b = _rand(9, 40, 150, seed=13)
    logits = h @ w.T + b
    ref_lse = jax.nn.logsumexp(logits, axis=-1)
    for fn, kw in ((project_logp_topk_pallas,
                    dict(block_rows=8, block_v=128, interpret=True)),
                   (project_logp_topk_xla, {})):
        vals, idx, lse = fn(h, w, b, 4, with_lse=True, **kw)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                                   rtol=1e-5, atol=1e-5)


def test_randomized_shape_sweep():
    """Fuzz the kernel over random (n, d, v, k, block) geometries in
    interpret mode — alignment edge cases (v on a tile boundary, n=1,
    k near v, ragged d) must all match the XLA reference exactly."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        n = int(rng.integers(1, 40))
        d = int(rng.integers(8, 96))
        block_v = int(rng.choice([128, 256]))
        # mix ragged tails with exact tile boundaries
        v = block_v if trial % 4 == 0 else int(rng.integers(33, 700))
        k = int(min(rng.integers(1, 17), v))
        h, w, b = _rand(n, d, v, seed=trial)
        ref_vals, ref_idx = project_logp_topk_xla(h, w, b, k)
        vals, idx = project_logp_topk_pallas(
            h, w, b, k, block_rows=8, block_v=block_v, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx),
                                      err_msg=f"trial {trial}: n={n} d={d} v={v} k={k} bv={block_v}")
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                                   rtol=1e-5, atol=1e-5)
