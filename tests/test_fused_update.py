"""Fused flat-buffer update (train.fused_update) parity vs the default
per-leaf optax path.

The fused path ravels grads/params once and runs clip + weight decay + Adam
+ the parameter add as a handful of large vector fusions
(trainer._build_update_fn_fused) — the math must be bit-for-bit the same
recipe as optax.chain(add_decayed_weights, scale_by_adam) with -lr scaling
(torch-Adam semantics, reference otrans/train/scheduler.py), so trained
params must agree to f32 reduction-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.train.trainer import Trainer
from tests.test_models import small_model_cfg
from tests.test_train import synth_batch

# eps damps Adam's near-zero-gradient amplification: the fused and default
# programs round the clip global-norm differently (flat concat-reduce vs
# per-leaf), and with eps→0 the mhat/sqrt(vhat) ratio at near-zero-grad
# elements turns ulp-level input drift into O(lr) output drift. The MATH
# parity at tiny eps is covered by test_fused_update_math_exact.
TCFG = {
    "optimizer_type": "adam",
    "optimizer": {"betas": [0.9, 0.98], "eps": 1e-4, "weight_decay": 1e-6},
    "scheduler_type": "constant",
    "scheduler": {"lr": 1e-3},
    "epochs": 1,
    "clip_grad": 5.0,
}


def _no_dropout_model():
    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "residual_dropout": 0.0}
    cfg["frontend"] = {**cfg["frontend"], "dropout": 0.0}
    cfg["decoder"] = {**cfg["decoder"], "residual_dropout": 0.0}
    return build_model(cfg)


def _train(model, batches, extra):
    tr = Trainer({**TCFG, **extra}, model, log_interval=10 ** 9)
    state = tr.init_state(jax.random.PRNGKey(0), batches[0])
    state = tr.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
    return tr, state


def test_fused_update_matches_default():
    """5 updates with clip + weight decay: fused params == per-leaf params.

    Tolerances follow test_steps_per_exec_matches_single_step: the two
    programs compile differently (flat concat-reduce vs per-leaf global
    norm), so f32 reduction-order drift compounds through Adam's
    normalization; the update MATH itself is 1-ulp identical (verified with
    fixed synthetic grads below in test_fused_update_math_exact)."""
    model = _no_dropout_model()
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(5)]
    _, s_ref = _train(model, batches, {})
    _, s_fused = _train(model, batches, {"fused_update": True})
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_ref.params),
        jax.tree_util.tree_leaves_with_path(s_fused.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(k),
        )
    # flat moments carry the full parameter count
    n = sum(x.size for x in jax.tree_util.tree_leaves(s_fused.params["params"]))
    assert s_fused.opt_state.mu.shape == (n,)
    assert int(s_fused.opt_state.count) == 5


def test_fused_update_math_exact():
    """With FIXED synthetic grads (no model in the loop) the fused update
    reproduces optax.chain(add_decayed_weights, scale_by_adam) + clip to
    1 ulp over 10 compounding steps."""
    from opentransformer_tpu.train.scheduler import build_optimizer

    params = {"a": jnp.asarray(np.random.default_rng(0).normal(size=(17,)), jnp.float32),
              "b": jnp.asarray(np.random.default_rng(1).normal(size=(3, 5)), jnp.float32)}
    grads = {"a": jnp.asarray(np.random.default_rng(2).normal(size=(17,)), jnp.float32),
             "b": jnp.asarray(np.random.default_rng(3).normal(size=(3, 5)), jnp.float32)}
    ocfg = {"betas": [0.9, 0.98], "eps": 1e-9, "weight_decay": 1e-6}
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    trs = []
    for fused in (False, True):
        tr = Trainer.__new__(Trainer)
        tr.pp_schedule = "sharded"
        tr.mesh = None
        tr.opt_cfg = ocfg
        tr.opt_type = "adam"
        tr.fused_update = fused
        tr.grad_clip = 5.0
        tr.grad_noise = 0.0
        tr.accum_steps = 1
        tr.tx = build_optimizer(ocfg, "adam")
        trs.append(tr)
    tr_ref, tr_fused = trs

    v1, v2 = {"params": copy(params)}, {"params": copy(params)}
    o1 = tr_ref.tx.init(v1["params"])
    o2 = tr_fused._init_flat_opt_state(v2["params"])
    u1, u2 = tr_ref._build_update_fn(), tr_fused._build_update_fn()
    ns, key = jnp.zeros((), jnp.int32), jax.random.PRNGKey(0)
    for _ in range(10):
        v1, o1, _, gn1 = u1(v1, o1, copy(grads), ns, 1e-3, key)
        v2, o2, _, gn2 = u2(v2, o2, copy(grads), ns, 1e-3, key)
        grads = jax.tree_util.tree_map(lambda g: g * 0.9, grads)
    # reduction-order tolerance, not bitwise identity: the two programs sum
    # squares per-leaf vs over one flat concat, so other backends/XLA
    # versions may differ by a few ulps (ADVICE r3)
    np.testing.assert_allclose(float(gn1), float(gn2), rtol=1e-6)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v1),
        jax.tree_util.tree_leaves_with_path(v2),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-8,
                                   err_msg=jax.tree_util.keystr(k))


def test_fused_update_multi_step_scan():
    """steps_per_exec=2 threads the fused core through the scanned
    multi-step program (the scan body IS the fused update core)."""
    model = _no_dropout_model()
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(4)]
    _, s_ref = _train(model, batches, {"fused_update": True})
    _, s_scan = _train(model, batches, {"fused_update": True, "steps_per_exec": 2})
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_ref.params),
        jax.tree_util.tree_leaves_with_path(s_scan.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(k),
        )


def test_fused_update_nan_skip():
    """A non-finite grad norm skips the update: params, moments and count
    untouched; nan_skips incremented — same contract as the default path."""
    model = _no_dropout_model()
    batch = synth_batch(np.random.default_rng(0), b=4)
    tr = Trainer({**TCFG, "fused_update": True}, model, log_interval=10 ** 9)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    tr._grad_fn = tr._build_grad_fn()
    update_fn = tr._build_update_fn()
    bad = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, jnp.nan, jnp.float32), state.params["params"]
    )
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    new_vars, new_opt, nan_skips, gnorm = update_fn(
        copy(state.params), copy(state.opt_state), bad, state.nan_skips, 1e-3,
        jax.random.PRNGKey(2),
    )  # copies: the jitted update donates params/opt_state
    assert int(nan_skips) == 1 and not bool(jnp.isfinite(gnorm))
    assert int(new_opt.count) == 0
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(new_vars),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))


def test_fused_update_adam_m_dtype_bf16():
    """adam_m_dtype=bfloat16 stores the flat first moment in bf16."""
    model = _no_dropout_model()
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(2)]
    extra = {"fused_update": True,
             "optimizer": {**TCFG["optimizer"], "adam_m_dtype": "bfloat16"}}
    _, state = _train(model, batches, extra)
    assert state.opt_state.mu.dtype == jnp.bfloat16
    assert state.opt_state.nu.dtype == jnp.float32


def test_fused_update_rejects_model_sharding():
    """The flat buffer cannot respect per-leaf tp/pp/ep shardings."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(n_data=1, n_model=2)
    model = _no_dropout_model()
    with pytest.raises(ValueError, match="fused_update"):
        Trainer({**TCFG, "fused_update": True}, model, mesh=mesh,
                log_interval=10 ** 9)


def test_fused_update_grad_noise_runs():
    """grad_noise > 0 composes (distribution-level check only: one flat key
    instead of per-leaf keys)."""
    model = _no_dropout_model()
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(2)]
    _, state = _train(model, batches, {"fused_update": True, "grad_noise": 0.01})
    for x in jax.tree_util.tree_leaves(state.params):
        assert bool(jnp.all(jnp.isfinite(x)))
