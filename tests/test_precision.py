"""Precision-drift regression: flagship-geometry train steps, f32 vs bf16.

VERDICT r3 #8: the r3 flagship collapse implicated (but never isolated)
``train.dtype: bfloat16``. This test runs a handful of real train steps at
the REAL flagship geometry (d256 / 12L enc / 6L dec / 2048 FFN / vocab 4233,
``__graft_entry__.FLAGSHIP_MODEL_CFG``) in f32 and bf16 from identical f32
master params with identical batches, and asserts bounded divergence of the
losses and gradient norms — the class of failure that would make bf16
training collapse while f32 learns. The reference trains f32-only
(``otrans/train/trainer.py``, apex flags vestigial per SURVEY §2.3), so this
guards a TPU-only design choice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.models import build_model
from opentransformer_tpu.ops.masks import length_to_mask
from opentransformer_tpu.train.trainer import global_norm


def _flagship_cfg():
    import __graft_entry__ as ge

    return dict(ge.FLAGSHIP_MODEL_CFG, ctc_weight=0.3)


def _batch(seed, b=2, t=192, f=40, u=18, vocab=300):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    lengths = np.array([t, t - 32], np.int32)[:b]
    # collate contract: BOS + y + EOS + PAD, targets_length = len(y) + 1
    tgt = np.ones((b, u + 2), np.int64)
    for i in range(b):
        n = u - 2 * i
        tgt[i, 1 : 1 + n] = rng.integers(3, vocab, size=n)
        tgt[i, 1 + n] = 1
        tgt[i, 2 + n :] = 0
    tlen = np.array([u + 1 - 2 * i for i in range(b)], np.int32)
    return (
        jnp.asarray(feats),
        length_to_mask(jnp.asarray(lengths), t),
        jnp.asarray(tgt),
        jnp.asarray(tlen),
    )


@pytest.mark.slow
def test_flagship_f32_bf16_train_step_drift():
    cfg = _flagship_cfg()
    model_f32 = build_model(cfg, dtype=jnp.float32)
    model_bf16 = build_model(cfg, dtype=jnp.bfloat16)

    init_batch = _batch(0)
    params = model_f32.init(jax.random.PRNGKey(0), *init_batch)
    # flax `dtype` is COMPUTE dtype only — params are f32 masters either way
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(params)
    )

    import optax

    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(3e-4, b1=0.9, b2=0.98, eps=1e-9),
    )

    def make_step(model):
        def loss_fn(p, batch):
            loss, _aux = model.apply(p, *batch, train=False)
            return loss

        @jax.jit
        def step(p, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            gnorm = global_norm(grads)
            updates, opt_state = tx.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return p, opt_state, loss, gnorm, global_norm(updates)

        return step

    step32, step16 = make_step(model_f32), make_step(model_bf16)
    p32 = p16 = params
    s32 = s16 = tx.init(params)

    for i in range(3):
        batch = _batch(i + 1)
        p32, s32, loss32, g32, u32 = step32(p32, s32, batch)
        p16, s16, loss16, g16, u16 = step16(p16, s16, batch)
        loss32, loss16 = float(loss32), float(loss16)
        g32, g16 = float(g32), float(g16)
        assert np.isfinite([loss32, loss16, g32, g16]).all(), (
            f"step {i}: non-finite (loss {loss32}/{loss16}, gnorm {g32}/{g16})"
        )
        # bf16 has f32's exponent range; only mantissa precision differs —
        # a few steps from identical params must track closely
        assert abs(loss16 - loss32) / abs(loss32) < 0.05, (
            f"step {i}: loss drift f32={loss32} bf16={loss16}"
        )
        assert 0.5 < g16 / g32 < 2.0, (
            f"step {i}: grad-norm drift f32={g32} bf16={g16}"
        )
        assert 0.5 < float(u16) / float(u32) < 2.0, (
            f"step {i}: update-norm drift f32={float(u32)} bf16={float(u16)}"
        )

    # param drift after 3 steps stays small relative to param scale
    d = global_norm(jax.tree_util.tree_map(lambda a, b: a - b, p32, p16))
    scale = global_norm(p32)
    assert float(d) / float(scale) < 0.01, (
        f"param drift {float(d)} vs scale {float(scale)}"
    )
