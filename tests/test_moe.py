"""MoE FFN + expert parallelism (beyond-reference: SURVEY §2.3 'EP: absent')."""

import jax
import jax.numpy as jnp
import numpy as np

from opentransformer_tpu.models.modules import MoEFeedForward, PositionwiseFeedForward


def test_single_expert_equals_dense_ffn():
    """n_experts=1, capacity=T: MoE must reduce exactly to the dense FFN
    (softmax over one expert = gate 1.0, nothing dropped)."""
    d, ff, t = 16, 32, 12
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, t, d)), jnp.float32)
    moe = MoEFeedForward(d, ff, n_experts=1, top_k=1, capacity_factor=1.0,
                         activation="glu")
    dense = PositionwiseFeedForward(d, ff, activation="glu")
    pm = moe.init(jax.random.PRNGKey(0), x)
    pd = dense.init(jax.random.PRNGKey(1), x)
    # copy expert-0 weights into the dense FFN layout
    pd = {"params": {
        "w1": {"dense": {"kernel": pm["params"]["w1"][0], "bias": pm["params"]["b1"][0]}},
        "w2": {"dense": {"kernel": pm["params"]["w2"][0], "bias": pm["params"]["b2"][0]}},
    }}
    y_moe, aux = moe.apply(pm, x)
    y_dense = dense.apply(pd, x)
    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)  # E*f*P = 1*1*1


def test_capacity_drops_pass_zero():
    """Force all tokens to expert 0 with tiny capacity: tokens beyond the
    capacity produce zero output (residual pass-through at the call site)."""
    d, ff, t = 8, 16, 10
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, t, d)), jnp.float32)
    moe = MoEFeedForward(d, ff, n_experts=4, top_k=1, capacity_factor=0.4)
    p = moe.init(jax.random.PRNGKey(0), x)
    # router kernel/bias that always picks expert 0
    p = jax.tree_util.tree_map(np.array, p)
    p["params"]["router"]["dense"]["kernel"] = np.zeros((8, 4), np.float32)
    p["params"]["router"]["dense"]["bias"] = np.array([10.0, 0, 0, 0], np.float32)
    y, aux = moe.apply(jax.tree_util.tree_map(jnp.asarray, p), x)
    cap = max(int(np.ceil(t * 0.4 / 4)), 1)
    y = np.asarray(y)
    assert np.all(np.abs(y[0, :cap]) > 0)          # kept tokens computed
    np.testing.assert_allclose(y[0, cap:], 0.0)    # dropped tokens zero


def test_top2_gates_and_grads():
    """top-2: finite output, aux > 0, gradients reach router and experts."""
    d, ff = 12, 24
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 9, d)), jnp.float32)
    moe = MoEFeedForward(d, ff, n_experts=4, top_k=2, capacity_factor=2.0)
    p = moe.init(jax.random.PRNGKey(3), x)

    def loss(p):
        y, aux = moe.apply(p, x)
        return jnp.sum(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(p)["params"]
    assert np.all(np.isfinite(np.asarray(loss(p))))
    for path in ("router", "w1", "w2"):
        leaf = g[path]["dense"]["kernel"] if path == "router" else g[path]
        assert float(jnp.max(jnp.abs(leaf))) > 0, path


def test_top1_router_gets_main_loss_gradient():
    """Switch top-1: the gate is the raw router prob, so the router must
    receive gradient from the task loss alone (no aux term)."""
    d, ff = 12, 24
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 9, d)), jnp.float32)
    moe = MoEFeedForward(d, ff, n_experts=4, top_k=1, capacity_factor=2.0)
    p = moe.init(jax.random.PRNGKey(5), x)

    def task_loss(p):
        y, _ = moe.apply(p, x)
        return jnp.sum(y ** 2)

    g = jax.grad(task_loss)(p)["params"]["router"]["dense"]["kernel"]
    assert float(jnp.max(jnp.abs(g))) > 0


def test_moe_encoder_trains_on_ep_mesh():
    """(data x model x expert) mesh: expert params shard over 'expert',
    the MoE aux loss reaches the training loss, and a step runs finite."""
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh
    from opentransformer_tpu.train.trainer import Trainer
    from tests.test_models import small_model_cfg
    from tests.test_train import synth_batch

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "moe_experts": 4, "moe_top_k": 2,
                      "moe_capacity_factor": 2.0}
    model = build_model(cfg)
    mesh = make_mesh(n_data=2, n_model=2, n_expert=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "expert": 2}

    batch = synth_batch(np.random.default_rng(0), b=4)
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1}
    trainer = Trainer(tcfg, model, mesh=mesh, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    w1 = state.params["params"]["encoder"]["block_0"]["moe"]["w1"]
    assert tuple(w1.sharding.spec) == ("expert", None, "model"), w1.sharding.spec

    # aux losses surface in the model output dict
    loss, aux = model.apply(state.params, *trainer.batch_fn(batch))
    assert "moe_aux" in aux and np.isfinite(float(aux["moe_aux"]))

    state = trainer.train_one_epoch(0, state, [batch], jax.random.PRNGKey(1))
    loss2, _ = model.apply(state.params, *trainer.batch_fn(batch))
    assert np.isfinite(float(loss2))


def test_moe_scan_layers_and_moe_every():
    """scan_layers stacks MoE blocks ([L, E, ...] params); moe_every=2 in
    unstacked mode alternates dense/MoE blocks."""
    from opentransformer_tpu.models.registry import build_model
    from tests.test_models import small_model_cfg
    from tests.test_train import synth_batch
    from opentransformer_tpu.train.trainer import default_speech_batch

    args = default_speech_batch(synth_batch(np.random.default_rng(0), b=2))

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "moe_experts": 2, "scan_layers": True}
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), *args)
    w1 = v["params"]["encoder"]["blocks"]["moe"]["w1"]
    assert w1.shape[:2] == (2, 2)  # [L, E, ...]
    loss, aux = model.apply(v, *args)
    assert "moe_aux" in aux and np.isfinite(float(loss))

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "moe_experts": 2, "moe_every": 2}
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), *args)
    enc = v["params"]["encoder"]
    assert "moe" in enc["block_1"] and "moe" not in enc["block_0"]
    assert "ffn" in enc["block_0"]
    loss, aux = model.apply(v, *args)
    assert np.isfinite(float(loss))


def test_conformer_moe():
    """Conformer: the second macaron FFN becomes an MoE (moe_every honored);
    aux loss reaches the model output; streaming guard refuses MoE blocks."""
    import pytest
    from opentransformer_tpu.models.registry import build_model
    from tests.test_models import small_model_cfg
    from tests.test_train import synth_batch
    from opentransformer_tpu.train.trainer import default_speech_batch

    args = default_speech_batch(synth_batch(np.random.default_rng(0), b=2))
    cfg = small_model_cfg(encoder_type="conformer")
    cfg["encoder"] = {**cfg["encoder"], "moe_experts": 2, "moe_every": 2,
                      "moe_capacity_factor": 2.0}
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), *args)
    enc = v["params"]["encoder"]
    assert "moe" in enc["block_1"] and "moe" not in enc["block_0"]
    assert "post_ffn" in enc["block_0"]
    loss, aux = model.apply(v, *args)
    assert "moe_aux" in aux and np.isfinite(float(loss))

    def task_loss(p):
        l, _ = model.apply(p, *args)
        return l

    g = jax.grad(task_loss)(v)["params"]["encoder"]["block_1"]["moe"]
    assert float(jnp.max(jnp.abs(g["w1"]))) > 0

    # MoE conformers stream (parity in test_online.py:
    # test_streaming_moe_encoder_matches_batch); a capacity factor below the
    # drop-free bound n_experts/top_k only warns (streamed chunks can then
    # diverge from batch when capacity binds)
    from opentransformer_tpu.models.encoder import ConformerEncoder
    stream = ConformerEncoder(d_model=32, n_heads=2, d_ff=64, nblocks=2,
                              chunk_size=4, left_chunks=2, conv_causal=True,
                              relative_positional=False, moe_experts=2)
    cache = stream.init_stream_cache(1)  # warns (1.25 < 2.0), must not raise
    assert len(cache) == 2  # one carried cache entry per block

    # ref_compat has no post-FFN to host the MoE
    cfg["encoder"] = {**cfg["encoder"], "ref_compat": True, "moe_every": 1}
    with pytest.raises(ValueError):
        build_model(cfg).init(jax.random.PRNGKey(0), *args)


def test_pad_mask_excludes_pads_from_capacity():
    """Padded positions must not claim expert capacity or skew the aux
    stats: with pads ahead of real tokens and capacity for only the real
    ones, masked dispatch keeps every real token."""
    d, ff, t = 8, 16, 8
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, t, d)), jnp.float32)
    moe = MoEFeedForward(d, ff, n_experts=2, top_k=1, capacity_factor=1.0)
    p = moe.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(np.array, p)
    p["params"]["router"]["dense"]["kernel"] = np.zeros((8, 2), np.float32)
    p["params"]["router"]["dense"]["bias"] = np.array([10.0, 0], np.float32)
    p = jax.tree_util.tree_map(jnp.asarray, p)
    # cap = ceil(8 * 1.0 / 2) = 4; first 4 positions are "pads"
    mask = jnp.asarray([[False] * 4 + [True] * 4])

    y_nomask, _ = moe.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_nomask)[0, 4:], 0.0)  # real tokens dropped!

    y, aux = moe.apply(p, x, pad_mask=mask)
    y = np.asarray(y)
    np.testing.assert_allclose(y[0, :4], 0.0)      # pads produce zero
    assert np.all(np.abs(y[0, 4:]) > 0)            # all real tokens kept
    # all (valid) first choices on expert 0 with prob ~1 -> aux ~= E * 1 * 1
    np.testing.assert_allclose(float(aux), 2.0, rtol=1e-3)


# ---------------------------------------------------------------------------
# MoE language models
# ---------------------------------------------------------------------------

def test_moe_transformer_lm_loss_and_aux():
    """moe_experts>0 on the transformer LM: the load-balance aux reaches the
    training loss, and PAD tokens are gated out of dispatch."""
    from opentransformer_tpu.models.lm import TransformerLanguageModel

    model = TransformerLanguageModel(
        vocab_size=20, num_blocks=2, d_model=32, n_heads=2, d_ff=64,
        residual_dropout=0.0, moe_experts=2, moe_top_k=2, moe_aux_weight=0.05,
    )
    rng = np.random.default_rng(0)
    src = np.asarray(rng.integers(3, 20, (3, 7)), np.int32)
    src[1, 5:] = 0  # PAD tail
    src = jnp.asarray(src)
    tgt = jnp.asarray(rng.integers(3, 20, (3, 7)), jnp.int32)
    lens = jnp.asarray([7, 5, 7])
    params = model.init(jax.random.PRNGKey(0), src, tgt, lens)
    loss, aux = model.apply(params, src, tgt, lens)
    assert np.isfinite(float(loss))
    assert "moe_aux" in aux and float(aux["moe_aux"]) > 0
    # the aux term is differentiable into the router
    g = jax.grad(lambda p: model.apply(p, src, tgt, lens)[0])(params)
    rk = g["params"]["block_0"]["moe"]["router"]["dense"]["kernel"]
    assert float(jnp.max(jnp.abs(rk))) > 0


def test_moe_transformer_lm_cached_decode_parity():
    """With drop-free capacity (cf*k/e >= 1 -> cap = T), the KV-cached
    decode_step must reproduce the full-prefix log-probs: routing is
    per-token, so a length-1 step sees the same experts and gates."""
    from opentransformer_tpu.models.lm import TransformerLanguageModel

    model = TransformerLanguageModel(
        vocab_size=20, num_blocks=2, d_model=32, n_heads=2, d_ff=64,
        residual_dropout=0.0, moe_experts=2, moe_top_k=2,
        moe_capacity_factor=1.0,
    )
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(1, 20, (3, 6)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, tokens, jnp.asarray([6] * 3))

    full_logp = jax.nn.log_softmax(model.apply(params, tokens, method="logits"), axis=-1)

    cache = model.apply(params, 3, 6, method="init_cache")
    outs = []
    for i in range(6):
        logp, cache = model.apply(params, tokens[:, i], cache, jnp.asarray(i),
                                  method="decode_step")
        outs.append(logp)
    step_logp = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full_logp), np.asarray(step_logp),
                               rtol=2e-4, atol=2e-4)


def test_moe_lm_trains_on_ep_mesh():
    """LM MoE params shard over the 'expert' axis and a Trainer step runs."""
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh
    from opentransformer_tpu.train.trainer import Trainer, lm_batch

    cfg = {"type": "transformer_lm", "vocab_size": 20, "num_blocks": 2,
           "d_model": 32, "n_heads": 2, "d_ff": 64, "residual_dropout": 0.0,
           "moe_experts": 2, "moe_top_k": 1, "moe_capacity_factor": 2.0}
    model = build_model(cfg)
    mesh = make_mesh(n_data=2, n_model=2, n_expert=2)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(3, 20, (4, 7)), jnp.int32)
    tgt = jnp.asarray(rng.integers(3, 20, (4, 7)), jnp.int32)
    batch = (None, {"inputs": src},
             {"targets": tgt, "targets_length": jnp.asarray([7] * 4)})
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1}
    trainer = Trainer(tcfg, model, mesh=mesh, log_interval=10 ** 9, batch_fn=lm_batch)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    w1 = state.params["params"]["block_0"]["moe"]["w1"]
    assert tuple(w1.sharding.spec) == ("expert", None, "model"), w1.sharding.spec

    state = trainer.train_one_epoch(0, state, [batch], jax.random.PRNGKey(1))
    loss, aux = model.apply(state.params, *trainer.batch_fn(batch))
    assert np.isfinite(float(loss)) and "moe_aux" in aux
