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
