"""Training runtime tests: schedulers, loss decrease on a mesh, checkpointing."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.masks import length_to_mask
from opentransformer_tpu.parallel.mesh import make_mesh
from opentransformer_tpu.train.scheduler import build_scheduler
from opentransformer_tpu.train.trainer import Trainer
from tests.test_models import small_model_cfg, VOCAB


def test_noam_schedule():
    s = build_scheduler({"model_size": 256, "warmup_steps": 100, "factor": 1.0}, "transformer")
    # reference formula: factor * d^-0.5 * min(step^-0.5, step*warmup^-1.5)
    for step in (1, 10, 100, 1000):
        expect = 256 ** -0.5 * min(step ** -0.5, step * 100 ** -1.5)
        assert math.isclose(s(step, 0), expect)
    # peak at warmup boundary
    assert s(100, 0) >= s(50, 0) and s(100, 0) >= s(200, 0)


def test_linear_and_exp_schedules():
    s = build_scheduler({"final_step": 10, "start_lr": 1.0, "final_lr": 0.0}, "step-linear")
    assert math.isclose(s(0, 0), 1.0) and math.isclose(s(5, 0), 0.5) and math.isclose(s(20, 0), 0.0)
    s = build_scheduler({"final_epoch": 4, "start_lr": 0.4, "final_lr": 0.0}, "epoch-linear")
    assert math.isclose(s(0, 2), 0.2)
    s = build_scheduler({"init_lr": 0.5, "decay_factor": 1.1, "min_lr": 1e-6}, "step-exp")
    v1, v2 = s(1, 0), s(2, 0)
    assert v2 < v1 < 0.5


def test_stateful_schedules_are_pure_and_resume_safe():
    """step-exp and linear-warmup-exp-decay were recurrences on captured
    state; as pure functions of (step, epoch) a resume at step 50 must
    reproduce the exact lr sequence of an uninterrupted run."""
    configs = [
        ("step-exp", {"init_lr": 0.5, "decay_factor": 1.1, "min_lr": 1e-2}),
        ("step-exp", {"init_lr": 1e-8, "decay_factor": 1.1, "min_lr": 1e-6}),  # clamp binds
        ("linear-warmup-exp-decay",
         {"warmup_steps": 10, "decay_start": 20, "peak_lr": 0.4,
          "final_lr": 1e-4, "decay_factor": 0.9}),
    ]
    for sched_type, cfg in configs:
        full = build_scheduler(cfg, sched_type)
        seq = [full(step, 0) for step in range(100)]
        resumed = build_scheduler(cfg, sched_type)  # fresh instance at step 50
        for step in range(50, 100):
            assert math.isclose(resumed(step, 0), seq[step]), (sched_type, step)
        # calling out of order / repeatedly must not change results
        assert math.isclose(full(3, 0), seq[3]) and math.isclose(full(3, 0), seq[3])

    # closed form matches the literal reference recurrence lr<-max(lr^d, m):
    # the trainer's first update is global_step=1 = one decay application
    for init, d, m in [(0.5, 1.1, 1e-2), (0.5, 1.1, 0.3), (1e-8, 1.1, 1e-6),
                       (1e-8, 0.5, 1e-6), (0.3, 0.9, 1e-4)]:
        s = build_scheduler({"init_lr": init, "decay_factor": d, "min_lr": m}, "step-exp")
        lr = init
        for step in range(1, 41):
            lr = max(lr ** d, m)
            assert math.isclose(s(step, 0), lr, rel_tol=1e-12), (init, d, m, step)


def synth_batch(rng, b=8, t=33, f=20, u=6):
    feats = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    mask = length_to_mask(jnp.asarray([t] * b), t)
    tgt = np.zeros((b, u + 2), np.int32)
    for i in range(b):
        tgt[i, 0] = 1
        tgt[i, 1 : u + 1] = rng.integers(3, VOCAB, u)
        tgt[i, u + 1] = 1
    inputs = {"inputs": feats, "mask": mask}
    targets = {"targets": jnp.asarray(tgt), "targets_length": jnp.asarray([u + 1] * b)}
    return (None, inputs, targets)


def test_train_loss_decreases_on_mesh():
    """Full jitted train loop on a 4x2 (data x model) virtual mesh."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = build_model(small_model_cfg())
    train_cfg = {
        "optimizer_type": "adam",
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98], "eps": 1e-9, "weight_decay": 1e-6},
        "scheduler_type": "constant",
        "scheduler": {"lr": 1e-3},
        "clip_grad": 5,
        "accum_steps": 2,
        "epochs": 1,
    }
    trainer = Trainer(train_cfg, model, mesh=mesh, log_interval=1000)
    rng = np.random.default_rng(0)
    batches = [synth_batch(rng) for _ in range(2)]
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])

    losses = []
    key = jax.random.PRNGKey(1)
    for it in range(12):
        # measure loss on fixed batch before update
        args = trainer.batch_fn(batches[0])
        loss, _ = model.apply(state.params, *args)
        losses.append(float(loss))
        state = trainer.train_one_epoch(it, state, batches, key)
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.nan_skips) == 0


def test_checkpoint_roundtrip_and_average(tmp_path):
    from opentransformer_tpu.train.checkpoint import Checkpointer
    from opentransformer_tpu.train.trainer import TrainState

    model = build_model(small_model_cfg())
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, b=2)
    train_cfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
                 "scheduler": {"lr": 1e-3}, "epochs": 1}
    trainer = Trainer(train_cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    ck = Checkpointer(str(tmp_path / "exp"), config={"model": {"type": "speech2text"}})
    for epoch in range(4):
        scaled = TrainState(
            params=jax.tree_util.tree_map(lambda x: x + epoch, state.params),
            opt_state=state.opt_state,
            nan_skips=state.nan_skips,
        )
        ck.save(epoch, scaled, extra={"global_step": epoch * 10}, keep_last_n=3)

    assert ck.list_epochs() == [1, 2, 3]  # epoch 0 pruned
    e, payload = ck.restore_latest()
    assert e == 3 and payload["extra"]["global_step"] == 30

    ck.average(1, 3)
    avg = ck.restore("model.average.from1to3")["params"]
    base = jax.tree_util.tree_map(np.asarray, state.params)
    leaf = jax.tree_util.tree_leaves(base)[0]
    leaf_avg = jax.tree_util.tree_leaves(avg)[0]
    np.testing.assert_allclose(leaf_avg, leaf + 2.0, rtol=1e-6)  # mean(1,2,3)=2
    assert ck.load_config()["model"]["type"] == "speech2text"


def test_finetune_flags_cli(tmp_path):
    """-im/-ios/-tfs warm-start path (reference run.py:86-91): a second run
    initialized from the first one's checkpoint trains and starts from the
    requested scheduler step."""
    import os
    import sys
    import yaml

    sys.path.insert(0, "tests")
    from test_e2e import make_config, make_corpus

    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_corpus(root, n_utts=16)
    conf = make_config(root)
    cfg = yaml.safe_load(open(conf))
    cfg["train"]["epochs"] = 2
    yaml.safe_dump(cfg, open(conf, "w"))

    base = os.path.join(root, "exp_base")
    assert run_main(["-c", conf, "-n", "1", "--expdir", base, "--log_interval", "100"]) == 0

    ft = os.path.join(root, "exp_ft")
    log = os.path.join(root, "ft.log")
    assert run_main([
        "-c", conf, "-n", "1", "--expdir", ft, "--log_interval", "100",
        "-im", os.path.join(base, "model.epoch.1"),
        "-ios", os.path.join(base, "model.epoch.1"),
        "-tfs", "50", "-lg", log,
    ]) == 0
    text = open(log).read()
    assert "initialized model weights" in text
    assert "restored optimizer state" in text
    assert os.path.isdir(os.path.join(ft, "model.epoch.1"))


def test_steps_per_exec_matches_single_step():
    """steps_per_exec=2: the scanned multi-step program produces the same
    params/step count as the single-step loop (dropout 0 so the differing
    rng consumption is inert); 5 same-shape batches exercise both the
    full-group scan and the ragged single-step tail."""
    from tests.test_models import small_model_cfg

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "residual_dropout": 0.0}
    cfg["frontend"] = {**cfg["frontend"], "dropout": 0.0}
    cfg["decoder"] = {**cfg["decoder"], "residual_dropout": 0.0}
    model = build_model(cfg)
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(5)]
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1, "clip_grad": 5.0}

    results = []
    for extra in ({}, {"steps_per_exec": 2}):
        tr = Trainer({**tcfg, **extra}, model, log_interval=10 ** 9)
        state = tr.init_state(jax.random.PRNGKey(0), batches[0])
        state = tr.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
        results.append((tr.global_step, state))

    (gs1, s1), (gs2, s2) = results
    assert gs1 == gs2 == 6  # 5 updates from global_step=1
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.params),
        jax.tree_util.tree_leaves_with_path(s2.params),
    ):
        # scan vs unrolled compile differ in fusion order — allow f32 drift
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(k),
        )


def test_steps_per_exec_with_accum_matches_single_step():
    """steps_per_exec=2 x accum_steps=2: the inner accumulation scan must
    reproduce the single-step loop's accumulation windows exactly (dropout 0
    so rng-consumption differences are inert). 10 batches = 2 full scanned
    groups (4 micro-batches each) + a ragged 2-batch tail window."""
    from tests.test_models import small_model_cfg

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "residual_dropout": 0.0}
    cfg["frontend"] = {**cfg["frontend"], "dropout": 0.0}
    cfg["decoder"] = {**cfg["decoder"], "residual_dropout": 0.0}
    model = build_model(cfg)
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(10)]
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1, "clip_grad": 5.0,
            "accum_steps": 2}

    results = []
    for extra in ({}, {"steps_per_exec": 2}):
        tr = Trainer({**tcfg, **extra}, model, log_interval=10 ** 9)
        state = tr.init_state(jax.random.PRNGKey(0), batches[0])
        state = tr.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
        results.append((tr.global_step, state))

    (gs1, s1), (gs2, s2) = results
    assert gs1 == gs2 == 6  # 10 micro-batches / accum 2 = 5 updates
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.params),
        jax.tree_util.tree_leaves_with_path(s2.params),
    ):
        # scan vs unrolled CPU compiles fuse differently and Adam amplifies
        # the f32 drift over 5 updates (on TPU both paths agree bit-exactly);
        # ~1e-3 is an order below a single lr-sized update
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(k),
        )


def test_steps_per_exec_accum_spans_shape_changes():
    """An accumulation window must NOT flush early at a bucket-shape change:
    the multi-step path has to accumulate across the boundary exactly like
    the single-step loop (an early flush would mint extra updates with
    1/accum-weighted gradients). 3 batches of shape A then 3 of shape B with
    accum=2 -> windows (A,A), (A,B), (B,B) = 3 updates in BOTH paths."""
    from tests.test_models import small_model_cfg

    cfg = small_model_cfg()
    cfg["encoder"] = {**cfg["encoder"], "residual_dropout": 0.0}
    cfg["frontend"] = {**cfg["frontend"], "dropout": 0.0}
    cfg["decoder"] = {**cfg["decoder"], "residual_dropout": 0.0}
    model = build_model(cfg)
    batches = ([synth_batch(np.random.default_rng(i), b=4, t=33) for i in range(3)]
               + [synth_batch(np.random.default_rng(10 + i), b=4, t=41) for i in range(3)])
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1, "clip_grad": 5.0,
            "accum_steps": 2}

    results = []
    for extra in ({}, {"steps_per_exec": 2}):
        tr = Trainer({**tcfg, **extra}, model, log_interval=10 ** 9)
        state = tr.init_state(jax.random.PRNGKey(0), batches[0])
        state = tr.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
        results.append((tr.global_step, state))

    (gs1, s1), (gs2, s2) = results
    assert gs1 == gs2 == 4  # 6 micro-batches / accum 2 = 3 updates
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.params),
        jax.tree_util.tree_leaves_with_path(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(k),
        )


def test_steps_per_exec_shape_change_regroups():
    """A mid-epoch bucket-shape change flushes the group; losses stay finite
    and every batch still contributes an update."""
    from tests.test_models import small_model_cfg

    model = build_model(small_model_cfg())
    batches = ([synth_batch(np.random.default_rng(i), b=4, t=33) for i in range(2)]
               + [synth_batch(np.random.default_rng(9), b=4, t=41)])
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1, "steps_per_exec": 2}
    tr = Trainer(tcfg, model, log_interval=10 ** 9)
    state = tr.init_state(jax.random.PRNGKey(0), batches[0])
    state = tr.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
    assert tr.global_step == 4  # 3 updates
    loss, _ = model.apply(state.params, *tr.batch_fn(batches[0]))
    assert np.isfinite(float(loss))


def test_steps_per_exec_on_mesh():
    """Multi-step scan under a (data x model) mesh: stacked batches reshard
    [N, B, ...] with the batch dim over 'data'; params stay mesh-sharded."""
    from tests.test_models import small_model_cfg

    mesh = make_mesh(n_data=2, n_model=2)
    model = build_model(small_model_cfg())
    batches = [synth_batch(np.random.default_rng(i), b=4) for i in range(4)]
    tcfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
            "scheduler": {"lr": 1e-3}, "epochs": 1, "steps_per_exec": 2}
    tr = Trainer(tcfg, model, mesh=mesh, log_interval=10 ** 9)
    state = tr.init_state(jax.random.PRNGKey(0), batches[0])
    state = tr.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
    assert tr.global_step == 5
    loss, _ = model.apply(state.params, *tr.batch_fn(batches[0]))
    assert np.isfinite(float(loss))


def test_adam_m_dtype_bf16():
    """`optimizer.adam_m_dtype: bfloat16` stores Adam's first moment in bf16
    (half the m-buffer HBM) while training still converges; the second
    moment stays f32."""
    import jax.numpy as jnp

    model = build_model(small_model_cfg())
    train_cfg = {
        "optimizer_type": "adam",
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98], "eps": 1e-9,
                      "adam_m_dtype": "bfloat16"},
        "scheduler_type": "constant", "scheduler": {"lr": 1e-3},
        "clip_grad": 5, "epochs": 1,
    }
    trainer = Trainer(train_cfg, model, log_interval=1000)
    rng = np.random.default_rng(3)
    batches = [synth_batch(rng) for _ in range(2)]
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])

    adam_state = [s for s in jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(x := s, "mu")]
    assert adam_state, "scale_by_adam state not found"
    mu_dtypes = {l.dtype.name for l in jax.tree_util.tree_leaves(adam_state[0].mu)}
    nu_dtypes = {l.dtype.name for l in jax.tree_util.tree_leaves(adam_state[0].nu)}
    assert mu_dtypes == {"bfloat16"}, mu_dtypes
    assert nu_dtypes == {"float32"}, nu_dtypes

    losses = []
    key = jax.random.PRNGKey(1)
    for it in range(12):
        args = trainer.batch_fn(batches[0])
        loss, _ = model.apply(state.params, *args)
        losses.append(float(loss))
        state = trainer.train_one_epoch(it, state, batches, key)
    assert losses[-1] < losses[0] * 0.8, losses
