"""Regression tests for code-review findings: BatchNorm training,
eval of extract_on_device configs, RNN-LM rescoring, resume shuffle."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.train.trainer import Trainer
from tests.test_models import small_model_cfg
from tests.test_train import synth_batch


def test_batchnorm_conformer_trains():
    """conv_norm_type='batch' must train (batch_stats threaded as a mutable
    collection) and update running statistics."""
    cfg = small_model_cfg("conformer")
    cfg["encoder"]["conv_norm_type"] = "batch"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, b=4)
    train_cfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
                 "scheduler": {"lr": 1e-3}, "epochs": 1}
    trainer = Trainer(train_cfg, model, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in state.params
    stats0 = jax.tree_util.tree_leaves(state.params["batch_stats"])[0].copy()

    state = trainer.train_one_epoch(0, state, [batch, batch], jax.random.PRNGKey(1))
    stats1 = jax.tree_util.tree_leaves(state.params["batch_stats"])[0]
    assert not np.allclose(np.asarray(stats0), np.asarray(stats1))
    # eval path (use_running_average=True) works without mutability
    loss = trainer.evaluate(state, [batch])
    assert np.isfinite(loss)


def test_eval_cli_with_extract_on_device(tmp_path):
    """A model trained with the on-device pipeline must decode through
    eval.py (host extraction fallback at eval time)."""
    from tests.test_device_pipeline import test_extract_on_device_training
    from opentransformer_tpu.cli.eval import main as eval_main
    import yaml

    # reuse the training test to build corpus + checkpoint
    test_extract_on_device_training(tmp_path)
    expdir = str(tmp_path / "exp")
    # add a test split pointing at the same data
    conf = os.path.join(expdir, "config.json")
    import json

    cfg = json.load(open(conf))
    cfg["data"]["test"] = cfg["data"]["train"]
    json.dump(cfg, open(conf, "w"))

    assert eval_main(["-m", expdir, "-bw", "2", "-ml", "8", "-d", "test"]) == 0
    decode_dirs = [d for d in os.listdir(expdir) if d.startswith("decode_test")]
    assert decode_dirs
    assert os.path.exists(os.path.join(expdir, decode_dirs[0], "RESULT"))


def test_rnn_lm_rescore():
    from opentransformer_tpu.models.lm import RecurrentLanguageModel
    from opentransformer_tpu.recognize.base import SpeechToTextRecognizer, lm_rescore

    model = build_model(small_model_cfg())
    from tests.test_models import make_batch, VOCAB

    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    rec = SpeechToTextRecognizer(model, params, beam_width=2, max_len=6)
    hyp = rec.recognize_arrays(feats, feat_mask)

    lm = RecurrentLanguageModel(vocab_size=VOCAB, num_layers=1, hidden_size=16)
    toks = jnp.ones((2, 5), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(1), toks, toks, jnp.asarray([5, 5]))
    rescored = lm_rescore(rec, lm, lm_params, hyp, weight=0.3)
    assert np.all(np.diff(np.asarray(rescored.scores), axis=1) <= 1e-6)


def test_resume_reshuffles_from_correct_epoch(tmp_path):
    """set_epoch must be called with the epoch about to run."""
    calls = []

    class FakeLoader(list):
        def set_epoch(self, e):
            calls.append(e)

    model = build_model(small_model_cfg())
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, b=2)
    loader = FakeLoader([batch])
    cfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
           "scheduler": {"lr": 1e-3}, "epochs": 5}
    trainer = Trainer(cfg, model, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.global_epoch = 3  # simulate resume after epoch 2
    trainer.train(state, loader, jax.random.PRNGKey(1))
    assert calls[:1] == [3]  # first trained epoch reshuffled with its own seed
    assert calls == [3, 4]
