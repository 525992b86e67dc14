"""Pure-CTC model family end-to-end: train via CLI, decode greedy and
native-beam via eval.py (the reference's standalone CTC decode path crashed
as shipped — SURVEY §8.4; ours must work)."""

import os

import numpy as np
import pytest
import yaml

from opentransformer_tpu.data import write_vocab
from opentransformer_tpu.data.kaldi_io import write_ark

N_UNITS = 6
FEAT_DIM = 16


def make_ctc_corpus(root, n_utts=40, seed=0):
    rng = np.random.default_rng(seed)
    units = [chr(ord("a") + i) for i in range(N_UNITS)]
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2}
    for i, u in enumerate(units):
        vocab[u] = 3 + i
    write_vocab(vocab, os.path.join(root, "vocab"))
    patterns = rng.normal(size=(N_UNITS, FEAT_DIM)).astype(np.float32) * 2.0
    feats, lines = {}, []
    for i in range(n_utts):
        n_tok = int(rng.integers(2, 4))
        toks = [int(rng.integers(0, N_UNITS))]
        while len(toks) < n_tok:
            t = int(rng.integers(0, N_UNITS))
            if t != toks[-1]:
                toks.append(t)
        frames = np.concatenate([np.tile(patterns[t], (12, 1)) for t in toks])
        frames = frames + 0.1 * rng.normal(size=frames.shape).astype(np.float32)
        utt = f"utt{i:03d}"
        feats[utt] = frames.astype(np.float32)
        lines.append(f"{utt} " + " ".join(units[t] for t in toks))
    write_ark(os.path.join(root, "feats.ark"), feats, os.path.join(root, "feats.scp"))
    with open(os.path.join(root, "text"), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_ctc_train_and_decode(tmp_path):
    from opentransformer_tpu.cli.eval import main as eval_main
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_ctc_corpus(root)
    cfg = {
        "data": {
            "dataset_type": "kaldi",
            "vocab": os.path.join(root, "vocab"),
            "batch_size": 8,
            "train": {"feat": [os.path.join(root, "feats.scp")],
                      "text": [os.path.join(root, "text")]},
            "test": {"feat": [os.path.join(root, "feats.scp")],
                     "text": [os.path.join(root, "text")]},
        },
        "model": {
            "type": "ctc",
            "frontend_type": "conv",
            "frontend": {"input_size": FEAT_DIM, "output_size": 32, "mid_channel": 8,
                         "out_channel": 16, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
            "encoder_type": "transformer",
            "encoder": {"d_model": 32, "n_heads": 2, "d_ff": 64, "n_blocks": 2,
                        "residual_dropout": 0.0},
            "vocab_size": 3 + N_UNITS,
            "lookahead_steps": 2,
        },
        "train": {"optimizer_type": "adam", "optimizer": {"lr": 3e-3},
                  "scheduler_type": "constant", "scheduler": {"lr": 3e-3},
                  "clip_grad": 5, "epochs": 40, "save_name": "ctc"},
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(cfg, f)
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir, "--log_interval", "100"]) == 0

    # greedy decode
    assert eval_main(["-m", expdir, "-d", "test", "-s", "greedy"]) == 0
    # native prefix beam search decode
    assert eval_main(["-m", expdir, "-d", "test", "-bw", "4", "-s", "beam"]) == 0

    results = {}
    for d in os.listdir(expdir):
        if d.startswith("decode_test"):
            txt = open(os.path.join(expdir, d, "RESULT")).read()
            results[d] = float(txt.split("CER ")[1].split("%")[0])
    assert results, os.listdir(expdir)
    # CTC on a trivially separable corpus must learn
    assert min(results.values()) < 20.0, results


def test_mixspeech_training():
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.train.trainer import Trainer
    from tests.test_models import small_model_cfg
    from tests.test_train import synth_batch

    import jax

    model = build_model(small_model_cfg())
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, b=4)
    cfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
           "scheduler": {"lr": 1e-3}, "epochs": 1}
    trainer = Trainer(cfg, model, is_mixspeech=True, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = trainer.train_one_epoch(0, state, [batch, batch], jax.random.PRNGKey(1))
    loss = trainer.evaluate(state, [batch])
    assert np.isfinite(loss)
