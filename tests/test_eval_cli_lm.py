"""eval.py CLI with an external LM checkpoint (shallow fusion path)."""

import os

import numpy as np
import pytest
import yaml

from tests.test_e2e import make_config, make_corpus


@pytest.mark.slow
def test_eval_cli_with_lm(tmp_path):
    from opentransformer_tpu.cli.eval import main as eval_main
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_corpus(root, n_utts=24)
    conf = make_config(root)
    cfg = yaml.safe_load(open(conf))
    cfg["train"]["epochs"] = 2
    yaml.safe_dump(cfg, open(conf, "w"))
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir, "--log_interval", "100"]) == 0

    # train a tiny LM on the same texts
    lm_cfg = {
        "data": {
            "dataset_type": "text", "batch_size": 8,
            "src_vocab": cfg["data"]["vocab"], "tgt_vocab": cfg["data"]["vocab"],
            "train": {"src": cfg["data"]["train"]["text"], "tgt": cfg["data"]["train"]["text"]},
        },
        "model": {"type": "transformer_lm", "vocab_size": cfg["model"]["decoder"]["vocab_size"],
                  "num_blocks": 1, "d_model": 16, "n_heads": 2, "d_ff": 32},
        "train": {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
                  "scheduler": {"lr": 1e-3}, "epochs": 1, "save_name": "lm"},
    }
    lm_conf = os.path.join(root, "lm.yaml")
    yaml.safe_dump(lm_cfg, open(lm_conf, "w"))
    lm_expdir = os.path.join(root, "lm_exp")
    assert run_main(["-c", lm_conf, "-n", "1", "--expdir", lm_expdir, "--log_interval", "100"]) == 0

    assert eval_main([
        "-m", expdir, "-bw", "2", "-ml", "12", "-d", "test",
        "-lm", lm_expdir, "-lmw", "0.2",
    ]) == 0

    # post-beam LM rescoring path (-lm_resc)
    assert eval_main([
        "-m", expdir, "-bw", "2", "-ml", "12", "-d", "test",
        "-lm", lm_expdir, "-lmw", "0.0", "-lm_resc", "0.4", "-s", "resc",
    ]) == 0
    decode_dirs = [d for d in os.listdir(expdir) if "lm0.2" in d]
    assert decode_dirs, os.listdir(expdir)
    assert os.path.exists(os.path.join(expdir, decode_dirs[0], "RESULT"))
