"""End-to-end online-serving workflow: train a chunked-attention causal-conv
conformer TRANSDUCER offline through the real CLI, then serve it
frame-synchronously with StreamingTransducerRecognizer and assert CER.

This exercises the full new stack together — conformer streaming encode
(rel-pos chunk attention + conv state), RNNT training, and chunk-resumed
greedy decoding — the workflow the reference could not do at all.
"""

import os

import numpy as np
import pytest
import yaml

from tests.test_ctc_e2e import FEAT_DIM, N_UNITS, make_ctc_corpus


@pytest.mark.slow
def test_train_offline_serve_online(tmp_path):
    import jax

    from opentransformer_tpu.cli.run import main as run_main
    from opentransformer_tpu.data import load_idx2unit_map
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.recognize.online import StreamingTransducerRecognizer
    from opentransformer_tpu.train.checkpoint import Checkpointer

    root = str(tmp_path)
    make_ctc_corpus(root)
    model_cfg = {
        "type": "transducer", "frontend_type": "conv",
        "frontend": {"input_size": FEAT_DIM, "output_size": 32, "mid_channel": 8,
                     "out_channel": 16, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
        "encoder_type": "conformer",
        "encoder": {"d_model": 32, "n_heads": 2, "d_ff": 64, "nblocks": 2,
                    "cov_kernel_size": 7, "residual_dropout": 0.0,
                    "macaron_style": True, "conv_norm_type": "layer",
                    "conv_causal": True, "relative_positional": True,
                    "chunk_size": 4, "left_chunks": 2},
        "vocab_size": 3 + N_UNITS,
        "predictor": {"num_layers": 1},
        "d_joint": 32,
    }
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
        "model": model_cfg,
        "train": {"optimizer_type": "adam", "optimizer": {"lr": 3e-3},
                  "scheduler_type": "constant", "scheduler": {"lr": 3e-3},
                  "clip_grad": 5, "epochs": 40, "save_name": "stream_rnnt"},
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(cfg, f)
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir, "--log_interval", "100"]) == 0

    # ---- serve frame-synchronously, one utterance at a time ----
    ck = Checkpointer(expdir)
    _, payload = ck.restore_latest()
    params = jax.tree_util.tree_map(jax.numpy.asarray, payload["params"])
    model = build_model(model_cfg)
    idx2unit = load_idx2unit_map(cfg["data"]["vocab"])

    from opentransformer_tpu.data.kaldi_io import read_ark

    feats_map = dict(read_ark(os.path.join(root, "feats.ark")))
    refs = {}
    for line in open(os.path.join(root, "text")):
        utt, *toks = line.split()
        refs[utt] = toks

    errors = tokens_total = 0
    rec = StreamingTransducerRecognizer(model, params, batch=1, idx2unit=idx2unit)
    rc = rec.session.raw_chunk
    for n_utts, (utt, feat) in enumerate(feats_map.items()):
        if n_utts >= 12:
            break
        rec.reset()
        feat = np.asarray(feat, np.float32)[None]
        n_full = feat.shape[1] // rc
        for s in range(n_full):
            rec.feed(feat[:, s * rc:(s + 1) * rc])
        hyp = rec.finish(feat[:, n_full * rc:])[0].split()
        from opentransformer_tpu.ops.levenshtein import edit_distance

        errors += edit_distance(refs[utt], hyp)
        tokens_total += len(refs[utt])
    cer = errors / max(tokens_total, 1)
    assert cer < 0.2, f"online CER {cer:.2%}"

    # the same path through the decode CLI (`eval.py --online`)
    from opentransformer_tpu.cli.eval import main as eval_main

    assert eval_main(["-m", expdir, "-d", "test", "--online", "-s", "online"]) == 0
    results = {}
    for d in os.listdir(expdir):
        if "online" in d and d.startswith("decode_test"):
            txt = open(os.path.join(expdir, d, "RESULT")).read()
            results[d] = float(txt.split("CER ")[1].split("%")[0])
    assert results and min(results.values()) < 20.0, results


def test_train_offline_serve_online_attention(tmp_path):
    """Attention-decoder (speech2text) online path: train a chunked-attention
    s2t model offline, then decode it through `eval.py --online` (incremental
    beam re-decode over the growing memory) with CER asserted."""
    from opentransformer_tpu.cli.eval import main as eval_main
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_ctc_corpus(root)
    model_cfg = {
        "type": "speech2text", "frontend_type": "conv",
        "frontend": {"input_size": FEAT_DIM, "output_size": 32, "mid_channel": 8,
                     "out_channel": 16, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
        "encoder_type": "transformer",
        "encoder": {"d_model": 32, "n_heads": 2, "d_ff": 64, "n_blocks": 2,
                    "residual_dropout": 0.0, "chunk_size": 4, "left_chunks": 2},
        "decoder_type": "transformer",
        "decoder": {"vocab_size": 3 + N_UNITS, "d_model": 32, "n_heads": 2,
                    "d_ff": 64, "memory_dim": 32, "n_blocks": 1,
                    "residual_dropout": 0.0, "share_embedding": True},
        "ctc_weight": 0.0, "smoothing": 0.1,
    }
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
        "model": model_cfg,
        "train": {"optimizer_type": "adam", "optimizer": {"lr": 3e-3},
                  "scheduler_type": "constant", "scheduler": {"lr": 3e-3},
                  "clip_grad": 5, "epochs": 90, "save_name": "stream_att"},
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(cfg, f)
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir,
                     "--log_interval", "100"]) == 0

    assert eval_main(["-m", expdir, "-d", "test", "--online", "-bw", "3",
                      "-ml", "16", "-s", "online"]) == 0
    results = {}
    for d in os.listdir(expdir):
        if "online" in d and d.startswith("decode_test"):
            txt = open(os.path.join(expdir, d, "RESULT")).read()
            results[d] = float(txt.split("CER ")[1].split("%")[0])
    assert results and min(results.values()) < 20.0, results
