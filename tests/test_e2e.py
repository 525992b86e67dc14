"""End-to-end slice: synthetic learnable corpus → train CLI → average →
decode CLI → CER sanity. Exercises config YAML, kaldi reader, collate,
model, mesh trainer, orbax checkpoints, beam search, and scoring together."""

import os

import numpy as np
import pytest
import yaml

from opentransformer_tpu.data import write_vocab
from opentransformer_tpu.data.kaldi_io import write_ark

N_UNITS = 8
FEAT_DIM = 16


def make_corpus(root, n_utts=60, seed=0):
    """Features are a per-token pattern repeated 8 frames + noise, with a
    distinct end-of-utterance pattern (an acoustic stop cue) — a mapping a
    tiny model can learn to both transcribe and terminate in a few hundred
    updates. Adjacent repeats are avoided (hardest stop case; covered by
    unit tests, not this convergence check)."""
    rng = np.random.default_rng(seed)
    units = [chr(ord("a") + i) for i in range(N_UNITS)]
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2}
    for i, u in enumerate(units):
        vocab[u] = 3 + i
    write_vocab(vocab, os.path.join(root, "vocab"))

    patterns = rng.normal(size=(N_UNITS + 1, FEAT_DIM)).astype(np.float32) * 2.0
    end_pattern = patterns[N_UNITS]

    feats, lines = {}, []
    for i in range(n_utts):
        n_tok = int(rng.integers(2, 5))
        toks = [int(rng.integers(0, N_UNITS))]
        while len(toks) < n_tok:
            t = int(rng.integers(0, N_UNITS))
            if t != toks[-1]:
                toks.append(t)
        frames = np.concatenate(
            [np.tile(patterns[t], (8, 1)) for t in toks] + [np.tile(end_pattern, (8, 1))]
        ) + 0.1 * rng.normal(size=(8 * (n_tok + 1), FEAT_DIM)).astype(np.float32)
        utt = f"utt{i:03d}"
        feats[utt] = frames.astype(np.float32)
        lines.append(f"{utt} " + " ".join(units[t] for t in toks))

    write_ark(os.path.join(root, "feats.ark"), feats, os.path.join(root, "feats.scp"))
    with open(os.path.join(root, "text"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return vocab


def make_config(root):
    cfg = {
        "data": {
            "name": "synth",
            "vocab": os.path.join(root, "vocab"),
            "batch_size": 8,
            "dataset_type": "kaldi",
            "train": {"feat": [os.path.join(root, "feats.scp")],
                      "text": [os.path.join(root, "text")]},
            "test": {"feat": [os.path.join(root, "feats.scp")],
                     "text": [os.path.join(root, "text")]},
        },
        "model": {
            "type": "speech2text",
            "frontend_type": "conv",
            "frontend": {
                "input_size": FEAT_DIM, "output_size": 32, "in_channel": 1,
                "mid_channel": 8, "out_channel": 16,
                "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2],
            },
            "encoder_type": "transformer",
            "encoder": {
                "d_model": 32, "n_heads": 2, "d_ff": 64, "n_blocks": 2,
                "residual_dropout": 0.0, "activation": "glu",
            },
            "decoder_type": "transformer",
            "decoder": {
                "vocab_size": 3 + N_UNITS, "d_model": 32, "n_heads": 2,
                "d_ff": 64, "memory_dim": 32, "n_blocks": 1,
                "residual_dropout": 0.0, "activation": "glu",
                "share_embedding": True,
            },
            "ctc_weight": 0.0,
            "smoothing": 0.1,
        },
        "train": {
            "optimizer_type": "adam",
            "optimizer": {"lr": 0.002, "betas": [0.9, 0.98], "eps": 1.0e-9},
            "scheduler_type": "constant",
            "scheduler": {"lr": 0.002},
            "clip_grad": 5,
            "epochs": 60,
            "accum_steps": 1,
            "save_name": "synth",
        },
    }
    path = os.path.join(root, "conf.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.mark.slow
def test_train_average_decode(tmp_path):
    from opentransformer_tpu.cli.average import main as average_main
    from opentransformer_tpu.cli.eval import main as eval_main
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_corpus(root)
    conf = make_config(root)
    expdir = os.path.join(root, "exp")

    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir, "--log_interval", "50"]) == 0
    assert os.path.isdir(os.path.join(expdir, "model.epoch.59"))

    average_main([expdir, "57", "59"])
    avg_dir = os.path.join(expdir, "model.average.from57to59")
    assert os.path.isdir(avg_dir)

    assert eval_main(["-m", avg_dir, "-bw", "3", "-ml", "16", "-d", "test"]) == 0
    decode_dirs = [d for d in os.listdir(expdir) if d.startswith("decode_test")]
    assert decode_dirs
    result = open(os.path.join(expdir, decode_dirs[0], "RESULT")).read()
    cer = float(result.split("CER ")[1].split("%")[0])
    # tiny model on a learnable synthetic mapping: expect near-perfect
    assert cer < 15.0, result
