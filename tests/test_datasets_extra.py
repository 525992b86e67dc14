"""Coverage for the ESPnet dataset, LM training through the CLI, and audio
augmentation knobs."""

import json
import os

import numpy as np
import yaml

from opentransformer_tpu.data import write_vocab
from opentransformer_tpu.data.kaldi_io import write_ark
from opentransformer_tpu.data.loader import FeatureLoader


def test_espnet_dataset(tmp_path):
    rng = np.random.default_rng(0)
    feats = {f"u{i}": rng.normal(size=(30 + i, 12)).astype(np.float32) for i in range(4)}
    ark = str(tmp_path / "e.ark")
    scp = str(tmp_path / "e.scp")
    write_ark(ark, feats, scp_path=scp)
    rx = dict(line.split(None, 1) for line in open(scp).read().splitlines())
    data = {
        "utts": {
            u: {
                "input": [{"feat": rx[u].strip(), "shape": [feats[u].shape[0], 12]}],
                "output": [{"tokenid": "3 4 5"}],
            }
            for u in feats
        }
    }
    jf = str(tmp_path / "data.json")
    with open(jf, "w") as f:
        json.dump(data, f)

    params = {"data": {"dataset_type": "espnet", "batch_size": 2,
                       "train": {"json": [jf], "text": []}}}
    loader = FeatureLoader(params, "train")
    seen = 0
    for utt_ids, inputs, targets in loader:
        seen += len(utt_ids)
        assert inputs["inputs"].shape[-1] == 12
        for i in range(len(utt_ids)):
            L = int(targets["targets_length"][i])
            assert targets["targets"][i, 1:L].tolist() == [3, 4, 5]
    assert seen == 4


def test_lm_training_cli(tmp_path):
    from opentransformer_tpu.cli.run import main as run_main

    units = ["a", "b", "c", "d"]
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2}
    for i, u in enumerate(units):
        vocab[u] = 3 + i
    vocab_path = str(tmp_path / "vocab")
    write_vocab(vocab, vocab_path)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(24):
        n = int(rng.integers(2, 6))
        lines.append(f"u{i} " + " ".join(rng.choice(units, n)))
    text_path = str(tmp_path / "text")
    with open(text_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg = {
        "data": {
            "dataset_type": "text", "batch_size": 8,
            "src_vocab": vocab_path, "tgt_vocab": vocab_path,
            "train": {"src": [text_path], "tgt": [text_path]},
        },
        "model": {"type": "transformer_lm", "vocab_size": 7, "num_blocks": 1,
                  "d_model": 16, "n_heads": 2, "d_ff": 32, "smoothing": 0.1},
        "train": {"optimizer_type": "adam", "optimizer": {},
                  "scheduler_type": "constant", "scheduler": {"lr": 1e-3},
                  "epochs": 2, "save_name": "lm"},
    }
    conf = str(tmp_path / "lm.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(cfg, f)
    expdir = str(tmp_path / "exp")
    assert run_main(["-c", conf, "--expdir", expdir, "--log_interval", "100"]) == 0
    assert os.path.isdir(os.path.join(expdir, "model.epoch.1"))


def test_audio_augmentation_knobs(tmp_path):
    import scipy.io.wavfile as siw

    from opentransformer_tpu.data.datasets import AudioDataset

    rng = np.random.default_rng(0)
    p = str(tmp_path / "a.wav")
    siw.write(p, 16000, (rng.normal(size=16000) * 1000).astype(np.int16))
    (tmp_path / "wav.scp").write_text(f"u0 {p}\n")
    (tmp_path / "text").write_text("u0 a\n")
    write_vocab({"<PAD>": 0, "<S/E>": 1, "<UNK>": 2, "a": 3}, str(tmp_path / "vocab"))

    base = {"vocab": str(tmp_path / "vocab"), "num_mel_bins": 40, "normalization": False}
    dd = {"feat": [str(tmp_path / "wav.scp")], "text": [str(tmp_path / "text")]}

    plain = AudioDataset(dict(base), dd, is_eval=True)[0][1]
    noisy_ds = AudioDataset({**base, "gaussian_noise": 0.5}, dd,
                            rng=np.random.default_rng(1))
    noisy = noisy_ds[0][1]
    assert not np.allclose(plain, noisy)

    vol_ds = AudioDataset({**base, "volume_perturb": True}, dd,
                          rng=np.random.default_rng(2))
    vol = vol_ds[0][1]
    # volume perturbation shifts log-fbank by ~a constant
    delta = vol - plain
    assert abs(delta.std()) < 0.2 and abs(delta.mean()) > 1e-3

    aug_ds = AudioDataset({**base, "spec_augment": True}, dd,
                          rng=np.random.default_rng(3))
    aug = aug_ds[0][1]
    assert np.any(aug == 0.0)


def test_speed_perturb(tmp_path):
    import scipy.io.wavfile as siw

    from opentransformer_tpu.data.datasets import AudioDataset

    rng = np.random.default_rng(0)
    p = str(tmp_path / "s.wav")
    siw.write(p, 16000, (rng.normal(size=16000) * 1000).astype(np.int16))
    (tmp_path / "wav.scp").write_text(f"u0 {p}\n")
    (tmp_path / "text").write_text("u0 a\n")
    write_vocab({"<PAD>": 0, "<S/E>": 1, "<UNK>": 2, "a": 3}, str(tmp_path / "vocab"))
    base = {"vocab": str(tmp_path / "vocab"), "num_mel_bins": 20, "normalization": False,
            "speed_perturb": True}
    dd = {"feat": [str(tmp_path / "wav.scp")], "text": [str(tmp_path / "text")]}
    lengths = set()
    for seed in range(8):
        ds = AudioDataset(base, dd, rng=np.random.default_rng(seed))
        lengths.add(ds[0][2])
    # 0.9x / 1.0x / 1.1x tempo -> at least two distinct frame counts
    assert len(lengths) >= 2, lengths
