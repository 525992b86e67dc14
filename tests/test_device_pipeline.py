"""On-device feature pipeline: parity with the host dataset path and a
training smoke through the CLI with extract_on_device."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from opentransformer_tpu.data import write_vocab
from opentransformer_tpu.data.device_pipeline import collate_waveforms, make_device_frontend


def write_wav(path, samples, sr=16000):
    import scipy.io.wavfile as siw

    siw.write(path, sr, (samples * 32767).astype(np.int16))


def test_device_frontend_matches_host(tmp_path):
    from opentransformer_tpu.ops.fbank import fbank_numpy, normalize_per_utterance

    rng = np.random.default_rng(0)
    n1, n2 = 16000, 11200
    w1 = (rng.normal(size=n1) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=n2) * 0.1).astype(np.float32)
    batch = np.zeros((2, n1), np.float32)
    batch[0], batch[1, :n2] = w1, w2

    frontend = make_device_frontend({"num_mel_bins": 40, "normalization": True})
    feats, mask = frontend(jnp.asarray(batch), jnp.asarray([n1, n2]),
                           jax.random.PRNGKey(0), train=False)
    feats, mask = np.asarray(feats), np.asarray(mask)

    for i, w in enumerate((w1, w2)):
        host = normalize_per_utterance(fbank_numpy(w))
        t = host.shape[0]
        assert mask[i, :t].all() and not mask[i, t:].any()
        np.testing.assert_allclose(feats[i, :t], host, rtol=1e-3, atol=1e-3)
        assert np.all(feats[i, t:] == 0.0)


def test_device_frontend_specaugment_train_only():
    rng = np.random.default_rng(1)
    batch = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    lens = jnp.asarray([16000, 16000])
    frontend = make_device_frontend(
        {"num_mel_bins": 40, "spec_augment": True,
         "spec_augment_config": {"freq_mask_num": 2, "time_mask_num": 2}}
    )
    f_eval, _ = frontend(jnp.asarray(batch), lens, jax.random.PRNGKey(0), train=False)
    f_train, _ = frontend(jnp.asarray(batch), lens, jax.random.PRNGKey(0), train=True)
    assert not np.allclose(np.asarray(f_eval), np.asarray(f_train))


def test_extract_on_device_training(tmp_path):
    from opentransformer_tpu.cli.run import main as run_main

    rng = np.random.default_rng(0)
    units = ["a", "b"]
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2, "a": 3, "b": 4}
    write_vocab(vocab, str(tmp_path / "vocab"))
    scp, text = [], []
    for i in range(8):
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, rng.normal(size=8000).astype(np.float32) * 0.05)
        scp.append(f"u{i} {p}")
        text.append(f"u{i} a b")
    (tmp_path / "wav.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "text").write_text("\n".join(text) + "\n")

    cfg = {
        "data": {
            "dataset_type": "online",
            "extract_on_device": True,
            "vocab": str(tmp_path / "vocab"),
            "batch_size": 4,
            "num_mel_bins": 20,
            "normalization": True,
            "spec_augment": True,
            "train": {"feat": [str(tmp_path / "wav.scp")], "text": [str(tmp_path / "text")]},
        },
        "model": {
            "type": "speech2text",
            "frontend_type": "conv",
            "frontend": {"input_size": 20, "output_size": 16, "mid_channel": 4,
                         "out_channel": 8, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
            "encoder_type": "transformer",
            "encoder": {"d_model": 16, "n_heads": 2, "d_ff": 32, "n_blocks": 1},
            "decoder_type": "transformer",
            "decoder": {"vocab_size": 5, "d_model": 16, "n_heads": 2, "d_ff": 32,
                        "n_blocks": 1, "share_embedding": True},
            "smoothing": 0.1,
        },
        "train": {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
                  "scheduler": {"lr": 1e-3}, "epochs": 2, "save_name": "dev"},
    }
    conf = str(tmp_path / "conf.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(cfg, f)
    expdir = str(tmp_path / "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir, "--log_interval", "100"]) == 0
    assert os.path.isdir(os.path.join(expdir, "model.epoch.1"))
