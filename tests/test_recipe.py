"""Recipe tests: text normalization, char tokenization, vocab generation,
online AudioDataset from real wav files, CMVN tool."""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


prep = load_module("egs/aishell/local/prepare_data.py", "prep")


def test_normalize_fullwidth():
    assert prep.normalize_text("ａｂｃ１２３") == "ABC123"
    assert prep.normalize_text("你好ＡＢ") == "你好AB"
    assert prep.normalize_text("x　y") == "X Y"


def test_char_tokenize():
    assert prep.char_tokenize("你好世界") == ["你", "好", "世", "界"]
    assert prep.char_tokenize("AB1 你好") == ["AB1", "你", "好"]
    assert prep.char_tokenize("你GOOD好") == ["你", "GOOD", "好"]


def test_generate_vocab(tmp_path):
    text = tmp_path / "text"
    text.write_text("u1 你 好 好\nu2 好 世\n", encoding="utf-8")
    vocab = tmp_path / "vocab"
    out = subprocess.run(
        [sys.executable, "egs/aishell/local/generate_vocab.py", str(text), str(vocab)],
        capture_output=True, text=True, check=True,
    )
    lines = vocab.read_text(encoding="utf-8").splitlines()
    assert lines[0] == "<PAD> 0" and lines[1] == "<S/E> 1" and lines[2] == "<UNK> 2"
    assert lines[3] == "好 3"  # most frequent first
    assert "vocab size 6" in out.stdout


def write_wav(path, samples, sr=16000):
    import scipy.io.wavfile as siw

    siw.write(path, sr, (samples * 32767).astype(np.int16))


@pytest.fixture
def wav_corpus(tmp_path):
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "wav", exist_ok=True)
    scp, text = [], []
    for i in range(3):
        utt = f"w{i}"
        p = str(tmp_path / "wav" / f"{utt}.wav")
        write_wav(p, rng.normal(size=16000).astype(np.float32) * 0.05)
        scp.append(f"{utt} {p}")
        text.append(f"{utt} a b")
    (tmp_path / "wav.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "text").write_text("\n".join(text) + "\n")
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2, "a": 3, "b": 4}
    from opentransformer_tpu.data import write_vocab

    write_vocab(vocab, str(tmp_path / "vocab"))
    return tmp_path


def test_online_audio_dataset(wav_corpus):
    from opentransformer_tpu.data.datasets import AudioDataset

    params = {"vocab": str(wav_corpus / "vocab"), "num_mel_bins": 40,
              "normalization": True, "spec_augment": False}
    datadict = {"feat": [str(wav_corpus / "wav.scp")], "text": [str(wav_corpus / "text")]}
    ds = AudioDataset(params, datadict, is_eval=True)
    assert len(ds) == 3
    utt, feat, flen, targets, tlen = ds[0]
    assert feat.shape == (98, 40)  # 1s @ 16k -> 98 snip-edges frames
    assert abs(float(feat.mean())) < 1e-4 and abs(float(feat.std()) - 1) < 1e-3
    assert targets == [3, 4] and tlen == 2
    pairs = ds.index_length_pair()
    assert pairs == [(0, 98), (1, 98), (2, 98)]


def test_compute_cmvn_tool(wav_corpus):
    out = subprocess.run(
        [sys.executable, "tools/compute_cmvn.py", str(wav_corpus / "wav.scp"),
         str(wav_corpus / "cmvn"), "--kind", "wav"],
        capture_output=True, text=True, check=True,
    )
    mean = np.load(str(wav_corpus / "cmvn.mean.npy"))
    std = np.load(str(wav_corpus / "cmvn.std.npy"))
    assert mean.shape == (40,) and std.shape == (40,) and np.all(std > 0)


def test_wav_to_duration_tool(wav_corpus, tmp_path):
    out_file = str(tmp_path / "durs")
    subprocess.run(
        [sys.executable, "tools/wav_to_duration.py", str(wav_corpus / "wav.scp"), out_file],
        check=True,
    )
    for line in open(out_file):
        utt, dur = line.split()
        assert abs(float(dur) - 1.0) < 0.01
