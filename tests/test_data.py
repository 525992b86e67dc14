"""Data pipeline tests: kaldi ark I/O roundtrip, datasets, collate contract,
bucketing shape quantization, SpecAugment semantics."""

import os

import numpy as np
import pytest

from opentransformer_tpu.data import BOS, EOS, PAD, load_vocab, write_vocab
from opentransformer_tpu.data.augment import spec_augment
from opentransformer_tpu.data.bucket import BySequenceLengthSampler
from opentransformer_tpu.data.kaldi_io import load_mat, read_ark, read_scp, write_ark
from opentransformer_tpu.data.loader import FeatureLoader, collate_speech


def make_vocab(path, units):
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2}
    for i, u in enumerate(units):
        vocab[u] = 3 + i
    write_vocab(vocab, path)
    return vocab


@pytest.fixture
def kaldi_data(tmp_path):
    """Synthetic kaldi-format dataset: ark of random feats + text + vocab."""
    rng = np.random.default_rng(0)
    units = [chr(ord("a") + i) for i in range(10)]
    vocab_path = str(tmp_path / "vocab")
    make_vocab(vocab_path, units)

    feats, texts = {}, []
    for i in range(12):
        t = int(rng.integers(20, 90))
        feats[f"utt{i:02d}"] = rng.normal(size=(t, 20)).astype(np.float32)
        n_chars = int(rng.integers(2, 8))
        chars = rng.choice(units, n_chars)
        texts.append(f"utt{i:02d} " + " ".join(chars))
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark(ark, feats, scp_path=scp)
    text_path = str(tmp_path / "text")
    with open(text_path, "w") as f:
        f.write("\n".join(texts) + "\n")
    return {"vocab": vocab_path, "scp": scp, "text": text_path, "feats": feats}


def test_ark_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    mats = {f"u{i}": rng.normal(size=(5 + i, 13)).astype(np.float32) for i in range(4)}
    ark, scp = str(tmp_path / "a.ark"), str(tmp_path / "a.scp")
    write_ark(ark, mats, scp_path=scp)

    seq = dict(read_ark(ark))
    assert set(seq) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(seq[k], mats[k])

    scp_map = read_scp(scp)
    for k, rx in scp_map.items():
        np.testing.assert_array_equal(load_mat(rx), mats[k])


def test_kaldi_dataset_and_loader(kaldi_data):
    params = {
        "data": {
            "dataset_type": "kaldi",
            "vocab": kaldi_data["vocab"],
            "batch_size": 4,
            "train": {"feat": [kaldi_data["scp"]], "text": [kaldi_data["text"]]},
        }
    }
    loader = FeatureLoader(params, "train")
    vocab = load_vocab(kaldi_data["vocab"])
    n = 0
    for utt_ids, inputs, targets in loader:
        n += 1
        b, t, f = inputs["inputs"].shape
        assert f == 20 and b <= 4
        assert inputs["mask"].shape == (b, t)
        assert t % 32 == 0  # quantized frame padding
        y = targets["targets"]
        assert y.shape[1] % 8 == 0
        for i in range(b):
            L = int(targets["targets_length"][i])  # y + EOS
            assert y[i, 0] == BOS
            assert y[i, L] == EOS
            assert np.all(y[i, L + 1 :] == PAD)
            tl = int(inputs["inputs_length"][i])
            np.testing.assert_array_equal(
                inputs["inputs"][i, :tl], kaldi_data["feats"][utt_ids[i]]
            )
            assert np.all(inputs["inputs"][i, tl:] == 0)
    assert n == len(loader) == 3


def test_bucket_sampler_static_shapes():
    rng = np.random.default_rng(2)
    pairs = [(i, int(rng.integers(10, 950))) for i in range(200)]
    s = BySequenceLengthSampler(pairs, bucket_boundaries=[100, 300, 600, 1000],
                                batch_size=8, seed=3)
    seen = set()
    total = 0
    for boundary, idxs in s:
        assert boundary in (100, 300, 600, 1000)
        total += len(idxs)
        seen.update(idxs)
        # every utterance fits its boundary
        lengths = dict(pairs)
        assert all(lengths[i] <= boundary for i in idxs)
    assert total == 200 and len(seen) == 200

    first = [tuple(b[1]) for b in s]
    s.set_epoch(1)
    second = [tuple(b[1]) for b in s]
    assert first != second  # epoch reshuffle


def test_overlong_utterances_bounded_compile_shapes():
    """Utterances beyond the last boundary must land in QUANTIZED
    pseudo-boundaries so the collated (T, U) shape count stays bounded —
    the reference's dynamic pad (otrans/data/loader.py:71-72) would mint a
    fresh XLA compile per distinct over-long batch length."""
    rng = np.random.default_rng(7)
    # 2000+-frame outliers with many DISTINCT lengths
    lengths = [int(rng.integers(50, 990)) for _ in range(60)] + [
        2001, 2050, 2111, 2222, 2345, 2399, 2500, 2750, 3000, 3333
    ]
    pairs = list(enumerate(lengths))
    boundaries = [250, 500, 750, 1000]
    s = BySequenceLengthSampler(pairs, bucket_boundaries=boundaries,
                                batch_size=4, seed=1, overlong_pad_multiple=256)

    f = 8
    feats = {i: np.ones((l, f), np.float32) for i, l in pairs}
    shapes = set()
    seen = set()
    for boundary, idxs in s:
        samples = [(f"u{i}", feats[i], lengths[i], [3, 4, 5], 3) for i in idxs]
        _, inputs, targets = collate_speech(samples, pad_to_frames=boundary)
        shapes.add((inputs["inputs"].shape[1], targets["targets"].shape[1]))
        assert inputs["inputs"].shape[1] == boundary  # never exceeds bucket
        seen.update(idxs)
    assert seen == set(range(len(pairs)))  # nothing dropped
    # T shapes: 4 buckets + ceil-quantized overlong pseudo-boundaries only
    t_shapes = {t for t, _ in shapes}
    quantized = {((l + 255) // 256) * 256 for l in lengths if l > 1000}
    assert t_shapes <= set(boundaries) | quantized
    assert len(t_shapes) <= len(boundaries) + len(quantized)
    # every over-long utterance fits its pseudo-boundary
    for boundary, idxs in s:
        assert all(lengths[i] <= boundary for i in idxs)


def test_bucket_auto_batch_size():
    pairs = [(i, 500) for i in range(40)]
    s = BySequenceLengthSampler(pairs, bucket_boundaries=[500, 1000],
                                max_frames_one_batch=4000, batch_size=99)
    for boundary, idxs in s:
        assert len(idxs) <= 4000 // 500


def test_spec_augment_zero_masks():
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(size=(200, 40))).astype(np.float32) + 1.0
    out = spec_augment(x, rng=rng)
    assert out.shape == x.shape
    # masked entries must be exactly zero, rest untouched
    changed = out != x
    assert np.all(out[changed] == 0.0)
    # masks are full rows/cols
    zero_rows = np.where(np.all(out == 0, axis=1))[0]
    zero_cols = np.where(np.all(out == 0, axis=0))[0]
    assert len(zero_rows) <= 0.05 * 200 * 2 + 2
    assert len(zero_cols) <= int(40 * 0.3) * 2


def test_text_loader(tmp_path):
    units = ["x", "y", "z"]
    vocab_path = str(tmp_path / "vocab")
    make_vocab(vocab_path, units)
    text_path = str(tmp_path / "text")
    with open(text_path, "w") as f:
        f.write("u0 x y z\nu1 z z\nu2 y\n")
    params = {
        "data": {
            "dataset_type": "text",
            "batch_size": 2,
            "src_vocab": vocab_path,
            "tgt_vocab": vocab_path,
            "train": {"src": [text_path], "tgt": [text_path]},
        }
    }
    loader = FeatureLoader(params, "train")
    v = load_vocab(vocab_path)
    for utt_ids, inputs, targets in loader:
        src, tgt = inputs["inputs"], targets["targets"]
        for i in range(len(utt_ids)):
            L = int(inputs["inputs_length"][i])
            assert src[i, 0] == BOS
            assert tgt[i, L - 1] == EOS
            np.testing.assert_array_equal(src[i, 1:L], tgt[i, : L - 1])


def test_prefetcher_sentinel_with_slow_consumer():
    """A slow consumer must still receive end-of-iteration (the sentinel
    previously got dropped when the queue was full -> epoch-end deadlock)."""
    import time

    from opentransformer_tpu.data.loader import _Prefetcher

    items = list(range(25))  # > queue depth (10)
    pf = _Prefetcher(lambda: iter(items), max_prefetch=5)
    got = []
    start = time.time()
    for x in pf:
        got.append(x)
        time.sleep(0.02)  # slower than the producer
        assert time.time() - start < 20, "prefetcher hung"
    assert got == items


def test_kaldi_compressed_matrix_read(tmp_path):
    """Decode a hand-built kaldi CM (format 1) archive entry."""
    import struct

    from opentransformer_tpu.data.kaldi_io import load_mat

    rng = np.random.default_rng(0)
    rows, cols = 20, 5
    mat = rng.normal(size=(rows, cols)).astype(np.float32) * 3.0

    # build CM format-1 bytes: GlobalHeader + per-col percentile headers +
    # uint8 codes, column-major (kaldi compressed-matrix.cc)
    min_v = float(mat.min())
    range_v = float(mat.max() - mat.min()) or 1.0

    def f2u16(v):
        return int(np.clip((v - min_v) / range_v * 65535.0, 0, 65535))

    def u16f(u):
        return min_v + range_v * (u / 65535.0)

    headers = []
    codes = []
    for c in range(cols):
        col = np.sort(mat[:, c])
        p0, p25, p75, p100 = col[0], col[rows // 4], col[(3 * rows) // 4], col[-1]
        u = [f2u16(p0), f2u16(p25), f2u16(p75), f2u16(p100)]
        headers.append(u)
        f0, f25, f75, f100 = (u16f(x) for x in u)
        ccodes = []
        for v in mat[:, c]:
            if v <= f25:
                code = 0 if f25 == f0 else int(np.clip((v - f0) / (f25 - f0) * 64, 0, 64))
            elif v <= f75:
                code = 64 + int(np.clip((v - f25) / max(f75 - f25, 1e-9) * 128, 0, 128))
            else:
                code = 192 + int(np.clip((v - f75) / max(f100 - f75, 1e-9) * 63, 0, 63))
            ccodes.append(min(code, 255))
        codes.append(ccodes)

    path = str(tmp_path / "cm.ark")
    with open(path, "wb") as f:
        f.write(b"utt1 ")
        f.write(b"\x00B")
        f.write(b"CM ")
        f.write(struct.pack("<iffii", 1, min_v, range_v, rows, cols))
        for h in headers:
            f.write(np.asarray(h, "<u2").tobytes())
        for c in codes:
            f.write(np.asarray(c, np.uint8).tobytes())

    got = load_mat(path)
    assert got.shape == (rows, cols)
    # lossy codec: values should be close at the resolution of the encoding
    np.testing.assert_allclose(got, mat, atol=range_v / 40)
