"""Synthetic benchmark corpus (data/synth.py): determinism + contract.

bench.py regenerates the test split in-process to score trained weights, so
bit-exact determinism across processes is a hard requirement."""

import numpy as np

from opentransformer_tpu.data import synth


def test_deterministic_regeneration():
    a = list(synth.gen_split("test", 5))
    b = list(synth.gen_split("test", 5))
    assert [u for u, _, _ in a] == [u for u, _, _ in b]
    for (_, xa, ta), (_, xb, tb) in zip(a, b):
        assert ta == tb
        np.testing.assert_array_equal(xa, xb)


def test_corpus_contract():
    vocab = synth.make_vocab()
    assert len(vocab) == synth.VOCAB_SIZE == 4233
    assert vocab["<PAD>"] == 0 and vocab["<S/E>"] == 1 and vocab["<UNK>"] == 2
    seen_repeat = False
    for _, feats, toks in synth.gen_split("train", 40):
        assert feats.dtype == np.float32 and feats.shape[1] == synth.FEAT_DIM
        assert synth.MIN_TOKENS <= len(toks) <= synth.MAX_TOKENS
        assert feats.shape[0] <= synth.MAX_FRAMES
        assert all(0 <= t < synth.N_ACTIVE_UNITS for t in toks)
        seen_repeat |= any(a == b for a, b in zip(toks, toks[1:]))
    assert seen_repeat, "corpus should contain adjacent repeats (hard case)"


def test_splits_disjoint_content():
    # different split seeds -> different token streams
    tr = [t for _, _, t in synth.gen_split("train", 3)]
    te = [t for _, _, t in synth.gen_split("test", 3)]
    assert tr != te


def test_recipe_configs_build():
    """egs/synth_bench configs stay loadable and consistent with the corpus:
    the models build, vocab matches synth.VOCAB_SIZE, the single bucket
    boundary covers MAX_FRAMES, and decode max_len (the CLI's -ml 32 /
    bench's corpus max_len) covers MAX_TOKENS + BOS/EOS — the r4 bench
    regression was exactly a max_len shorter than the corpus."""
    import os

    import yaml

    from opentransformer_tpu.models.registry import build_model

    root = os.path.join(os.path.dirname(__file__), "..", "egs", "synth_bench",
                        "conf")
    for name in ("flagship.yaml", "flagship_cont.yaml", "anchor.yaml"):
        cfg = yaml.safe_load(open(os.path.join(root, name)))
        model = build_model(cfg["model"])
        assert model.decoder_cfg["vocab_size"] == synth.VOCAB_SIZE
        bounds = cfg["data"]["bucket"]["bucket_boundaries"]
        assert max(bounds) >= synth.MAX_FRAMES
        assert cfg["data"].get("device_resident") is True
        assert synth.MAX_TOKENS + 2 <= 32  # the recipes decode with -ml 32
