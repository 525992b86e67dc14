"""Synthetic benchmark corpus at flagship geometry (deterministic).

The image is zero-egress, so the reference's AISHELL-1 headline
(``/root/reference/README.md:92``: 6.7% CER) cannot be reproduced on the
real corpus here. This module is the next-best evidence: a hard synthetic
corpus at the FLAGSHIP geometry (40-dim features, 4233-entry vocab, ~300
active units, utterances up to ~11 s) on which the flagship model trains to
near-zero CER on a held-out split — so recognition QUALITY and decode SPEED
can be measured on the SAME trained weights (bench.py reports
``cer_trained`` next to ``rtfx_trained`` / ``rtfx_worst_case``).

Corpus construction (everything derives from fixed seeds — any process can
regenerate any split bit-exactly without shipping feature files):

  * each unit u has a random 40-dim acoustic pattern ``p_u``;
  * a token is emitted as ``p_u`` tiled for a random 24-40 frame duration
    (variable durations: alignment must be learned, not counted);
  * utterances are 8-28 tokens drawn uniformly from the 300 active units,
    adjacent repeats allowed (the hardest stop/boundary case), terminated
    by a distinct end-of-utterance cue pattern;
  * additive Gaussian noise at sigma=0.3 on every frame — BAKED into the
    dev/test arks (deterministic held-out sets) but NOT into the train ark:
    the train split is written clean and the training config injects fresh
    noise at load time (``data.additive_noise_std: 0.3``, KaldiDataset).
    Baked train noise is a memorization handle: a flagship-sized model
    (36M params) on 3k utts learns per-utterance noise fingerprints instead
    of the pattern→unit mapping (round-3 postmortem: train acc 71%, test
    acc at chance). Fresh per-epoch noise makes that solution impossible.

The vocab still has 4233 entries (3 specials + 4230 units) so the decoder's
output projection — the dominant decode-step matmul — matches the AISHELL
flagship exactly; only the first 300 units appear in data.
"""

from __future__ import annotations

import os

import numpy as np

FEAT_DIM = 40
VOCAB_SIZE = 4233  # matches the AISHELL flagship decoder (__graft_entry__.py)
N_ACTIVE_UNITS = 300
MIN_TOKENS, MAX_TOKENS = 8, 28
MIN_DUR, MAX_DUR = 24, 40  # frames per token (10 ms frames)
END_DUR = 24
NOISE_SIGMA = 0.3
PATTERN_SEED = 7
SPLIT_SEEDS = {"train": 100, "dev": 200, "test": 300}
# train must be LARGE relative to model capacity: at 3k utts the flagship
# (36M params) finds the memorizing solution (utterance-identity →
# transcript; TF-acc 81% train / 4% test even with fresh load-time noise,
# round-3 postmortem #2) — 20k utts plus SpecAugment plus a CTC auxiliary
# head make per-frame pattern→unit classification the cheapest solution.
SPLIT_SIZES = {"train": 20000, "dev": 200, "test": 500}
MAX_FRAMES = MAX_TOKENS * MAX_DUR + END_DUR  # 1144


def unit_names() -> list:
    return [f"u{i:04d}" for i in range(VOCAB_SIZE - 3)]


def make_vocab() -> dict:
    vocab = {"<PAD>": 0, "<S/E>": 1, "<UNK>": 2}
    for i, u in enumerate(unit_names()):
        vocab[u] = 3 + i
    return vocab


def make_patterns() -> np.ndarray:
    """[N_ACTIVE_UNITS + 1, FEAT_DIM]; last row is the end-of-utterance cue."""
    rng = np.random.default_rng(PATTERN_SEED)
    return (rng.normal(size=(N_ACTIVE_UNITS + 1, FEAT_DIM)) * 2.0).astype(np.float32)


def gen_utterance(rng: np.random.Generator, patterns: np.ndarray,
                  noise: bool = True):
    """-> (feats [T, FEAT_DIM] f32, token_unit_indices list[int])."""
    n_tok = int(rng.integers(MIN_TOKENS, MAX_TOKENS + 1))
    toks = rng.integers(0, N_ACTIVE_UNITS, n_tok).tolist()
    segs = [np.tile(patterns[t], (int(rng.integers(MIN_DUR, MAX_DUR + 1)), 1))
            for t in toks]
    segs.append(np.tile(patterns[N_ACTIVE_UNITS], (END_DUR, 1)))
    feats = np.concatenate(segs).astype(np.float32)
    if noise:
        feats += (NOISE_SIGMA * rng.normal(size=feats.shape)).astype(np.float32)
    return feats, [int(t) for t in toks]


def gen_split(name: str, n_utts: int | None = None):
    """Yields (utt_id, feats, unit_indices) deterministically for a split.

    The train split is emitted CLEAN (noise comes from load-time
    augmentation, see module docstring); dev/test carry baked noise so the
    held-out sets are bit-reproducible."""
    patterns = make_patterns()
    rng = np.random.default_rng(SPLIT_SEEDS[name])
    n = SPLIT_SIZES[name] if n_utts is None else int(n_utts)
    for i in range(n):
        feats, toks = gen_utterance(rng, patterns, noise=(name != "train"))
        yield f"{name}{i:05d}", feats, toks


def write_corpus(root: str, splits=("train", "dev", "test"), n_utts=None) -> None:
    """Materialize vocab + per-split feats.ark/feats.scp/text under root."""
    from .kaldi_io import write_ark
    from . import write_vocab

    os.makedirs(root, exist_ok=True)
    write_vocab(make_vocab(), os.path.join(root, "vocab"))
    units = unit_names()
    for split in splits:
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        feats, lines = {}, []
        for utt, x, toks in gen_split(split, None if n_utts is None else n_utts.get(split)):
            feats[utt] = x
            lines.append(f"{utt} " + " ".join(units[t] for t in toks))
        write_ark(os.path.join(sdir, "feats.ark"), feats,
                  os.path.join(sdir, "feats.scp"))
        with open(os.path.join(sdir, "text"), "w") as f:
            f.write("\n".join(lines) + "\n")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Generate the synthetic benchmark corpus")
    p.add_argument("root", help="output directory")
    p.add_argument("--splits", nargs="*", default=["train", "dev", "test"])
    args = p.parse_args(argv)
    write_corpus(args.root, splits=tuple(args.splits))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
