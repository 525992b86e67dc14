#!/usr/bin/env python
"""Frequency-sorted character vocab with the 3 reserved ids
(parity with reference ``egs/aishell/local/generate_vocab.py:33-43``):
PAD=0, <S/E>=1, UNK=2, then units by descending frequency."""

from __future__ import annotations

import argparse
import collections


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("text", help="tokenized text file (utt tok tok ...)")
    p.add_argument("vocab", help="output vocab path")
    p.add_argument("--min_count", type=int, default=1)
    args = p.parse_args()

    counter: collections.Counter = collections.Counter()
    with open(args.text, "r", encoding="utf-8") as f:
        for line in f:
            counter.update(line.strip().split()[1:])

    with open(args.vocab, "w", encoding="utf-8") as f:
        f.write("<PAD> 0\n<S/E> 1\n<UNK> 2\n")
        idx = 3
        for unit, count in counter.most_common():
            if count < args.min_count:
                break
            f.write(f"{unit} {idx}\n")
            idx += 1
    print(f"vocab size {idx}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
