#!/usr/bin/env python
"""Standalone WER/CER scorer (parity with reference ``tools/computer_wer.py``
minus the external C++ editdistance dep).

Usage: python tools/computer_wer.py ref_text hyp_text
Both files: ``utt tok tok ...`` lines; prints corpus WER and per-utt errors.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from opentransformer_tpu.ops.levenshtein import ErrorRateAccumulator  # noqa: E402


def read(path):
    out = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                out[parts[0]] = parts[1:]
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    refs, hyps = read(sys.argv[1]), read(sys.argv[2])
    acc = ErrorRateAccumulator()
    for utt, ref in refs.items():
        hyp = hyps.get(utt, [])
        d = acc.update(ref, hyp)
        if d:
            print(f"{utt} errors={d} ref={' '.join(ref)} hyp={' '.join(hyp)}")
    print(f"WER {acc.rate * 100:.2f}% ({acc.errors}/{acc.tokens}) over {acc.utts} utts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
