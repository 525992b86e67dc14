"""Edit distance + WER/CER scoring.

Replaces the reference's external C++ ``editdistance`` dependency
(``eval.py:168``, ``tools/computer_wer.py:30``) with a dependency-free
O(len_a · len_b) two-row DP.
"""

from __future__ import annotations

from typing import Sequence


def edit_distance(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


class ErrorRateAccumulator:
    """Corpus-level WER/CER: sum(edit distances) / sum(reference lengths)."""

    def __init__(self):
        self.errors = 0
        self.tokens = 0
        self.utts = 0

    def update(self, ref: Sequence, hyp: Sequence) -> int:
        d = edit_distance(ref, hyp)
        self.errors += d
        self.tokens += len(ref)
        self.utts += 1
        return d

    @property
    def rate(self) -> float:
        return self.errors / max(self.tokens, 1)
