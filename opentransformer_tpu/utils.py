"""Misc utilities: parameter census and pytree helpers.

Parity: reference ``otrans/utils.py:105-121`` logs a per-submodule parameter
census at startup (``run.py:36``); ``average_parameters`` lives in
``train/checkpoint.py``. The reference's hardcoded-credential ``sendEmail``
is intentionally not ported (SURVEY §8 vestiges).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def count_parameters(params: Any) -> dict[str, int]:
    """Per-top-level-submodule parameter counts + total (in elements)."""
    tree = params.get("params", params) if isinstance(params, dict) else params
    counts: dict[str, int] = {}
    total = 0
    for name, sub in tree.items():
        n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(sub))
        counts[name] = n
        total += n
    counts["total"] = total
    return counts


def format_parameter_census(params: Any) -> str:
    counts = count_parameters(params)
    total = counts.pop("total")
    lines = [f"  {k}: {v / 1e6:.2f}M" for k, v in sorted(counts.items())]
    lines.append(f"  total: {total / 1e6:.2f}M parameters")
    return "\n".join(lines)


class GrowingBuffer:
    """Append-only numpy buffer growing along one axis with capacity
    doubling (amortized O(1) per append).

    The streaming-attention recognizers accumulate encoder memory chunk by
    chunk and re-decode on a cadence; naive per-chunk ``np.concatenate``
    re-copies the whole history every time — O(T²) host work over a long
    stream's life. This buffer keeps one allocation and returns a view.
    """

    def __init__(self, axis: int = 0):
        self.axis = axis
        self.buf: Any = None
        self.n = 0

    def append(self, x: np.ndarray) -> None:
        t = x.shape[self.axis]
        if self.buf is None:
            shape = list(x.shape)
            shape[self.axis] = max(64, t)
            self.buf = np.empty(shape, x.dtype)
        if self.n + t > self.buf.shape[self.axis]:
            shape = list(self.buf.shape)
            shape[self.axis] = max(self.n + t, 2 * shape[self.axis])
            nb = np.empty(shape, self.buf.dtype)
            sl = [slice(None)] * nb.ndim
            sl[self.axis] = slice(0, self.n)
            nb[tuple(sl)] = self.view()
            self.buf = nb
        sl = [slice(None)] * self.buf.ndim
        sl[self.axis] = slice(self.n, self.n + t)
        self.buf[tuple(sl)] = x
        self.n += t

    def view(self) -> np.ndarray:
        """Zero-copy [.., n, ..] view of the appended data (None if empty)."""
        if self.buf is None:
            return None
        sl = [slice(None)] * self.buf.ndim
        sl[self.axis] = slice(0, self.n)
        return self.buf[tuple(sl)]
