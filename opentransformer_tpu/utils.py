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
