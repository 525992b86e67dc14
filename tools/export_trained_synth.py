#!/usr/bin/env python
"""Export trained flagship params to a compact in-repo npz for bench.py.

The tunnel's D2H is ~0.7 MB/s and orbax checkpoints carry optimizer state,
so the full expdir stays out of git; this exports the averaged PARAMS ONLY,
cast to float16 (~54 MB instead of ~108 MB f32), keyed by flattened pytree
paths. bench.py reloads it with ``load_trained_params`` and measures CER +
RTFx on the same weights (VERDICT r2 item 1).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEP = "//"


def flatten_params(params) -> dict:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = SEP.join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def load_trained_params(path: str, dtype=np.float32):
    """npz → nested params dict (float32 by default; weights stored f16)."""
    tree: dict = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split(SEP)
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key].astype(dtype)
    return tree


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="orbax checkpoint dir (model.average.*)")
    p.add_argument("out", help="output .npz path")
    args = p.parse_args(argv)

    from opentransformer_tpu.cli.eval import load_checkpoint

    params, _ = load_checkpoint(args.checkpoint)
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **{k: v.astype(np.float16) for k, v in flat.items()})
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: {len(flat)} arrays, {mb:.1f} MB (f16)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
