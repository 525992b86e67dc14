"""Checkpoint-averaging CLI (reference ``tools/average.py``: expdir start end).

Unlike the reference tool — which silently no-ops on speech checkpoints
because it only averages the 'model' key (SURVEY §8.8) — this averages the
full params pytree for any model type.
"""

from __future__ import annotations

import argparse

from ..train.checkpoint import Checkpointer


def main(argv=None) -> int:
    from . import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    p = argparse.ArgumentParser(description="Average checkpoints over an epoch range")
    p.add_argument("expdir", type=str)
    p.add_argument("start_epoch", type=int)
    p.add_argument("end_epoch", type=int)
    args = p.parse_args(argv)

    ck = Checkpointer(args.expdir)
    out = ck.average(args.start_epoch, args.end_epoch)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
