#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (model.epoch.N.pt) into an orbax
checkpoint decodable by eval.py.

Usage: python tools/import_reference.py model.epoch.N.pt out_expdir
Writes <out_expdir>/model.imported + config.json (from the embedded config).
"""

import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from opentransformer_tpu.compat import load_reference_checkpoint  # noqa: E402
from opentransformer_tpu.train.checkpoint import Checkpointer  # noqa: E402


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    pt_path, expdir = sys.argv[1], sys.argv[2]
    variables, cfg = load_reference_checkpoint(pt_path)
    ck = Checkpointer(expdir, config=cfg if cfg else None)
    out = ck.save_params_only("model.imported", variables)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
