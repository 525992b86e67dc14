#!/usr/bin/env python
"""Export an orbax checkpoint to the reference's torch ``.pt`` format.

Usage: python tools/export_reference.py <expdir-or-checkpoint-dir> <out.pt>

The output loads in the reference repo's ``eval.py``/``test.py``
(component-wise state dicts + embedded config) — the inverse of
``tools/import_reference.py``. Exact-logit round-trip is tested in
``tests/test_torch_parity.py``.
"""
import sys

sys.path.insert(0, ".")

import torch  # noqa: E402

from opentransformer_tpu.cli.eval import load_checkpoint  # noqa: E402
from opentransformer_tpu.compat import export_reference_checkpoint  # noqa: E402


def main(ckpt_path: str, out_path: str) -> None:
    variables, cfg = load_checkpoint(ckpt_path)
    if cfg is None:
        raise SystemExit("error: no config embedded in the checkpoint")
    chkpt = export_reference_checkpoint(variables, cfg)
    torch.save(chkpt, out_path)
    print(out_path)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
