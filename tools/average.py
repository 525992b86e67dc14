#!/usr/bin/env python
"""Checkpoint averaging (CLI parity with reference ``tools/average.py``)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from opentransformer_tpu.cli.average import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
