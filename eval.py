#!/usr/bin/env python
"""Top-level decoding entry point (CLI parity with the reference ``eval.py``)."""
from opentransformer_tpu.cli.eval import main

if __name__ == "__main__":
    raise SystemExit(main())
