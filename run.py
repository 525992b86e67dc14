#!/usr/bin/env python
"""Top-level training entry point (CLI parity with the reference ``run.py``)."""
from opentransformer_tpu.cli.run import main

if __name__ == "__main__":
    raise SystemExit(main())
