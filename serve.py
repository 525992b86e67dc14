#!/usr/bin/env python
"""Top-level serving entry point (dynamic-batching inference daemon)."""
from opentransformer_tpu.cli.serve import main

if __name__ == "__main__":
    raise SystemExit(main())
