#!/usr/bin/env python
"""Legacy decoding entry point.

The reference ships ``test.py`` as a near-duplicate of ``eval.py``
(SURVEY §2: minus the dev→test path rewrite). Here it is an alias of the
same driver for CLI parity.
"""
from opentransformer_tpu.cli.eval import main

if __name__ == "__main__":
    raise SystemExit(main())
