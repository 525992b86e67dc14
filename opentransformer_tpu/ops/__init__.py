"""Numeric ops: masks, losses, feature kernels, edit distance."""
