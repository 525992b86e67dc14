"""Model library: frontends, encoders, decoders, end-to-end models, LMs."""

from .registry import build_model  # noqa: F401
