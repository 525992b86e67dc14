"""Inference: batch beam search, greedy/CTC decoding, recognizers."""

from .base import build_recognizer  # noqa: F401
