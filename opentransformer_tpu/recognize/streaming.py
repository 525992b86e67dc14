"""Long-form / streaming decoding.

The reference has no long-audio support at all — sequences are bounded by
bucketing and O(T²) full attention (SURVEY §5 "long-context: none"). Here
long-form decoding comes from two composable pieces:

  * **Chunked encoder attention** (``ops/masks.chunk_attn_mask`` +
    ``chunk_size``/``left_chunks`` encoder config): bounded per-frame
    attention context, so encoder cost is O(T · chunk) and the model can be
    trained/run in a streaming-compatible mode (dual-mode chunked attention,
    as in joint online/offline conformers).

  * **Windowed encoding with overlap-discard** (this module): arbitrarily
    long audio is encoded in fixed windows with left/right acoustic context;
    only each window's center region is kept, so every retained frame saw
    enough context on both sides. Exact window-invariance requires a
    relative-position encoder (conformer / relpos transformer) with chunked
    attention whose span fits inside ``context``; an absolute-PE encoder
    restarts positions per window (usually benign, not bit-exact). Windows are static shapes — one XLA
    compilation regardless of audio length. The stitched memory then feeds
    the standard KV-cached batch beam search.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masks import length_to_mask, mask_to_length
from .base import SpeechToTextRecognizer, make_memory_search


def encode_windowed(
    model,
    params,
    feats: jnp.ndarray,  # f32[B, T, F]
    feat_lengths: np.ndarray,  # i32[B]
    window: int = 1200,  # frames per window (12 s)
    context: int = 200,  # one-sided acoustic context kept around each center
    encode_fn=None,  # optional pre-jitted (params, chunk, mask) -> (mem, mask)
):
    """Encode long inputs window-by-window, keeping only center regions.

    Returns (memory [B, T', D], memory_mask bool[B, T']) equivalent in layout
    to ``model.encode`` output. Frame t of window w covers input frames
    [w·center - context, w·center + window - context) where
    center = window - 2·context; retained outputs are the center frames.
    """
    b, t, f = feats.shape
    center = window - 2 * context
    assert center >= context > 0, (window, context)
    # exact frontend time mapping: output frame j starts at input frame
    # j * prod(strides) (conv frontend, no time padding)
    strides = model.frontend_cfg.get("stride", [2, 2]) if hasattr(model, "frontend_cfg") else [2, 2]
    factor = 1
    for s in strides:
        factor *= int(s)
    assert context % factor == 0 and center % factor == 0, (context, center, factor)

    if encode_fn is None:
        # NOTE: per-call jit means re-tracing per invocation; recognizers
        # pass a pre-built encode_fn (see LongFormRecognizer._build)
        encode_fn = jax.jit(
            lambda params, chunk, chunk_mask: model.apply(
                params, chunk, chunk_mask, method="encode"
            )
        )
    encode_one = encode_fn

    n_windows = max(1, -(-t // center))
    pieces = []
    piece_masks = []
    for w in range(n_windows):
        # keep centers [w*center, (w+1)*center); window 0 starts at input 0
        # (no fake zero left-context), later windows start center-context in.
        start = 0 if w == 0 else w * center - context
        hi = min(start + window, t)
        chunk = feats[:, start:hi]
        pad_right = window - (hi - start)
        if pad_right:
            chunk = jnp.pad(chunk, ((0, 0), (0, pad_right), (0, 0)))
        valid = np.clip(feat_lengths - start, 0, hi - start)
        chunk_mask = length_to_mask(jnp.asarray(valid), window)
        mem, mem_mask = encode_one(params, chunk, chunk_mask)
        off = 0 if w == 0 else context
        c_lo = off // factor
        c_hi = min((off + center) // factor, mem.shape[1])
        pieces.append(mem[:, c_lo:c_hi])
        piece_masks.append(mem_mask[:, c_lo:c_hi])
    memory = jnp.concatenate(pieces, axis=1)
    memory_mask = jnp.concatenate(piece_masks, axis=1)
    return memory, memory_mask


class LongFormRecognizer(SpeechToTextRecognizer):
    """Beam-search recognizer whose encoder runs in overlapping windows.

    Use for inputs far beyond the training length distribution (lectures,
    meetings): encoder memory grows linearly, window compilation is reused,
    and the KV-cached decode is unchanged (BASELINE config #5).
    """

    def __init__(self, *args, window: int = 1200, context: int = 200, **kwargs):
        self.window = int(window)
        self.context = int(context)
        super().__init__(*args, **kwargs)

    def _build(self):
        model = self.model

        # one jitted window encoder shared across all recognize() calls
        self._encode_fn = jax.jit(
            lambda params, chunk, chunk_mask: model.apply(
                params, chunk, chunk_mask, method="encode"
            )
        )
        search = make_memory_search(
            model, self.beam_width, self.max_len, self.penalty, self.lamda,
            lm=self.lm, lm_params=self.lm_params, lm_weight=self.lm_weight)

        def run(params, feats, feat_mask):
            lengths = np.asarray(mask_to_length(feat_mask))
            if feats.shape[1] <= self.window:
                memory, memory_mask = self._encode_fn(params, feats, feat_mask)
            else:
                memory, memory_mask = encode_windowed(
                    model, params, feats, lengths, self.window, self.context,
                    encode_fn=self._encode_fn,
                )
            return search(params, memory, memory_mask)

        return run
