"""Streaming / long-form tests: chunked attention mask semantics, windowed
encoding consistency, long-form decode."""

import jax
import jax.numpy as jnp
import numpy as np

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.masks import chunk_attn_mask, length_to_mask
from opentransformer_tpu.recognize.streaming import LongFormRecognizer, encode_windowed
from tests.test_models import small_model_cfg, VOCAB


def test_chunk_attn_mask_semantics():
    m = np.asarray(chunk_attn_mask(8, 2, left_chunks=1))[0, 0]
    # frame 5 (chunk 2) may see chunks 1..2 = frames 2..5, not 0..1 or 6..7
    assert list(np.where(m[5])[0]) == [2, 3, 4, 5]
    # unlimited left context
    m = np.asarray(chunk_attn_mask(8, 2, left_chunks=-1))[0, 0]
    assert list(np.where(m[5])[0]) == [0, 1, 2, 3, 4, 5]
    assert not m[1, 2]  # never future chunks


def test_chunked_encoder_is_causal_at_chunk_level():
    """Changing future-chunk input must not affect earlier chunk outputs
    when left_chunks bounds the context."""
    cfg = small_model_cfg()
    cfg["encoder"]["chunk_size"] = 4
    cfg["encoder"]["left_chunks"] = 2
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 64, 20)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    tgt = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt, jnp.asarray([4]))

    mem1, _ = model.apply(params, feats, mask, method="encode")
    feats2 = feats.at[:, 48:, :].set(0.0)  # perturb tail frames
    mem2, _ = model.apply(params, feats2, mask, method="encode")
    # memory frames from early chunks must be identical; frontend conv is
    # local (reach ~2 input frames after x4 subsample), so compare well clear
    # of the perturbation: mem frame 8 covers input ~frames 32..38 < 48.
    np.testing.assert_allclose(np.asarray(mem1[:, :8]), np.asarray(mem2[:, :8]), atol=1e-5)
    assert float(jnp.max(jnp.abs(mem1[:, -2:] - mem2[:, -2:]))) > 1e-3


def test_windowed_encode_matches_full_for_chunked_encoder():
    """With a chunked (bounded-context) encoder, windowed encoding with
    enough context reproduces full encoding on the interior."""
    cfg = small_model_cfg()
    cfg["encoder"]["chunk_size"] = 4
    cfg["encoder"]["left_chunks"] = 1
    # relative positions: absolute PE would restart per window and break
    # window-invariance (documented in streaming.py)
    cfg["encoder"]["relative_positional"] = True
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    # context must cover the stacked receptive field: n_blocks(2) x
    # left_chunks(1) x chunk_size(4) encoder frames x subsample(4) = 32
    t = 192
    feats = jnp.asarray(rng.normal(size=(2, t, 20)), jnp.float32)
    lengths = np.asarray([t, t - 10])
    mask = length_to_mask(jnp.asarray(lengths), t)
    tgt = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt, jnp.asarray([4, 4]))

    full_mem, full_mask = model.apply(params, feats, mask, method="encode")
    win_mem, win_mask = encode_windowed(model, params, feats, lengths, window=96, context=32)
    # shapes: both should cover ~t/4 frames
    assert abs(win_mem.shape[1] - full_mem.shape[1]) <= 2
    n = min(win_mem.shape[1], full_mem.shape[1])
    # most interior frames should agree closely (boundary frames may differ
    # where encoder context got clipped at window edges)
    diff = np.abs(np.asarray(win_mem[:, :n]) - np.asarray(full_mem[:, :n])).max(axis=-1)
    close = (diff < 1e-3).mean()
    assert close > 0.9, f"only {close:.0%} of frames match"


def test_long_form_recognizer_runs():
    cfg = small_model_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(2)
    t = 400  # longer than window=128 below
    feats = jnp.asarray(rng.normal(size=(2, t, 20)), jnp.float32)
    mask = jnp.ones((2, t), bool)
    tgt = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tgt, jnp.asarray([4, 4]))

    rec = LongFormRecognizer(model, params, beam_width=2, max_len=8, window=128, context=32)
    texts, scores = rec.recognize(feats, mask)
    assert len(texts) == 2 and len(texts[0]) == 2
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
