"""Model library tests: shapes, masks, loss finiteness, cached-decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.masks import length_to_mask

VOCAB = 40


def small_model_cfg(encoder_type="transformer", ctc_weight=0.0):
    enc = {
        "d_model": 32,
        "n_heads": 2,
        "d_ff": 64,
        "n_blocks": 2,
        "residual_dropout": 0.1,
        "normalize_before": False,
        "activation": "glu",
        "relative_positional": False,
    }
    if encoder_type == "conformer":
        enc = {
            "d_model": 32,
            "n_heads": 2,
            "d_ff": 64,
            "nblocks": 2,
            "cov_kernel_size": 7,
            "macaron_style": True,
            "relative_positional": True,
        }
    return {
        "type": "speech2text",
        "frontend_type": "conv",
        "frontend": {
            "input_size": 20,
            "output_size": 32,
            "in_channel": 1,
            "mid_channel": 4,
            "out_channel": 8,
            "kernel_size": [[3, 3], [3, 3]],
            "stride": [2, 2],
        },
        "encoder_type": encoder_type,
        "encoder": enc,
        "decoder": {
            "vocab_size": VOCAB,
            "d_model": 32,
            "n_heads": 2,
            "d_ff": 64,
            "n_blocks": 2,
            "share_embedding": True,
            "activation": "glu",
        },
        "ctc_weight": ctc_weight,
        "smoothing": 0.1,
    }


def make_batch(b=2, t=37, f=20, u=6):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    feat_len = jnp.asarray([t, t - 9])
    feat_mask = length_to_mask(feat_len, t)
    # targets: BOS + y + EOS + PAD
    tgt = np.zeros((b, u + 2), np.int32)
    lens = np.array([u, u - 2])
    for i in range(b):
        tgt[i, 0] = 1
        tgt[i, 1 : 1 + lens[i]] = rng.integers(3, VOCAB, lens[i])
        tgt[i, 1 + lens[i]] = 1
    targets = jnp.asarray(tgt)
    targets_length = jnp.asarray(lens + 1)  # y + EOS
    return feats, feat_mask, targets, targets_length


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_speech2text_forward(encoder_type):
    model = build_model(small_model_cfg(encoder_type))
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    loss, aux = model.apply(params, feats, feat_mask, targets, targets_length)
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_hybrid_ctc_loss():
    model = build_model(small_model_cfg(ctc_weight=0.3))
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    loss, aux = model.apply(params, feats, feat_mask, targets, targets_length)
    assert "ctc_loss" in aux and "att_loss" in aux
    expected = 0.7 * float(aux["att_loss"]) + 0.3 * float(aux["ctc_loss"])
    assert np.isclose(float(loss), expected, rtol=1e-5)


def test_padding_invariance():
    """Extra padding frames must not change the loss (mask correctness)."""
    model = build_model(small_model_cfg())
    feats, feat_mask, targets, targets_length = make_batch(t=37)
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    loss1, _ = model.apply(params, feats, feat_mask, targets, targets_length)

    pad = jnp.zeros((feats.shape[0], 8, feats.shape[2]), feats.dtype)
    feats2 = jnp.concatenate([feats, 7.0 + pad], axis=1)  # junk in padding
    mask2 = jnp.concatenate([feat_mask, jnp.zeros((2, 8), bool)], axis=1)
    loss2, _ = model.apply(params, feats2, mask2, targets, targets_length)
    # frontend conv (time pad 0) lets edge frames see 1-2 junk frames at the
    # boundary; encoder mask clips the rest. Allow only tiny leakage.
    assert np.isclose(float(loss1), float(loss2), rtol=2e-2)


def test_cached_decode_matches_full_forward():
    """decode_step over a cache must reproduce full-prefix log-probs."""
    model = build_model(small_model_cfg())
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)

    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
    u = 5
    tokens = targets[:, : u + 1]  # BOS + first u tokens

    # full forward log-probs at each position
    logits = model.apply(params, tokens, memory, memory_mask, method="decode_full")
    full_logp = jax.nn.log_softmax(logits, axis=-1)

    # incremental
    cache = model.apply(params, memory, u + 1, method="init_cache")
    step_logps = []
    for i in range(u + 1):
        logp, cache = model.apply(
            params, tokens[:, i], cache, jnp.asarray(i), memory_mask, method="decode_step"
        )
        step_logps.append(logp)
    step_logp = jnp.stack(step_logps, axis=1)
    np.testing.assert_allclose(np.asarray(full_logp), np.asarray(step_logp), rtol=2e-4, atol=2e-4)


def test_lm_models():
    from opentransformer_tpu.models.registry import build_model as bm

    for cfg in (
        {"type": "transformer_lm", "vocab_size": VOCAB, "num_blocks": 2, "d_model": 32, "n_heads": 2, "d_ff": 64},
        {"type": "rnn_lm", "vocab_size": VOCAB, "num_layers": 2, "hidden_size": 32},
    ):
        model = bm(cfg)
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.integers(1, VOCAB, (2, 7)), jnp.int32)
        tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 7)), jnp.int32)
        lens = jnp.asarray([7, 5])
        params = model.init(jax.random.PRNGKey(0), src, tgt, lens)
        loss, _ = model.apply(params, src, tgt, lens)
        assert np.isfinite(float(loss))


def test_transformer_lm_cached_decode():
    from opentransformer_tpu.models.lm import TransformerLanguageModel

    model = TransformerLanguageModel(vocab_size=VOCAB, num_blocks=2, d_model=32, n_heads=2, d_ff=64)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(1, VOCAB, (3, 6)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, tokens, jnp.asarray([6, 6, 6]))

    logits = model.apply(params, tokens, method="logits")
    full_logp = jax.nn.log_softmax(logits, axis=-1)

    cache = model.apply(params, 3, 6, method="init_cache")
    outs = []
    for i in range(6):
        logp, cache = model.apply(params, tokens[:, i], cache, jnp.asarray(i), method="decode_step")
        outs.append(logp)
    step_logp = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full_logp), np.asarray(step_logp), rtol=2e-4, atol=2e-4)
