"""Combinatorial config smoke: every encoder/norm/attention/activation combo
must build, forward, and produce finite gradients."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.models.registry import build_model
from tests.test_models import make_batch, VOCAB

COMBOS = list(itertools.product(
    ["transformer", "conformer"],      # encoder type
    [False, True],                     # normalize_before (transformer only)
    [False, True],                     # relative_positional
    ["relu", "glu"],                   # activation
))


@pytest.mark.parametrize("enc_type,pre_norm,relpos,act", COMBOS)
def test_config_combo(enc_type, pre_norm, relpos, act):
    # glu combos also run with an MoE FFN (top-1 on post-norm, top-2 on
    # pre-norm) so the mixture path is exercised across both encoder
    # families x relpos without extra parametrizations
    moe = {"moe_experts": 2, "moe_top_k": 2 if pre_norm else 1,
           "moe_capacity_factor": 2.0} if act == "glu" else {}
    if enc_type == "conformer":
        enc = {"d_model": 32, "n_heads": 2, "d_ff": 64, "nblocks": 1,
               "cov_kernel_size": 5, "relative_positional": relpos,
               "activation": act, "macaron_style": pre_norm, **moe}
    else:
        enc = {"d_model": 32, "n_heads": 2, "d_ff": 64, "n_blocks": 1,
               "normalize_before": pre_norm, "relative_positional": relpos,
               "activation": act, "concat_after": pre_norm, **moe}  # also cover concat_after
    cfg = {
        "type": "speech2text",
        "frontend_type": "conv",
        "frontend": {"input_size": 20, "output_size": 32, "mid_channel": 4,
                     "out_channel": 8, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
        "encoder_type": enc_type,
        "encoder": enc,
        "decoder": {"vocab_size": VOCAB, "d_model": 32, "n_heads": 2, "d_ff": 64,
                    "n_blocks": 1, "normalize_before": pre_norm,
                    "share_embedding": not pre_norm, "activation": act},
        "ctc_weight": 0.3 if relpos else 0.0,
        "smoothing": 0.1,
    }
    model = build_model(cfg)
    feats, feat_mask, targets, targets_length = make_batch(b=2, t=33)
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)

    def f(p):
        l, _ = model.apply(p, feats, feat_mask, targets, targets_length)
        return l

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(grads))

    # decode a couple of steps through the cached path
    memory, memory_mask = model.apply(params, feats, feat_mask, method="encode")
    cache = model.apply(params, memory, 4, 1, method="init_cache")
    logp, cache = model.apply(params, jnp.ones((2,), jnp.int32), cache,
                              jnp.asarray(0), memory_mask, method="decode_step")
    assert np.all(np.isfinite(np.asarray(logp)))
