"""Logit A/B parity against the actual reference PyTorch model.

The reference tree is mounted read-only at /root/reference; its model code
imports cleanly on CPU torch given two sys.path entries (its ``ffn.py`` uses
a broken absolute import, SURVEY §8.1). We random-init the reference
SpeechToText, export its state dicts through our converter
(``opentransformer_tpu.compat``), and require logits to match to ~1e-4 —
the strongest possible parity evidence without trained checkpoints.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")

for p in (REF, os.path.join(REF, "otrans", "module")):
    if p not in sys.path:
        sys.path.insert(0, p)

VOCAB = 50
MODEL_CFG = {
    "type": "speech2text",
    "frontend_type": "conv",
    "frontend": {
        "input_size": 20, "output_size": 32, "in_channel": 1, "mid_channel": 4,
        "out_channel": 8, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2],
        "dropout": 0.0, "act_func_type": "relu", "front_end_layer_norm": False,
    },
    "encoder_type": "transformer",
    "encoder": {
        "d_model": 32, "n_heads": 2, "d_ff": 48, "n_blocks": 2,
        "pos_dropout": 0.0, "slf_attn_dropout": 0.0, "ffn_dropout": 0.0,
        "residual_dropout": 0.0, "normalize_before": False, "concat_after": False,
        "activation": "glu", "relative_positional": False,
    },
    "decoder_type": "transformer",
    "decoder": {
        "vocab_size": VOCAB, "d_model": 32, "n_heads": 2, "d_ff": 48,
        "memory_dim": 32, "n_blocks": 2, "pos_dropout": 0.0,
        "slf_attn_dropout": 0.0, "src_attn_dropout": 0.0, "ffn_dropout": 0.0,
        "residual_dropout": 0.0, "activation": "glu", "normalize_before": False,
        "concat_after": False, "share_embedding": True,
    },
    "ctc_weight": 0.0,
    "smoothing": 0.1,
}


def build_torch_model():
    from otrans.model.speech2text import SpeechToText as TorchS2T

    torch.manual_seed(0)
    m = TorchS2T(MODEL_CFG)
    m.eval()
    return m


def torch_logits(model, feats, feat_mask, target_in):
    with torch.no_grad():
        x, mask = model.frontend(torch.from_numpy(feats), torch.from_numpy(feat_mask))
        memory, memory_mask, _ = model.encoder(x, mask)
        logits, _ = model.decoder(torch.from_numpy(target_in), memory, memory_mask)
    return logits.numpy(), memory.numpy(), memory_mask.numpy()


@pytest.mark.parametrize("normalize_before", [False, True])
def test_logits_match_reference(normalize_before):
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import convert_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model

    cfg = {**MODEL_CFG}
    cfg["encoder"] = {**MODEL_CFG["encoder"], "normalize_before": normalize_before}
    cfg["decoder"] = {**MODEL_CFG["decoder"], "normalize_before": normalize_before}

    from otrans.model.speech2text import SpeechToText as TorchS2T

    torch.manual_seed(0)
    tmodel = TorchS2T(cfg)
    tmodel.eval()

    rng = np.random.default_rng(0)
    b, t, f, u = 2, 37, 20, 7
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    feat_mask[1, 30:] = False
    target_in = np.zeros((b, u), np.int64)
    target_in[:, 0] = 1
    target_in[:, 1:] = rng.integers(3, VOCAB, (b, u - 1))

    t_logits, t_memory, _ = torch_logits(tmodel, feats, feat_mask, target_in)

    chkpt = {
        "frontend": tmodel.frontend.state_dict(),
        "encoder": tmodel.encoder.state_dict(),
        "decoder": tmodel.decoder.state_dict(),
    }
    variables = convert_reference_checkpoint(chkpt, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build_model(cfg)
    memory, memory_mask = model.apply(
        params, jnp.asarray(feats), jnp.asarray(feat_mask), method="encode"
    )
    np.testing.assert_allclose(np.asarray(memory), t_memory, rtol=1e-3, atol=1e-4)

    logits = model.apply(
        params, jnp.asarray(target_in.astype(np.int32)), memory, memory_mask,
        method="decode_full",
    )
    np.testing.assert_allclose(np.asarray(logits), t_logits, rtol=1e-3, atol=2e-4)


def test_loss_matches_reference():
    """Label-smoothing loss parity on the same weights/batch."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import convert_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model

    tmodel = build_torch_model()
    rng = np.random.default_rng(1)
    b, t, f, u = 2, 33, 20, 6
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    targets = np.zeros((b, u + 2), np.int64)
    lens = [u, u - 2]
    for i in range(b):
        targets[i, 0] = 1
        targets[i, 1 : 1 + lens[i]] = rng.integers(3, VOCAB, lens[i])
        targets[i, 1 + lens[i]] = 1

    with torch.no_grad():
        t_loss, _ = tmodel(
            {"inputs": torch.from_numpy(feats), "mask": torch.from_numpy(feat_mask)},
            {"targets": torch.from_numpy(targets),
             "targets_length": torch.tensor([l + 1 for l in lens])},
        )

    chkpt = {
        "frontend": tmodel.frontend.state_dict(),
        "encoder": tmodel.encoder.state_dict(),
        "decoder": tmodel.decoder.state_dict(),
    }
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_reference_checkpoint(chkpt, MODEL_CFG)
    )
    model = build_model(MODEL_CFG)
    loss, _ = model.apply(
        params, jnp.asarray(feats), jnp.asarray(feat_mask),
        jnp.asarray(targets.astype(np.int32)), jnp.asarray([l + 1 for l in lens]),
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-4)


def test_hybrid_ctc_loss_matches_reference():
    """Hybrid (1-w)·att + w·ctc total loss parity, including the CTC head
    and the y+EOS label convention."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import convert_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model

    cfg = {**MODEL_CFG, "ctc_weight": 0.3, "encoder_output_size": 32}
    from otrans.model.speech2text import SpeechToText as TorchS2T

    torch.manual_seed(1)
    tmodel = TorchS2T(cfg)
    tmodel.eval()

    rng = np.random.default_rng(2)
    b, t, f, u = 2, 41, 20, 6
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    targets = np.zeros((b, u + 2), np.int64)
    lens = [u, u - 2]
    for i in range(b):
        targets[i, 0] = 1
        targets[i, 1 : 1 + lens[i]] = rng.integers(3, VOCAB, lens[i])
        targets[i, 1 + lens[i]] = 1

    with torch.no_grad():
        t_loss, t_aux = tmodel(
            {"inputs": torch.from_numpy(feats), "mask": torch.from_numpy(feat_mask)},
            {"targets": torch.from_numpy(targets),
             "targets_length": torch.tensor([l + 1 for l in lens])},
        )

    chkpt = {
        "frontend": tmodel.frontend.state_dict(),
        "encoder": tmodel.encoder.state_dict(),
        "decoder": tmodel.decoder.state_dict(),
        "ctc": tmodel.assistor.state_dict(),
    }
    params = jax.tree_util.tree_map(jnp.asarray, convert_reference_checkpoint(chkpt, cfg))
    model = build_model(cfg)
    loss, aux = model.apply(
        params, jnp.asarray(feats), jnp.asarray(feat_mask),
        jnp.asarray(targets.astype(np.int32)), jnp.asarray([l + 1 for l in lens]),
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=3e-4)
    np.testing.assert_allclose(float(aux["ctc_loss"]), float(t_aux["CTCLoss"]), rtol=3e-4)


def test_concat_after_logits_match_reference():
    """concat_after=True path parity (encoder concat_linear, decoder
    concat_linear1/2 and the no-dropout residual rule)."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import convert_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model

    cfg = {**MODEL_CFG}
    cfg["encoder"] = {**MODEL_CFG["encoder"], "concat_after": True}
    cfg["decoder"] = {**MODEL_CFG["decoder"], "concat_after": True}

    from otrans.model.speech2text import SpeechToText as TorchS2T

    torch.manual_seed(3)
    tmodel = TorchS2T(cfg)
    tmodel.eval()

    rng = np.random.default_rng(4)
    b, t, f, u = 2, 29, 20, 5
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    target_in = np.ones((b, u), np.int64)
    target_in[:, 1:] = rng.integers(3, VOCAB, (b, u - 1))

    t_logits, t_memory, _ = torch_logits(tmodel, feats, feat_mask, target_in)
    chkpt = {
        "frontend": tmodel.frontend.state_dict(),
        "encoder": tmodel.encoder.state_dict(),
        "decoder": tmodel.decoder.state_dict(),
    }
    params = jax.tree_util.tree_map(jnp.asarray, convert_reference_checkpoint(chkpt, cfg))
    model = build_model(cfg)
    memory, memory_mask = model.apply(params, jnp.asarray(feats), jnp.asarray(feat_mask), method="encode")
    np.testing.assert_allclose(np.asarray(memory), t_memory, rtol=1e-3, atol=1e-4)
    logits = model.apply(params, jnp.asarray(target_in.astype(np.int32)), memory, memory_mask, method="decode_full")
    np.testing.assert_allclose(np.asarray(logits), t_logits, rtol=1e-3, atol=2e-4)


def _lm_batch(rng, b, u, lens):
    """src = BOS⧺tokens⧺PAD, tgt = tokens⧺EOS⧺PAD (text-collate contract,
    reference ``data/loader.py:24-63``)."""
    src = np.zeros((b, u), np.int64)
    tgt = np.zeros((b, u), np.int64)
    for i, L in enumerate(lens):
        toks = rng.integers(3, VOCAB, L)
        src[i, 0] = 1
        src[i, 1 : 1 + L] = toks
        tgt[i, :L] = toks
        tgt[i, L] = 1
    return src, tgt


def test_transformer_lm_matches_reference(tmp_path):
    """Transformer LM: loss, full-sequence log-probs, and stepwise KV-cached
    decode all match the reference ``model/lm.py:94-163`` — via the full
    saved-.pt loading path (save_checkpoint → load_reference_lm_checkpoint)."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import load_reference_lm_checkpoint
    from opentransformer_tpu.models.registry import build_model
    from otrans.model.lm import TransformerLanguageModel as TorchTLM

    pcfg = {"type": "transformer_lm", "vocab_size": VOCAB, "num_blocks": 2,
            "d_model": 32, "n_heads": 2, "d_ff": 48, "residual_dropout": 0.1,
            "share_embedding": True, "smoothing": 0.1}
    torch.manual_seed(5)
    tlm = TorchTLM(pcfg)
    tlm.eval()

    rng = np.random.default_rng(7)
    b, u = 3, 9
    lens = [8, 5, 3]
    src, tgt = _lm_batch(rng, b, u, lens)

    with torch.no_grad():
        t_loss, _ = tlm({"inputs": torch.from_numpy(src)},
                        {"targets": torch.from_numpy(tgt)})
        t_logp = tlm.predict(torch.from_numpy(src), last_frame=False).numpy()

    pt = str(tmp_path / "lm.pt")
    tlm.save_checkpoint({"model": pcfg}, pt)
    variables_np, loaded_cfg = load_reference_lm_checkpoint(pt)
    assert loaded_cfg["model"]["num_blocks"] == 2
    variables = jax.tree_util.tree_map(jnp.asarray, variables_np)
    model = build_model(pcfg)

    loss, _ = model.apply(variables, jnp.asarray(src.astype(np.int32)),
                          jnp.asarray(tgt.astype(np.int32)),
                          jnp.asarray([L + 1 for L in lens]))
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-4)

    logits = model.apply(variables, jnp.asarray(src.astype(np.int32)), method="logits")
    ours_logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    np.testing.assert_allclose(ours_logp, t_logp, rtol=1e-3, atol=2e-4)

    # stepwise decode: cached step t must equal the full-prefix distribution
    cache = model.apply(variables, b, u, method="init_cache")
    for t in range(u - 1):
        logp, cache = model.apply(
            variables, jnp.asarray(src[:, t].astype(np.int32)), cache,
            jnp.asarray(t), method="decode_step")
        np.testing.assert_allclose(np.asarray(logp), t_logp[:, t], rtol=1e-3, atol=2e-4)


def test_rnn_lm_matches_reference():
    """LSTM LM: loss, full-sequence log-probs, and stepwise hidden-threaded
    decode match the reference ``model/lm.py:33-91`` (torch fused-gate
    weights split into flax per-gate kernels)."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import convert_rnn_lm
    from opentransformer_tpu.models.registry import build_model
    from otrans.model.lm import RecurrentLanguageModel as TorchRLM

    pcfg = {"type": "rnn_lm", "vocab_size": VOCAB, "num_layers": 2,
            "hidden_size": 24, "dropout": 0.1, "share_embedding": True,
            "smoothing": 0.1}
    torch.manual_seed(6)
    rlm = TorchRLM(pcfg)
    rlm.eval()

    rng = np.random.default_rng(8)
    b, u = 3, 8
    lens = [7, 4, 2]
    src, tgt = _lm_batch(rng, b, u, lens)

    with torch.no_grad():
        t_loss, _ = rlm({"inputs": torch.from_numpy(src)},
                        {"targets": torch.from_numpy(tgt)})
        t_logp, _ = rlm.predict(torch.from_numpy(src))
        t_logp = t_logp.numpy()

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_rnn_lm(rlm.state_dict(), 2, True))
    model = build_model(pcfg)

    loss, _ = model.apply(variables, jnp.asarray(src.astype(np.int32)),
                          jnp.asarray(tgt.astype(np.int32)),
                          jnp.asarray([L + 1 for L in lens]))
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-4)

    logits = model.apply(variables, jnp.asarray(src.astype(np.int32)), method="logits")
    ours_logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    np.testing.assert_allclose(ours_logp, t_logp, rtol=1e-3, atol=2e-4)

    hidden = model.apply(variables, b, method="init_hidden")
    for t in range(u - 1):
        logp, hidden = model.apply(
            variables, jnp.asarray(src[:, t].astype(np.int32)), hidden,
            method="decode_step")
        np.testing.assert_allclose(np.asarray(logp), t_logp[:, t], rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("relative_positional", [True, False])
def test_conformer_encoder_matches_reference(relative_positional):
    """ref_compat conformer import: encoder memory and decoder logits match
    the reference's *trained* forward (which skips the post-FFN, §8.2, and has
    no rel-pos out-proj, §8.3) with BatchNorm running stats mapped.
    residual_dropout must be 0 here: the reference uses functional F.dropout
    with training=True even under eval()."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import convert_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model

    ref_enc = {
        "d_model": 32, "n_heads": 2, "d_ff": 48, "nblocks": 2,
        "cov_kernel_size": 7, "pos_dropout": 0.0, "slf_attn_dropout": 0.0,
        "ffn_dropout": 0.0, "residual_dropout": 0.0, "conv_dropout": 0.0,
        "macaron_style": True, "ffn_scale": 0.5, "conv_bias": True,
        "positional_encoding": True, "relative_positional": relative_positional,
        "conv_first": False, "activation": "glu",
    }
    ref_cfg = {**MODEL_CFG, "encoder_type": "conformer", "encoder": ref_enc}

    from otrans.model.speech2text import SpeechToText as TorchS2T

    torch.manual_seed(9)
    tmodel = TorchS2T(ref_cfg)
    tmodel.eval()

    rng = np.random.default_rng(10)
    b, t, f, u = 2, 37, 20, 6
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    feat_mask[1, 28:] = False
    target_in = np.ones((b, u), np.int64)
    target_in[:, 1:] = rng.integers(3, VOCAB, (b, u - 1))

    t_logits, t_memory, _ = torch_logits(tmodel, feats, feat_mask, target_in)

    our_cfg = {**ref_cfg, "encoder": {**ref_enc, "conv_norm_type": "batch",
                                      "ref_compat": True}}
    chkpt = {
        "frontend": tmodel.frontend.state_dict(),
        "encoder": tmodel.encoder.state_dict(),
        "decoder": tmodel.decoder.state_dict(),
    }
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_reference_checkpoint(chkpt, our_cfg))
    model = build_model(our_cfg)

    memory, memory_mask = model.apply(
        variables, jnp.asarray(feats), jnp.asarray(feat_mask), method="encode")
    np.testing.assert_allclose(np.asarray(memory), t_memory, rtol=1e-3, atol=5e-4)

    logits = model.apply(
        variables, jnp.asarray(target_in.astype(np.int32)), memory, memory_mask,
        method="decode_full")
    np.testing.assert_allclose(np.asarray(logits), t_logits, rtol=1e-3, atol=1e-3)


def test_export_to_torch_roundtrip():
    """OUR randomly-initialized model exported to the reference .pt format
    must produce identical logits when run by the actual reference torch
    model — interchange works in both directions."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import export_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model
    from otrans.model.speech2text import SpeechToText as TorchS2T

    cfg = {**MODEL_CFG, "ctc_weight": 0.3, "encoder_output_size": 32,
           "lookahead_steps": 2}
    model = build_model(cfg)
    rng = np.random.default_rng(11)
    b, t, f, u = 2, 35, 20, 6
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    feat_mask[1, 29:] = False
    target_in = np.ones((b, u), np.int64)
    target_in[:, 1:] = rng.integers(3, VOCAB, (b, u - 1))
    tgt = np.ones((b, u + 1), np.int64)

    variables = model.init(
        jax.random.PRNGKey(3), jnp.asarray(feats), jnp.asarray(feat_mask),
        jnp.asarray(tgt.astype(np.int32)), jnp.asarray([u] * b))

    chkpt = export_reference_checkpoint(variables, {"model": cfg})
    tmodel = TorchS2T(cfg)
    tmodel.frontend.load_state_dict(chkpt["frontend"])
    tmodel.encoder.load_state_dict(chkpt["encoder"])
    tmodel.decoder.load_state_dict(chkpt["decoder"])
    tmodel.assistor.load_state_dict(chkpt["ctc"])
    tmodel.eval()

    t_logits, t_memory, _ = torch_logits(tmodel, feats, feat_mask, target_in)

    memory, memory_mask = model.apply(
        variables, jnp.asarray(feats), jnp.asarray(feat_mask), method="encode")
    np.testing.assert_allclose(np.asarray(memory), t_memory, rtol=1e-3, atol=1e-4)
    logits = model.apply(
        variables, jnp.asarray(target_in.astype(np.int32)), memory, memory_mask,
        method="decode_full")
    np.testing.assert_allclose(np.asarray(logits), t_logits, rtol=1e-3, atol=2e-4)


def test_export_lm_roundtrip():
    """Both LM families export to reference state dicts that the actual
    reference torch LMs load and score identically."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import export_reference_checkpoint
    from opentransformer_tpu.models.registry import build_model
    from otrans.model.lm import (
        RecurrentLanguageModel as TorchRLM,
        TransformerLanguageModel as TorchTLM,
    )

    rng = np.random.default_rng(12)
    src = np.ones((2, 7), np.int64)
    src[:, 1:] = rng.integers(3, VOCAB, (2, 6))
    tgt = np.zeros_like(src)

    for mtype, torch_cls, pcfg in (
        ("transformer_lm", TorchTLM,
         {"type": "transformer_lm", "vocab_size": VOCAB, "num_blocks": 2,
          "d_model": 32, "n_heads": 2, "d_ff": 48, "residual_dropout": 0.0,
          "share_embedding": True, "smoothing": 0.1}),
        ("rnn_lm", TorchRLM,
         {"type": "rnn_lm", "vocab_size": VOCAB, "num_layers": 2,
          "hidden_size": 24, "dropout": 0.0, "share_embedding": True,
          "smoothing": 0.1}),
    ):
        model = build_model(pcfg)
        variables = model.init(jax.random.PRNGKey(7), jnp.asarray(src.astype(np.int32)),
                               jnp.asarray(tgt.astype(np.int32)), jnp.asarray([6, 6]))
        chkpt = export_reference_checkpoint(variables, {"model": pcfg})
        tlm = torch_cls(pcfg)
        tlm.load_state_dict(chkpt["model"])
        tlm.eval()
        with torch.no_grad():
            if mtype == "transformer_lm":
                t_logp = tlm.predict(torch.from_numpy(src), last_frame=False).numpy()
            else:
                t_logp, _ = tlm.predict(torch.from_numpy(src))
                t_logp = t_logp.numpy()
        import jax.nn

        logits = model.apply(variables, jnp.asarray(src.astype(np.int32)), method="logits")
        ours = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        np.testing.assert_allclose(ours, t_logp, rtol=1e-3, atol=2e-4)


def test_export_handles_scan_layout():
    """A scan_layers (stacked 'blocks') checkpoint exports identically to the
    unstacked layout (auto-unstacked)."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import export_reference_checkpoint, to_scan_layout
    from opentransformer_tpu.models.registry import build_model

    model = build_model(MODEL_CFG)
    rng = np.random.default_rng(13)
    feats = rng.normal(size=(1, 25, 20)).astype(np.float32)
    tgt = np.ones((1, 5), np.int64)
    variables = model.init(
        jax.random.PRNGKey(5), jnp.asarray(feats), jnp.ones((1, 25), bool),
        jnp.asarray(tgt.astype(np.int32)), jnp.asarray([4]))

    plain = export_reference_checkpoint(variables, {"model": MODEL_CFG})
    stacked = to_scan_layout(jax.tree_util.tree_map(np.asarray, variables))
    scanned = export_reference_checkpoint(stacked, {"model": MODEL_CFG})
    assert set(plain["encoder"]) == set(scanned["encoder"])
    for k in plain["encoder"]:
        np.testing.assert_allclose(plain["encoder"][k].numpy(),
                                   scanned["encoder"][k].numpy(), rtol=1e-6)


@pytest.mark.parametrize("relative_positional", [True, False])
def test_export_conformer_roundtrip(relative_positional):
    """ref_compat conformer: reference .pt → our params → exported .pt loads
    strict into a fresh reference model and reproduces the original logits
    (the synthesized post_ffn zeros are unused by the reference forward)."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.compat import (
        convert_reference_checkpoint,
        export_reference_checkpoint,
    )
    from otrans.model.speech2text import SpeechToText as TorchS2T

    ref_enc = {
        "d_model": 32, "n_heads": 2, "d_ff": 48, "nblocks": 2,
        "cov_kernel_size": 7, "pos_dropout": 0.0, "slf_attn_dropout": 0.0,
        "ffn_dropout": 0.0, "residual_dropout": 0.0, "conv_dropout": 0.0,
        "macaron_style": True, "ffn_scale": 0.5, "conv_bias": True,
        "positional_encoding": True, "relative_positional": relative_positional,
        "conv_first": False, "activation": "glu",
    }
    ref_cfg = {**MODEL_CFG, "encoder_type": "conformer", "encoder": ref_enc}

    torch.manual_seed(21)
    t1 = TorchS2T(ref_cfg)
    t1.eval()

    our_cfg = {**ref_cfg, "encoder": {**ref_enc, "conv_norm_type": "batch",
                                      "ref_compat": True}}
    chkpt_in = {
        "frontend": t1.frontend.state_dict(),
        "encoder": t1.encoder.state_dict(),
        "decoder": t1.decoder.state_dict(),
    }
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_reference_checkpoint(chkpt_in, our_cfg))

    chkpt_out = export_reference_checkpoint(variables, {"model": our_cfg})
    t2 = TorchS2T(ref_cfg)
    t2.frontend.load_state_dict(chkpt_out["frontend"])
    t2.encoder.load_state_dict(chkpt_out["encoder"])
    t2.decoder.load_state_dict(chkpt_out["decoder"])
    t2.eval()

    rng = np.random.default_rng(22)
    b, t, f, u = 2, 33, 20, 5
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    feat_mask = np.ones((b, t), bool)
    target_in = np.ones((b, u), np.int64)
    target_in[:, 1:] = rng.integers(3, VOCAB, (b, u - 1))

    l1, m1, _ = torch_logits(t1, feats, feat_mask, target_in)
    l2, m2, _ = torch_logits(t2, feats, feat_mask, target_in)
    np.testing.assert_allclose(m2, m1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(l2, l1, rtol=1e-6, atol=1e-6)
