"""Reference (PyTorch) checkpoint import.

Converts the reference's component-wise checkpoints
(``{params, frontend, encoder, decoder[, ctc]}`` of torch state dicts,
``otrans/model/speech2text.py:71-82``) into this framework's flax param
pytree, enabling direct logit A/B against trained reference weights
(SURVEY §7 hard part #5).

Scope: the speech-transformer baseline family — conv frontend, (rel-pos-free)
transformer encoder with post- or pre-norm, transformer decoder with optional
tied embeddings, optional CTC head. Layout facts this mapping relies on:
  * torch ``nn.Linear.weight`` is [out, in] → flax dense kernel is its
    transpose; biases map directly.
  * the reference's fused projections split in (q, k, v) / (k, v) order
    (``module/attention.py:72``, ``:133``) — same order as ours.
  * conv weights: torch [O, I, kH, kW] → flax [kH, kW, I, O].
  * the frontend flattens channels C-major ([B,C,T,F] → [B,T,C·F]); our
    frontend transposes NHWC to match, so ``output_layer`` maps 1:1.
  * tied decoders keep an independent output bias (torch keeps the Linear's
    bias after tying weights) → our ``output_bias`` param.

State dicts are accepted as dicts of numpy arrays or torch tensors.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _linear(sd: Mapping, prefix: str) -> dict:
    return {
        "dense": {
            "kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }


def _layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv2d(sd: Mapping, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [O, I, kT, kF]
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _np(sd[f"{prefix}.bias"])}


def convert_frontend(sd: Mapping) -> dict:
    out = {
        "conv1": {"conv": _conv2d(sd, "conv1.conv_layer")},
        "conv2": {"conv": _conv2d(sd, "conv2.conv_layer")},
        "output_layer": _linear(sd, "output_layer"),
    }
    if "layer_norm.weight" in sd:
        out["layer_norm"] = _layernorm(sd, "layer_norm")
    return out


def _self_attn(sd: Mapping, prefix: str) -> dict:
    return {
        "qkv_proj": _linear(sd, f"{prefix}.qvk_proj"),
        "out_proj": _linear(sd, f"{prefix}.output_proj"),
    }


def _cross_attn(sd: Mapping, prefix: str) -> dict:
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "kv_proj": _linear(sd, f"{prefix}.vk_proj"),  # splits (k, v) like ours
        "out_proj": _linear(sd, f"{prefix}.output_proj"),
    }


def _ffn(sd: Mapping, prefix: str) -> dict:
    return {"w1": _linear(sd, f"{prefix}.w_1"), "w2": _linear(sd, f"{prefix}.w_2")}


def convert_encoder(sd: Mapping, n_blocks: int) -> dict:
    out: dict = {}
    for i in range(n_blocks):
        p = f"blocks.{i}"
        blk = {
            "slf_attn": _self_attn(sd, f"{p}.slf_attn"),
            "ffn": _ffn(sd, f"{p}.feed_forward"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
        if f"{p}.concat_linear.weight" in sd:
            blk["concat_linear"] = _linear(sd, f"{p}.concat_linear")
        out[f"block_{i}"] = blk
    # the reference encoder's pre-norm final LayerNorm is named 'norm'
    # (encoder/transformer.py:111), the decoder's 'after_norm'
    if "norm.weight" in sd:
        out["after_norm"] = _layernorm(sd, "norm")
    return out


def convert_decoder(sd: Mapping, n_blocks: int, share_embedding: bool) -> dict:
    out: dict = {"embedding": {"embedding": _np(sd["embedding.weight"])}}
    for i in range(n_blocks):
        p = f"blocks.{i}"
        blk = {
            "slf_attn": _self_attn(sd, f"{p}.slf_attn"),
            "src_attn": _cross_attn(sd, f"{p}.src_attn"),
            "ffn": _ffn(sd, f"{p}.feed_forward"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
        }
        if f"{p}.concat_linear1.weight" in sd:
            blk["concat_linear1"] = _linear(sd, f"{p}.concat_linear1")
            blk["concat_linear2"] = _linear(sd, f"{p}.concat_linear2")
        out[f"block_{i}"] = blk
    if "after_norm.weight" in sd:
        out["after_norm"] = _layernorm(sd, "after_norm")
    if share_embedding:
        out["output_bias"] = _np(sd["output_layer.bias"])
    else:
        out["output_layer"] = _linear(sd, "output_layer")
    return out


def convert_conformer_encoder(sd: Mapping, nblocks: int, relative_positional: bool = True,
                              ref_compat: bool = True) -> tuple[dict, dict]:
    """Reference conformer encoder (``otrans/encoder/conformer.py``) →
    (flax params, batch_stats). ``ref_compat=True`` drops the post-FFN weights
    the reference's forward never applies (SURVEY §8.2) and the rel-pos
    attention has no out-proj to map (§8.3)."""
    params: dict = {}
    stats: dict = {}
    for i in range(nblocks):
        p = f"blocks.{i}"
        if relative_positional:
            # posu/posv: torch [1, 1, N, Dk] → ours [1, N, 1, Dk]
            mha = {
                "qkv_proj": _linear(sd, f"{p}.mha.qvk_proj"),
                "pos_proj": {"dense": {"kernel": _np(sd[f"{p}.mha.pos_proj.weight"]).T}},
                "posu": _np(sd[f"{p}.mha.posu"]).transpose(0, 2, 1, 3),
                "posv": _np(sd[f"{p}.mha.posv"]).transpose(0, 2, 1, 3),
            }
            if not ref_compat:
                mha["out_proj"] = _linear(sd, f"{p}.mha.output_proj")
        else:
            mha = _self_attn(sd, f"{p}.mha")
        dw = _np(sd[f"{p}.conv.depthwise_conv.weight"])  # [C, 1, k]
        conv_module = {
            "pw1": _linear(sd, f"{p}.conv.pointwise_conv1"),
            "dw_conv": {"kernel": dw.transpose(2, 1, 0),
                        "bias": _np(sd[f"{p}.conv.depthwise_conv.bias"])},
            "bn": {"scale": _np(sd[f"{p}.conv.batch_norm.weight"]),
                   "bias": _np(sd[f"{p}.conv.batch_norm.bias"])},
            "pw2": _linear(sd, f"{p}.conv.pointwise_conv2"),
        }
        stats[f"block_{i}"] = {
            "conv_module": {"bn": {
                "mean": _np(sd[f"{p}.conv.batch_norm.running_mean"]),
                "var": _np(sd[f"{p}.conv.batch_norm.running_var"]),
            }}
        }
        blk = {
            "pre_ffn": _ffn(sd, f"{p}.pre_ffn"),
            "pre_ffn_norm": _layernorm(sd, f"{p}.macaron_ffn_norm"),
            "slf_attn": mha,
            "attn_norm": _layernorm(sd, f"{p}.mha_norm"),
            "conv_module": conv_module,
            "conv_norm": _layernorm(sd, f"{p}.conv_norm"),
            "post_ffn_norm": _layernorm(sd, f"{p}.post_ffn_norm"),
            "final_norm": _layernorm(sd, f"{p}.final_norm"),
        }
        if not ref_compat:
            blk["post_ffn"] = _ffn(sd, f"{p}.post_ffn")
        params[f"block_{i}"] = blk
    return params, stats


def convert_ctc(sd: Mapping) -> dict:
    out = {"output_layer": _linear(sd, "output_layer")}
    # optional look-ahead depthwise conv: torch [D, 1, k] → flax [k, 1, D]
    # (the reference attribute is 'lookahead_conv', model/ctc.py:18; accept
    # the underscored spelling too)
    for key in sd:
        if key.endswith(("lookahead_conv.weight", "look_ahead_conv.weight")):
            w = _np(sd[key])
            out["look_ahead_conv"] = {"kernel": w.transpose(2, 1, 0)}
            bkey = key.replace(".weight", ".bias")
            if bkey in sd:
                out["look_ahead_conv"]["bias"] = _np(sd[bkey])
    return out


def convert_reference_checkpoint(chkpt: Mapping[str, Any], model_cfg: Mapping) -> dict:
    """Full reference speech2text checkpoint → flax variables dict."""
    # reference class defaults: TransformerEncoder/Decoder n_blocks=6
    dec_blocks = int(model_cfg["decoder"].get("n_blocks", 6))
    share = bool(model_cfg["decoder"].get("share_embedding", True))
    enc_cfg = model_cfg.get("encoder", {})
    batch_stats = {}
    if model_cfg.get("encoder_type", "transformer") == "conformer":
        encoder, enc_stats = convert_conformer_encoder(
            chkpt["encoder"], int(enc_cfg.get("nblocks", 12)),
            relative_positional=bool(enc_cfg.get("relative_positional", True)),
            ref_compat=bool(enc_cfg.get("ref_compat", True)),
        )
        batch_stats["encoder"] = enc_stats
    else:
        encoder = convert_encoder(chkpt["encoder"], int(enc_cfg.get("n_blocks", 6)))
    params = {
        "frontend": convert_frontend(chkpt["frontend"]),
        "encoder": encoder,
        "decoder": convert_decoder(chkpt["decoder"], dec_blocks, share),
    }
    if "ctc" in chkpt and chkpt["ctc"]:
        params["ctc"] = convert_ctc(chkpt["ctc"])
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_transformer_lm(sd: Mapping, num_blocks: int, share_embedding: bool) -> dict:
    """Reference transformer LM state dict ({params, model} checkpoints,
    ``otrans/model/lm.py:94-163``) → flax params."""
    out: dict = {"embedding": {"embedding": _np(sd["embedding.weight"])}}
    for i in range(num_blocks):
        p = f"blocks.{i}"
        out[f"block_{i}"] = {
            "slf_attn": _self_attn(sd, f"{p}.slf_attn"),
            "ffn": _ffn(sd, f"{p}.feed_forward"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    if share_embedding:
        out["output_bias"] = _np(sd["output_project.bias"])
    else:
        out["output_layer"] = _linear(sd, "output_project")
    return {"params": out}


def convert_rnn_lm(sd: Mapping, num_layers: int, share_embedding: bool) -> dict:
    """Reference LSTM LM (torch nn.LSTM) → flax per-layer OptimizedLSTMCell.

    torch fuses gates (i, f, g, o) into weight_ih/weight_hh [4H, H] with two
    bias vectors; flax keeps per-gate dense kernels (ii/if/ig/io without
    bias, hi/hf/hg/ho with bias) — the two torch biases sum into the h-side.
    """
    out: dict = {"embedding": {"embedding": _np(sd["embedding.weight"])}}
    gates = ("i", "f", "g", "o")
    flax_gate = {"i": "i", "f": "f", "g": "g", "o": "o"}
    for layer in range(num_layers):
        w_ih = _np(sd[f"rnn.weight_ih_l{layer}"])  # [4H, H]
        w_hh = _np(sd[f"rnn.weight_hh_l{layer}"])
        b = _np(sd[f"rnn.bias_ih_l{layer}"]) + _np(sd[f"rnn.bias_hh_l{layer}"])
        h = w_ih.shape[0] // 4
        cell: dict = {}
        for gi, g in enumerate(gates):
            sl = slice(gi * h, (gi + 1) * h)
            cell[f"i{flax_gate[g]}"] = {"kernel": w_ih[sl].T}
            cell[f"h{flax_gate[g]}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        out[f"lstm_{layer}"] = {"cell": cell}
    if share_embedding:
        out["output_bias"] = _np(sd["output_project.bias"])
    else:
        out["output_layer"] = _linear(sd, "output_project")
    return {"params": out}


def _convert_lm_chkpt(chkpt: Mapping) -> tuple[dict, dict]:
    cfg = chkpt.get("params", {})
    mc = cfg.get("model", cfg)
    sd = chkpt["model"]
    if mc.get("type") == "rnn_lm" or any(k.startswith("rnn.") for k in sd):
        variables = convert_rnn_lm(sd, int(mc.get("num_layers", 2)),
                                   bool(mc.get("share_embedding", True)))
    else:
        variables = convert_transformer_lm(sd, int(mc.get("num_blocks", 6)),
                                           bool(mc.get("share_embedding", True)))
    return variables, cfg


def load_reference_lm_checkpoint(path: str) -> tuple[dict, dict]:
    """Load a reference LM checkpoint ({params, model}, ``model/lm.py:165-171``)."""
    import torch

    return _convert_lm_chkpt(torch.load(path, map_location="cpu", weights_only=False))


def load_reference_any(path: str) -> tuple[dict, dict]:
    """Load any reference ``.pt`` checkpoint, dispatching on its key layout:
    speech2text saves component state dicts ({frontend, encoder, decoder, ...},
    ``model/speech2text.py:71-82``), LMs save one fused dict ({model},
    ``model/lm.py:165-171``). Returns (flax variables, embedded config)."""
    import torch

    chkpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in chkpt and "encoder" not in chkpt:
        return _convert_lm_chkpt(chkpt)
    cfg = _compat_cfg(chkpt.get("params", {}))
    return convert_reference_checkpoint(chkpt, cfg.get("model", cfg)), cfg


def _compat_cfg(cfg: dict) -> dict:
    """Adjust a reference-embedded config so the model it builds HERE matches
    the model the reference actually trained: its conformer always used
    BatchNorm and its forward had the §8.2/§8.3 defects (ref_compat)."""
    mc = cfg.get("model")
    if isinstance(mc, dict) and mc.get("encoder_type") == "conformer":
        enc = dict(mc.get("encoder", {}))
        enc.setdefault("conv_norm_type", "batch")
        enc.setdefault("ref_compat", True)
        cfg = {**cfg, "model": {**mc, "encoder": enc}}
    return cfg


def load_reference_checkpoint(path: str, model_cfg: Mapping | None = None) -> tuple[dict, dict]:
    """Load a reference ``model.epoch.N.pt`` via torch. Returns
    (flax variables, embedded config dict)."""
    import torch

    chkpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = _compat_cfg(chkpt.get("params", {}))
    mc = model_cfg or cfg.get("model", cfg)
    return convert_reference_checkpoint(chkpt, mc), cfg


# --------------------------------------------------------------- export (→torch)
# Inverse mappings: flax params → reference torch state dicts, so checkpoints
# flow BOTH ways (a reference user can evaluate our trained models with their
# stack). Scope: the speech-transformer family (+ CTC head) and both LMs.


def _t(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _linear_out(p: Mapping, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _t(p["dense"]["kernel"]).T
    out[f"{prefix}.bias"] = _t(p["dense"]["bias"])


def _layernorm_out(p: Mapping, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _t(p["scale"])
    out[f"{prefix}.bias"] = _t(p["bias"])


def _self_attn_out(p: Mapping, prefix: str, out: dict) -> None:
    _linear_out(p["qkv_proj"], f"{prefix}.qvk_proj", out)
    _linear_out(p["out_proj"], f"{prefix}.output_proj", out)


def _ffn_out(p: Mapping, prefix: str, out: dict) -> None:
    _linear_out(p["w1"], f"{prefix}.w_1", out)
    _linear_out(p["w2"], f"{prefix}.w_2", out)


def export_frontend(p: Mapping) -> dict:
    out: dict = {}
    for i, name in ((1, "conv1"), (2, "conv2")):
        w = _t(p[name]["conv"]["kernel"])  # [kT, kF, I, O] → [O, I, kT, kF]
        out[f"conv{i}.conv_layer.weight"] = w.transpose(3, 2, 0, 1)
        out[f"conv{i}.conv_layer.bias"] = _t(p[name]["conv"]["bias"])
    _linear_out(p["output_layer"], "output_layer", out)
    if "layer_norm" in p:
        _layernorm_out(p["layer_norm"], "layer_norm", out)
    return out


def export_encoder(p: Mapping) -> dict:
    out: dict = {}
    for name, blk in p.items():
        if not name.startswith("block_"):
            continue
        i = int(name[len("block_"):])
        _self_attn_out(blk["slf_attn"], f"blocks.{i}.slf_attn", out)
        _ffn_out(blk["ffn"], f"blocks.{i}.feed_forward", out)
        _layernorm_out(blk["norm1"], f"blocks.{i}.norm1", out)
        _layernorm_out(blk["norm2"], f"blocks.{i}.norm2", out)
        if "concat_linear" in blk:
            _linear_out(blk["concat_linear"], f"blocks.{i}.concat_linear", out)
    if "after_norm" in p:
        _layernorm_out(p["after_norm"], "norm", out)
    return out


def export_decoder(p: Mapping) -> dict:
    out: dict = {"embedding.weight": _t(p["embedding"]["embedding"])}
    for name, blk in p.items():
        if not name.startswith("block_"):
            continue
        i = int(name[len("block_"):])
        _self_attn_out(blk["slf_attn"], f"blocks.{i}.slf_attn", out)
        _linear_out(blk["src_attn"]["q_proj"], f"blocks.{i}.src_attn.q_proj", out)
        _linear_out(blk["src_attn"]["kv_proj"], f"blocks.{i}.src_attn.vk_proj", out)
        _linear_out(blk["src_attn"]["out_proj"], f"blocks.{i}.src_attn.output_proj", out)
        _ffn_out(blk["ffn"], f"blocks.{i}.feed_forward", out)
        for n in ("norm1", "norm2", "norm3"):
            _layernorm_out(blk[n], f"blocks.{i}.{n}", out)
        if "concat_linear1" in blk:
            _linear_out(blk["concat_linear1"], f"blocks.{i}.concat_linear1", out)
            _linear_out(blk["concat_linear2"], f"blocks.{i}.concat_linear2", out)
    if "after_norm" in p:
        _layernorm_out(p["after_norm"], "after_norm", out)
    if "output_bias" in p:  # tied: weight aliases the embedding
        out["output_layer.weight"] = out["embedding.weight"]
        out["output_layer.bias"] = _t(p["output_bias"])
    else:
        _linear_out(p["output_layer"], "output_layer", out)
    return out


def export_ctc(p: Mapping) -> dict:
    out: dict = {}
    _linear_out(p["output_layer"], "output_layer", out)
    if "look_ahead_conv" in p:
        w = _t(p["look_ahead_conv"]["kernel"])  # [k, 1, D] → [D, 1, k]
        out["lookahead_conv.weight"] = w.transpose(2, 1, 0)
        if "bias" in p["look_ahead_conv"]:
            out["lookahead_conv.bias"] = _t(p["look_ahead_conv"]["bias"])
    return out


def export_conformer_encoder(p: Mapping, stats: Mapping, enc_cfg: Mapping) -> dict:
    """ref_compat conformer flax params (+ batch_stats) → reference state
    dict. The reference's unused-by-forward parameters (post_ffn — §8.2)
    don't exist on our side; they are synthesized as zeros so strict
    ``load_state_dict`` succeeds (the reference forward never reads them).
    Requires ``ref_compat`` + BatchNorm (what the reference trained)."""
    d_model = int(enc_cfg.get("d_model", 256))
    d_ff = int(enc_cfg.get("d_ff", 2048))
    relpos = bool(enc_cfg.get("relative_positional", True))
    out: dict = {}
    for name, blk in p.items():
        if not name.startswith("block_"):
            continue
        i = int(name[len("block_"):])
        pre = f"blocks.{i}"
        _ffn_out(blk["pre_ffn"], f"{pre}.pre_ffn", out)
        _layernorm_out(blk["pre_ffn_norm"], f"{pre}.macaron_ffn_norm", out)
        if relpos:
            _linear_out(blk["slf_attn"]["qkv_proj"], f"{pre}.mha.qvk_proj", out)
            out[f"{pre}.mha.pos_proj.weight"] = _t(
                blk["slf_attn"]["pos_proj"]["dense"]["kernel"]).T
            # ours [1, H, 1, Dh] → torch [1, 1, H, Dh]
            out[f"{pre}.mha.posu"] = _t(blk["slf_attn"]["posu"]).transpose(0, 2, 1, 3)
            out[f"{pre}.mha.posv"] = _t(blk["slf_attn"]["posv"]).transpose(0, 2, 1, 3)
        else:
            _self_attn_out(blk["slf_attn"], f"{pre}.mha", out)
        _layernorm_out(blk["attn_norm"], f"{pre}.mha_norm", out)
        cm = blk["conv_module"]
        _linear_out(cm["pw1"], f"{pre}.conv.pointwise_conv1", out)
        out[f"{pre}.conv.depthwise_conv.weight"] = _t(
            cm["dw_conv"]["kernel"]).transpose(2, 1, 0)
        out[f"{pre}.conv.depthwise_conv.bias"] = _t(cm["dw_conv"]["bias"])
        out[f"{pre}.conv.batch_norm.weight"] = _t(cm["bn"]["scale"])
        out[f"{pre}.conv.batch_norm.bias"] = _t(cm["bn"]["bias"])
        bn = stats[name]["conv_module"]["bn"]
        out[f"{pre}.conv.batch_norm.running_mean"] = _t(bn["mean"])
        out[f"{pre}.conv.batch_norm.running_var"] = _t(bn["var"])
        out[f"{pre}.conv.batch_norm.num_batches_tracked"] = np.zeros((), np.int64)
        _linear_out(cm["pw2"], f"{pre}.conv.pointwise_conv2", out)
        _layernorm_out(blk["conv_norm"], f"{pre}.conv_norm", out)
        _layernorm_out(blk["post_ffn_norm"], f"{pre}.post_ffn_norm", out)
        _layernorm_out(blk["final_norm"], f"{pre}.final_norm", out)
        # synthesized (unused by the reference forward, §8.2)
        w1_out = d_ff * 2 if enc_cfg.get("activation", "glu") == "glu" else d_ff
        out[f"{pre}.post_ffn.w_1.weight"] = np.zeros((w1_out, d_model), np.float32)
        out[f"{pre}.post_ffn.w_1.bias"] = np.zeros((w1_out,), np.float32)
        out[f"{pre}.post_ffn.w_2.weight"] = np.zeros((d_model, d_ff), np.float32)
        out[f"{pre}.post_ffn.w_2.bias"] = np.zeros((d_model,), np.float32)
    return out


def export_transformer_lm(p: Mapping) -> dict:
    """Transformer LM flax params → reference state dict (``model/lm.py:94+``)."""
    out: dict = {"embedding.weight": _t(p["embedding"]["embedding"])}
    for name, blk in p.items():
        if not name.startswith("block_"):
            continue
        i = int(name[len("block_"):])
        _self_attn_out(blk["slf_attn"], f"blocks.{i}.slf_attn", out)
        _ffn_out(blk["ffn"], f"blocks.{i}.feed_forward", out)
        _layernorm_out(blk["norm1"], f"blocks.{i}.norm1", out)
        _layernorm_out(blk["norm2"], f"blocks.{i}.norm2", out)
    if "output_bias" in p:
        out["output_project.weight"] = out["embedding.weight"]
        out["output_project.bias"] = _t(p["output_bias"])
    else:
        _linear_out(p["output_layer"], "output_project", out)
    return out


def export_rnn_lm(p: Mapping) -> dict:
    """LSTM LM flax params → reference state dict: per-gate flax kernels fuse
    back into torch's [4H, H] (i, f, g, o) layout; flax's single h-side bias
    becomes bias_hh with bias_ih = 0 (torch sums them)."""
    out: dict = {"embedding.weight": _t(p["embedding"]["embedding"])}
    layer = 0
    while f"lstm_{layer}" in p:
        cell = p[f"lstm_{layer}"]["cell"]
        w_ih = np.concatenate([_t(cell[f"i{g}"]["kernel"]).T for g in "ifgo"])
        w_hh = np.concatenate([_t(cell[f"h{g}"]["kernel"]).T for g in "ifgo"])
        b = np.concatenate([_t(cell[f"h{g}"]["bias"]) for g in "ifgo"])
        out[f"rnn.weight_ih_l{layer}"] = w_ih
        out[f"rnn.weight_hh_l{layer}"] = w_hh
        out[f"rnn.bias_ih_l{layer}"] = np.zeros_like(b)
        out[f"rnn.bias_hh_l{layer}"] = b
        layer += 1
    if "output_bias" in p:
        out["output_project.weight"] = out["embedding.weight"]
        out["output_project.bias"] = _t(p["output_bias"])
    else:
        _linear_out(p["output_layer"], "output_project", out)
    return out


def from_scan_layout(params: Mapping, component: str = "encoder") -> dict:
    """Inverse of ``to_scan_layout``: stacked 'blocks' [L, ...] → block_0..L-1."""
    import jax

    root = dict(params.get("params", params))
    comp = dict(root[component])
    stacked = comp.pop("blocks")
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        comp[f"block_{i}"] = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
    root[component] = comp
    return {"params": root} if "params" in params else root


def export_reference_checkpoint(variables: Mapping, cfg: Mapping) -> dict:
    """Our flax variables → the reference's ``.pt`` payload, loadable by the
    reference's ``eval.py:29-56`` / ``model/lm.py``. Covered: the
    transformer-encoder speech2text family (scanned layouts are unstacked
    automatically) and both LM families ({params, model} layout)."""
    import torch

    def to_torch(sd: dict) -> dict:
        return {k: torch.from_numpy(np.array(v, np.float32)) for k, v in sd.items()}

    mc = cfg.get("model", cfg)
    mtype = mc.get("type", "speech2text")
    p = variables.get("params", variables)
    if mtype == "transformer_lm":
        return {"params": dict(cfg), "model": to_torch(export_transformer_lm(p))}
    if mtype == "rnn_lm":
        return {"params": dict(cfg), "model": to_torch(export_rnn_lm(p))}
    enc_type = mc.get("encoder_type", "transformer")
    if mtype != "speech2text" or enc_type not in ("transformer", "conformer"):
        raise NotImplementedError(
            f"torch export covers the speech2text family (transformer or "
            f"ref_compat conformer encoder) and LMs (got type={mtype!r}, "
            f"encoder_type={enc_type!r})")
    if enc_type == "conformer":
        enc_cfg = mc.get("encoder", {})
        if not enc_cfg.get("ref_compat", False) or enc_cfg.get("conv_norm_type") != "batch":
            raise NotImplementedError(
                "conformer export requires ref_compat: true + conv_norm_type: "
                "batch (the model the reference actually trains/loads); the "
                "fixed-architecture variant has no reference equivalent")
        encoder_sd = export_conformer_encoder(
            p["encoder"], variables["batch_stats"]["encoder"], enc_cfg)
    else:
        enc = p["encoder"]
        if "blocks" in enc:
            enc = from_scan_layout({"encoder": enc})["encoder"]
        encoder_sd = export_encoder(enc)
    if "blocks" in p["decoder"]:
        p = {**p, "decoder": from_scan_layout({"decoder": p["decoder"]}, "decoder")["decoder"]}

    chkpt = {
        "params": dict(cfg),
        "frontend": to_torch(export_frontend(p["frontend"])),
        "encoder": to_torch(encoder_sd),
        "decoder": to_torch(export_decoder(p["decoder"])),
    }
    if "ctc" in p:
        chkpt["ctc"] = to_torch(export_ctc(p["ctc"]))
    return chkpt


def to_scan_layout(params: Mapping, component: str = "encoder", block_prefix: str = "block_") -> dict:
    """Convert per-block param layout (block_0..block_{L-1}) to the stacked
    'blocks' layout used by ``scan_layers: true`` encoders.

    Works on a full variables dict ({'params': {...}}) or a bare params tree;
    non-block keys (pos_enc, after_norm, ...) pass through unchanged.
    """
    import jax
    import numpy as _np

    root = params.get("params", params)
    comp = dict(root[component])
    block_keys = sorted(
        (k for k in comp if k.startswith(block_prefix)),
        key=lambda k: int(k[len(block_prefix):]),
    )
    if not block_keys:
        raise KeyError(f"no '{block_prefix}*' blocks under {component!r}")
    stacked = jax.tree_util.tree_map(
        lambda *xs: _np.stack([_np.asarray(x) for x in xs]),
        *[comp[k] for k in block_keys],
    )
    for k in block_keys:
        del comp[k]
    comp["blocks"] = stacked
    new_root = dict(root)
    new_root[component] = comp
    return {"params": new_root} if "params" in params else new_root
