"""Model registry: type-string → model builder.

Mirrors the reference's registry dicts (``otrans/model/__init__.py:6-14``):
End2End models {'speech2text', 'ctc'} and LMs {'rnn_lm', 'transformer_lm'},
built from the ``model`` section of the YAML config.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .lm import RecurrentLanguageModel, TransformerLanguageModel
from .speech2text import CTCModel, SpeechToText
from .transducer import TransducerModel


def _as_dict(cfg: Any) -> dict:
    return dict(cfg) if not isinstance(cfg, dict) else cfg


def build_model(model_cfg: Any, dtype=jnp.float32) -> nn.Module:
    """Build a model from the YAML ``model`` section (dict-like)."""
    mtype = model_cfg["type"]
    if mtype == "speech2text":
        return SpeechToText(
            frontend_type=model_cfg.get("frontend_type", "conv"),
            frontend_cfg=_as_dict(model_cfg["frontend"]),
            encoder_type=model_cfg.get("encoder_type", "transformer"),
            encoder_cfg=_as_dict(model_cfg["encoder"]),
            decoder_cfg=_as_dict(model_cfg["decoder"]),
            ctc_weight=float(model_cfg.get("ctc_weight", 0.0)),
            smoothing=float(model_cfg.get("smoothing", 0.1)),
            lookahead_steps=int(model_cfg.get("lookahead_steps", 0)),
            moe_aux_weight=float(model_cfg.get("moe_aux_weight", 0.01)),
            dtype=dtype,
        )
    if mtype == "ctc":
        return CTCModel(
            frontend_type=model_cfg.get("frontend_type", "conv"),
            frontend_cfg=_as_dict(model_cfg["frontend"]),
            encoder_type=model_cfg.get("encoder_type", "transformer"),
            encoder_cfg=_as_dict(model_cfg["encoder"]),
            vocab_size=int(model_cfg["vocab_size"]),
            lookahead_steps=int(model_cfg.get("lookahead_steps", 0)),
            moe_aux_weight=float(model_cfg.get("moe_aux_weight", 0.01)),
            dtype=dtype,
        )
    if mtype == "transducer":
        return TransducerModel(
            frontend_type=model_cfg.get("frontend_type", "conv"),
            frontend_cfg=_as_dict(model_cfg["frontend"]),
            encoder_type=model_cfg.get("encoder_type", "transformer"),
            encoder_cfg=_as_dict(model_cfg["encoder"]),
            vocab_size=int(model_cfg["vocab_size"]),
            predictor_cfg=_as_dict(model_cfg.get("predictor", {}) or {}),
            d_joint=int(model_cfg.get("d_joint", model_cfg["encoder"].get("d_model", 256))),
            moe_aux_weight=float(model_cfg.get("moe_aux_weight", 0.01)),
            joint_t_block=int(model_cfg.get("joint_t_block", -1)),
            dtype=dtype,
        )
    if mtype == "transformer_lm":
        kw = _lm_kwargs(model_cfg, TransformerLanguageModel)
        return TransformerLanguageModel(dtype=dtype, **kw)
    if mtype == "rnn_lm":
        kw = _lm_kwargs(model_cfg, RecurrentLanguageModel)
        return RecurrentLanguageModel(dtype=dtype, **kw)
    raise KeyError(f"unknown model type: {mtype!r}")


def _lm_kwargs(model_cfg: Any, cls) -> dict:
    """Field-filtered LM kwargs, WARNING on silently dropped config keys.

    The LM field is ``num_blocks`` (reference ``egs/aishell/conf/
    transformer_lm.yaml:14``) while encoders use ``n_blocks`` — a config
    that mixes them up would otherwise silently build the default-depth LM
    (this bit the decode profiler in round 5)."""
    keys = cls.__dataclass_fields__
    cfg = _as_dict(model_cfg)
    kw = {k: v for k, v in cfg.items() if k in keys and k != "dtype"}
    dropped = sorted(k for k in cfg if k not in keys and k not in ("type", "dtype"))
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "%s config keys %s are not model fields and were IGNORED "
            "(valid: %s)", cls.__name__, dropped,
            sorted(k for k in keys if k != "parent"))
    return kw


LM_TYPES = ("rnn_lm", "transformer_lm")
E2E_TYPES = ("speech2text", "ctc", "transducer")
