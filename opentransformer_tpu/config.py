"""Config loading.

The external contract (reference ``run.py:97-98``) is a single YAML file with
three top-level sections — ``data``, ``model``, ``train`` — consumed as plain
nested dicts, with registry-keyed type strings (``model.type``,
``frontend_type``, ``encoder_type``, ``decoder_type``, ``optimizer_type``,
``scheduler_type``, ``dataset_type``) selecting implementations.

We keep that exact YAML shape but add a thin typed view (`Config`) with
defaulted attribute access so downstream code never sprinkles
``'key' in params`` checks, plus a config snapshot helper for expdirs and
checkpoints (the reference embeds the config dict in every checkpoint,
``otrans/model/speech2text.py:71-82`` — we do the same via orbax metadata).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Iterator, Mapping

import yaml


class Config(Mapping[str, Any]):
    """Read-only attribute/dict hybrid view over a nested config dict.

    Nested dicts are wrapped lazily; ``cfg.get(key, default)`` and
    ``cfg['key']`` both work, and ``cfg.raw`` returns the underlying dict
    (deep-copied) for serialization.
    """

    __slots__ = ("_d",)

    def __init__(self, d: dict[str, Any] | None = None):
        object.__setattr__(self, "_d", dict(d or {}))

    # -- Mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        v = self._d[key]
        return Config(v) if isinstance(v, dict) else v

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key: object) -> bool:
        return key in self._d

    # -- attribute access -------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def get(self, key: str, default: Any = None) -> Any:
        if key in self._d:
            return self[key]
        return default

    def sub(self, key: str) -> "Config":
        """Section accessor that tolerates a missing section."""
        v = self._d.get(key, {})
        return v if isinstance(v, Config) else Config(v)

    @property
    def raw(self) -> dict[str, Any]:
        return copy.deepcopy(self._d)

    def __repr__(self) -> str:
        return f"Config({self._d!r})"


def load_config(path: str) -> Config:
    with open(path, "r", encoding="utf-8") as f:
        d = yaml.safe_load(f)
    if not isinstance(d, dict):
        raise ValueError(f"config root must be a mapping, got {type(d)}: {path}")
    return Config(d)


def dump_config(cfg: Config | dict[str, Any], path: str) -> None:
    d = cfg.raw if isinstance(cfg, Config) else d_copy(cfg)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(d, f, sort_keys=False, allow_unicode=True)


def d_copy(d: dict[str, Any]) -> dict[str, Any]:
    return copy.deepcopy(d)
