"""Mesh + sharding layer.

The reference's only parallelism is single-node DataParallel/DDP over NCCL
(``otrans/train/trainer.py:56-69``, SURVEY §2.3). The TPU-native replacement
is a `jax.sharding.Mesh` with named axes and GSPMD: parameters and batches
get `NamedSharding`s; XLA inserts the all-reduces/all-gathers over ICI.

Axes:
  * ``data``  — data parallel: batches sharded, gradients all-reduced.
  * ``model`` — tensor parallel: attention QKV/out and FFN w1/w2 kernels
    sharded Megatron-style (column-parallel then row-parallel so each
    block needs a single psum), embedding sharded over the vocab axis.

``param_shardings`` maps a params pytree to NamedShardings by regex rules on
the flattened parameter path, so models need no partitioning annotations.
Rules are ordered; first match wins; default is replicate.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Sequence[Any] | None = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    assert n_data * n_model <= n, f"need {n_data}x{n_model} devices, have {n}"
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


# (regex over 'path/to/param', PartitionSpec) — first match wins.
# Kernel shapes are [in, out] for nn.Dense; embedding is [V, D].
DEFAULT_RULES: tuple[tuple[str, P], ...] = (
    # scanned (stacked-[L, ...]) layouts first: same Megatron axes shifted
    # one dim right past the layer dim
    (r".*blocks/(qkv_proj|q_proj|kv_proj)/dense/kernel$", P(None, None, "model")),
    (r".*blocks/(ffn|pre_ffn|post_ffn)/w1/dense/kernel$", P(None, None, "model")),
    (r".*blocks/out_proj/dense/kernel$", P(None, "model", None)),
    (r".*blocks/(ffn|pre_ffn|post_ffn)/w2/dense/kernel$", P(None, "model", None)),
    # column-parallel (shard output features): QKV/Q/KV projections, FFN w1
    (r".*(qkv_proj|q_proj|kv_proj)/dense/kernel$", P(None, "model")),
    (r".*(ffn|pre_ffn|post_ffn)/w1/dense/kernel$", P(None, "model")),
    # row-parallel (shard input features): attention out_proj, FFN w2
    (r".*out_proj/dense/kernel$", P("model", None)),
    (r".*(ffn|pre_ffn|post_ffn)/w2/dense/kernel$", P("model", None)),
    # rel-pos position projection: column-parallel with per-head biases
    (r".*pos_proj/dense/kernel$", P(None, "model")),
    (r".*pos[uv]$", P(None, "model", None, None)),  # [1, H, 1, Dh]
    # embeddings: shard the vocab axis (logits get psum-free sharded matmul)
    (r".*embedding/embedding$", P("model", None)),
    # everything else (biases, norms, convs): replicated
)


def _spec_for(path: str, rules: Sequence[tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh, rules: Sequence[tuple[str, P]] = DEFAULT_RULES):
    """NamedSharding pytree for a params pytree (regex rules, rank-checked)."""

    def assign(key_path, leaf):
        path = _path_str(key_path)
        spec = _spec_for(path, rules)
        if not hasattr(leaf, "ndim") or len(spec) > leaf.ndim:
            return NamedSharding(mesh, P())
        # drop spec axes that don't divide the dim evenly → replicate that dim
        fixed = []
        for i, axis in enumerate(tuple(spec) + (None,) * (leaf.ndim - len(spec))):
            if axis is None:
                fixed.append(None)
                continue
            size = mesh.shape[axis]
            fixed.append(axis if leaf.shape[i] % size == 0 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of every array over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
