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
  * ``pipe``  — pipeline (stage) parallelism over scanned layer stacks
    (``scan_layers: true``): stacked [L, ...] leaves shard their layer dim,
    so each stage owns L/S layers' params AND optimizer state; the encoder's
    ``lax.scan`` streams each layer's weights from its owner over ICI
    (weight-gathered stage parallelism — memory scales 1/S with stages).
    Compute-overlapped GPipe microbatching is the sibling building block in
    ``parallel/pipeline.py``. Rules that name an axis absent from the mesh
    degrade to replication, so one rule set serves all mesh shapes.

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
    n_pipe: int = 1,
    n_expert: int = 1,
    devices: Sequence[Any] | None = None,
    axis_names: tuple[str, ...] | None = None,
) -> Mesh:
    """Build a (data, model[, pipe][, expert]) mesh over the devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        assert n % (n_model * n_pipe * n_expert) == 0, (n, n_model, n_pipe, n_expert)
        n_data = n // (n_model * n_pipe * n_expert)
    total = n_data * n_model * n_pipe * n_expert
    assert total <= n, f"need {n_data}x{n_model}x{n_pipe}x{n_expert} devices, have {n}"
    dims, names = [n_data, n_model], ["data", "model"]
    if n_pipe > 1:
        dims.append(n_pipe)
        names.append("pipe")
    if n_expert > 1:
        dims.append(n_expert)
        names.append("expert")
    grid = np.asarray(devices[:total]).reshape(dims)
    return Mesh(grid, axis_names or tuple(names))


# (regex over 'path/to/param', PartitionSpec) — first match wins.
# Kernel shapes are [in, out] for nn.Dense; embedding is [V, D].
DEFAULT_RULES: tuple[tuple[str, P], ...] = (
    # scanned (stacked-[L, ...]) layouts first: same Megatron axes shifted
    # one dim right past the layer dim, which itself shards over 'pipe'
    # (stage parallelism) when that axis exists in the mesh
    # (attention projections sit under blocks/<attn module>/..., so allow
    # intermediate scopes after blocks/)
    (r".*blocks/.*(qkv_proj|q_proj|kv_proj)/dense/kernel$", P("pipe", None, "model")),
    (r".*blocks/.*(ffn|pre_ffn|post_ffn)/w1/dense/kernel$", P("pipe", None, "model")),
    (r".*blocks/.*out_proj/dense/kernel$", P("pipe", "model", None)),
    (r".*blocks/.*(ffn|pre_ffn|post_ffn)/w2/dense/kernel$", P("pipe", "model", None)),
    (r".*blocks/.*pos[uv]$", P("pipe", None, "model", None, None)),
    # MoE experts (modules.py:MoEFeedForward): expert dim over 'expert'
    # (EP), hidden dim over 'model' (TP within each expert); router stays
    # replicated (falls through to the catch-alls)
    (r".*blocks/.*moe/w1$", P("pipe", "expert", None, "model")),
    (r".*blocks/.*moe/w2$", P("pipe", "expert", "model", None)),
    (r".*blocks/.*moe/b1$", P("pipe", "expert", "model")),
    (r".*blocks/.*moe/b2$", P("pipe", "expert", None)),
    # remaining stacked leaves (biases, norms, pos_proj): stage-shard L only
    (r".*blocks/.*", P("pipe")),
    (r".*moe/w1$", P("expert", None, "model")),
    (r".*moe/w2$", P("expert", "model", None)),
    (r".*moe/b1$", P("expert", "model")),
    (r".*moe/b2$", P("expert", None)),
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
        # drop spec axes absent from this mesh or not dividing the dim evenly
        # → replicate that dim (one rule set serves all mesh shapes)
        fixed = []
        for i, axis in enumerate(tuple(spec) + (None,) * (leaf.ndim - len(spec))):
            if axis is None or axis not in mesh.shape:
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
