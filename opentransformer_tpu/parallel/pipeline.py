"""GPipe-style SPMD pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.3). This module
implements the standard TPU-native pattern: a stack of L structurally
identical layers is split into S stages (L/S layers each, stacked-parameter
layout, sharded over the ``pipe`` axis); microbatches flow through stages
with `lax.ppermute` rotations inside `shard_map`, overlapping stage compute
across microbatches. The schedule runs ``n_micro + S - 1`` ticks (the usual
pipeline bubble); autodiff through `shard_map` + `ppermute` gives pipelined
backward for free.

Layout contract:
  * ``stacked_params``: pytree whose leaves have leading dim L (per-layer
    parameters, e.g. from vmapped init or `stack_layer_params`).
  * ``layer_apply(params_i, x) -> x``: applies ONE layer.
  * inputs ``x``: [n_micro, mb, ...] microbatched activations (replicated).

This is a building block + dryrun demonstration at the scale of this round;
wiring it through the full Trainer (stage-sharded optimizer state, 1F1B
schedules) is follow-up work.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(per_layer: list) -> Any:
    """[tree_0 .. tree_{L-1}] → one tree with leading layer dim L."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def pipeline_apply(
    layer_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,  # [n_micro, mb, ...]
    mesh: Mesh,
    axis_name: str = "pipe",
) -> jnp.ndarray:
    """Run L stacked layers as an S-stage pipeline over microbatches.

    Returns [n_micro, mb, ...] outputs (replicated across the pipe axis).
    """
    n_stages = mesh.shape[axis_name]
    n_micro = x.shape[0]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    n_layers = leaves[0].shape[0]
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per_stage = n_layers // n_stages

    # [L, ...] → [S, L/S, ...], stage dim sharded over the pipe axis
    staged = jax.tree_util.tree_map(
        lambda p: p.reshape((n_stages, per_stage) + p.shape[1:]), stacked_params
    )
    param_specs = jax.tree_util.tree_map(lambda p: P(axis_name), staged)

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(staged_local, xs):
        stage = jax.lax.axis_index(axis_name)
        my_params = jax.tree_util.tree_map(lambda p: p[0], staged_local)  # [L/S, ...]

        def stage_fn(x):
            def body(x, p):
                return layer_apply(p, x), None

            y, _ = jax.lax.scan(body, x, my_params)
            return y

        state = jnp.zeros_like(xs[0])
        outputs = jnp.zeros_like(xs)

        def tick(t, carry):
            state, outputs = carry
            inject = jnp.clip(t, 0, n_micro - 1)
            x_in = jnp.where(stage == 0, xs[inject], state)
            y = stage_fn(x_in)
            # last stage completes microbatch t-(S-1)
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(stage == n_stages - 1,
                                    jnp.logical_and(out_idx >= 0, out_idx < n_micro))
            write_idx = jnp.clip(out_idx, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, write_idx, 0, keepdims=False)
            new = jnp.where(valid, y, cur)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, new, write_idx, 0)
            state = jax.lax.ppermute(y, axis_name, perm)
            return state, outputs

        state, outputs = jax.lax.fori_loop(
            0, n_micro + n_stages - 1, tick, (state, outputs)
        )
        # outputs live on the last stage only; replicate via masked psum
        mask = (stage == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * mask, axis_name)

    return run(staged, x)
