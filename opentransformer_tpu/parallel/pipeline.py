"""SPMD pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.3). This module
implements the TPU-native patterns:

  * ``pipeline_apply`` — GPipe-style forward building block: a stack of L
    structurally identical layers split into S stages (L/S layers each,
    stacked-parameter layout, sharded over the ``pipe`` axis); microbatches
    flow through stages with `lax.ppermute` rotations inside `shard_map`.
    Autodiff through it gives a pipelined backward (GPipe schedule: all
    forwards, then all backwards — activation stash grows with n_micro).

  * ``one_f_one_b_grads`` — the trainer-grade 1F1B schedule: every tick each
    stage runs one microbatch forward AND one microbatch backward (the
    backward rematerializes the stage forward from a stashed stage input, so
    the stash is a circular buffer of 2S-1 stage inputs — **constant in
    n_micro**, the property that distinguishes 1F1B from GPipe). The loss
    head (decoder + loss for one microbatch) runs on the last stage the same
    tick its forward finishes, seeding the backward wave immediately.
    Data parallelism composes manually inside the same shard_map (batch dim
    sliced over ``data``; gradients psum'd), matching the reference's
    DataParallel loss semantics (mean of per-shard token-normalized losses,
    ``otrans/train/trainer.py:208``).

Layout contract (both):
  * ``stacked_params``: pytree whose leaves have leading dim L (per-layer
    parameters, e.g. from vmapped init, `nn.scan`, or `stack_layer_params`),
    sharded ``P('pipe', ...)`` so stage s owns layers [s·L/S, (s+1)·L/S).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
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


# ---------------------------------------------------------------------------
# 1F1B schedule
# ---------------------------------------------------------------------------

def _dyn(tree, i):
    """tree_map dynamic_index_in_dim (leading axis) — microbatch selection."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree
    )


def _identity_psum(axis_name: str):
    """Megatron's "f" operator: identity forward, all-reduce backward.

    Placed at a tensor-parallel branch's input so autodiff of the manual
    per-shard math produces the full input cotangent (each model shard's
    partial path contributes a partial dx; the transpose of this op sums
    them).
    """

    @jax.custom_vjp
    def f(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (jax.lax.psum(g, axis_name),)

    f.defvjp(fwd, bwd)
    return f


def _psum_identity(axis_name: str):
    """Megatron's "g" operator: all-reduce forward, identity backward.

    Must be explicit (not bare ``lax.psum``): under ``check_vma=False``
    shard_map can't see that the upstream cotangent is replicated, so psum
    would transpose to another psum and overcount branch gradients tp×.
    """

    @jax.custom_vjp
    def f(x):
        return jax.lax.psum(x, axis_name)

    def fwd(x):
        return jax.lax.psum(x, axis_name), None

    def bwd(_, g):
        return (g,)

    f.defvjp(fwd, bwd)
    return f


def _specs(tree, spec_fn):
    return jax.tree_util.tree_map(lambda a: spec_fn(a), tree)


def one_f_one_b_grads(
    stage_fwd: Callable[..., jnp.ndarray],
    head_vjp: Callable[..., tuple],
    blocks_params: Any,
    head_params: Any,
    x0s: jnp.ndarray,
    stage_args: Any,
    head_args: Any,
    bcast_args: Any,
    rng_blocks,
    rng_head,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str = "data",
    aux_weight: float | None = None,
    blocks_specs: Any = None,
):
    """Interleaved one-forward-one-backward pipeline schedule with gradients.

    Timing (S stages, n microbatches, tick t, stage s = pipe axis index):
      forward of microbatch  mf = t - s
      head (loss + backward seed, last stage only)  mh = t - (S-1)
      stage backward of      mb = t - 2(S-1) + s
    for t in [0, n + 2(S-1) - 2]. Forward and backward both run every tick
    (eager 1F1B): the stage-input stash needs 2(S-1-s)+1 <= 2S-1 slots —
    constant in n — and the backward REcomputes the stage forward from the
    stashed input (rematerialization), so no residuals are stored.

    Args:
      stage_fwd(stage_params, x, stage_args_m, bcast_args, rng_m) -> y:
        applies this stage's L/S stacked layers to one microbatch.
      head_vjp(head_params, y, head_args_m, bcast_args, rng_m)
        -> (loss_m, dL/dy, head_param_grads): loss head for one microbatch,
        seeded with cotangent 1.0.
      blocks_params: [L, ...] stacked pytree (sharded P(axis) on dim 0).
      head_params: replicated pytree.
      x0s: [n, B, ...] microbatched stage-0 inputs (dim 1 sharded over
        ``data_axis`` if present in the mesh).
      stage_args / head_args: pytrees of [n, B, ...] per-microbatch data
        (attention masks, targets, ...), dim 1 data-sharded.
      bcast_args: pytree of replicated extras (e.g. rel-pos embeddings).
      rng_blocks / rng_head: PRNG keys; folded per (data shard, stage,
        microbatch[, layer]) inside so recompute sees identical dropout.
      aux_weight: if not None, ``stage_fwd`` must return ``(y, aux)`` with a
        scalar per-microbatch auxiliary loss (e.g. the MoE load-balance
        term); the schedule adds ``aux_weight · mean_{micro,dp}(Σ_stages aux)``
        to the loss and seeds the stage VJP's aux cotangent with
        ``aux_weight`` so router gradients flow in the same backward wave.
      blocks_specs: optional PartitionSpec tree for ``blocks_params``
        overriding the default P(axis) layer-dim sharding — used by the
        tensor-parallel stage (extra dims sharded over 'model'); gradients
        come back in the same layout.

    Returns (loss, blocks_grads [L, ...], head_grads, dx0s [n, B, ...])
    — plus a trailing ``aux`` scalar (the unweighted mean auxiliary loss)
    when ``aux_weight`` is not None. loss is the mean over (microbatch,
    data shard) of the head losses (reference DataParallel semantics, plus
    the weighted aux term); every gradient is d(loss)/d(·).
    """
    has_aux = aux_weight is not None
    n_micro = x0s.shape[0]
    s_stages = mesh.shape[axis]
    has_data = data_axis in mesh.shape
    dp = mesh.shape[data_axis] if has_data else 1
    d_stash = 2 * s_stages - 1
    n_ticks = n_micro + 2 * s_stages - 2
    perm_fwd = [(i, (i + 1) % s_stages) for i in range(s_stages)]
    perm_bwd = [(i, (i - 1) % s_stages) for i in range(s_stages)]
    reduce_axes = (axis, data_axis) if has_data else (axis,)
    scale = 1.0 / float(n_micro * dp)

    def batch_spec(a):
        # [n, B, ...]: microbatch dim replicated, batch dim data-sharded
        rest = (None,) * (a.ndim - 2)
        return P(None, data_axis if has_data else None, *rest)

    if blocks_specs is None:
        blocks_specs = _specs(blocks_params, lambda a: P(axis, *(None,) * (a.ndim - 1)))
    rep = lambda a: P()  # noqa: E731

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            blocks_specs,
            _specs(head_params, rep),
            batch_spec(x0s),
            _specs(stage_args, batch_spec),
            _specs(head_args, batch_spec),
            _specs(bcast_args, rep),
            P(),
            P(),
        ),
        out_specs=(P(), blocks_specs, _specs(head_params, rep), batch_spec(x0s))
        + ((P(),) if has_aux else ()),
        check_vma=False,
    )
    def run(blocks_local, head_p, x0s_l, sargs_l, hargs_l, bargs, rngb, rngh):
        s = jax.lax.axis_index(axis)
        didx = jax.lax.axis_index(data_axis) if has_data else 0
        rngb_s = jax.random.fold_in(jax.random.fold_in(rngb, s), didx)
        rngh_d = jax.random.fold_in(rngh, didx)

        def fwd(params, x, m):
            # (y, aux) when has_aux, else y
            return stage_fwd(
                params, x, _dyn(sargs_l, jnp.clip(m, 0, n_micro - 1)),
                bargs, jax.random.fold_in(rngb_s, jnp.clip(m, 0, n_micro - 1)),
            )

        mb_shape = x0s_l.shape[1:]
        act0 = jnp.zeros(mb_shape, x0s_l.dtype)

        def tick(t, carry):
            act_in, grad_in, stash, bgrad, hgrad, dx0, loss_acc, aux_acc = carry

            # ---- forward: microbatch mf = t - s
            mf = t - s
            fwd_valid = jnp.logical_and(mf >= 0, mf < n_micro)
            mfc = jnp.clip(mf, 0, n_micro - 1)
            x_in = jnp.where(s == 0, _dyn(x0s_l, mfc), act_in)
            slot_f = jnp.mod(mfc, d_stash)
            old = jax.lax.dynamic_index_in_dim(stash, slot_f, 0, keepdims=False)
            stash = jax.lax.dynamic_update_index_in_dim(
                stash, jnp.where(fwd_valid, x_in, old), slot_f, 0
            )
            out = fwd(blocks_local, x_in, mfc)
            if has_aux:
                y, aux_m = out
                aux_acc = aux_acc + fwd_valid.astype(jnp.float32) * aux_m
            else:
                y = out

            # ---- head: last stage computes loss + backward seed for mh = mf
            mh = t - (s_stages - 1)
            mhc = jnp.clip(mh, 0, n_micro - 1)
            head_valid = jnp.logical_and(
                s == s_stages - 1, jnp.logical_and(mh >= 0, mh < n_micro)
            )
            loss_m, dl_dy, hg = head_vjp(
                head_p, y, _dyn(hargs_l, mhc), bargs, jax.random.fold_in(rngh_d, mhc)
            )
            hsel = head_valid.astype(jnp.float32)
            loss_acc = loss_acc + hsel * loss_m
            hgrad = jax.tree_util.tree_map(
                lambda a, g: a + hsel.astype(g.dtype) * g, hgrad, hg
            )

            # ---- backward: microbatch mb = t - 2(S-1) + s (remat fwd + vjp)
            mb = t - 2 * (s_stages - 1) + s
            bwd_valid = jnp.logical_and(mb >= 0, mb < n_micro)
            mbc = jnp.clip(mb, 0, n_micro - 1)
            x_saved = jax.lax.dynamic_index_in_dim(
                stash, jnp.mod(mbc, d_stash), 0, keepdims=False
            )
            g_in = jnp.where(s == s_stages - 1, dl_dy, grad_in)
            _, stage_vjp = jax.vjp(lambda p, x: fwd(p, x, mbc), blocks_local, x_saved)
            if has_aux:
                # the aux cotangent is the constant weight it carries in the
                # total loss (the 1/(n·dp) mean scale is applied at the end)
                gp, gx = stage_vjp((g_in, jnp.asarray(aux_weight, jnp.float32)))
            else:
                gp, gx = stage_vjp(g_in)
            bsel = bwd_valid.astype(jnp.float32)
            bgrad = jax.tree_util.tree_map(
                lambda a, g: a + bsel.astype(g.dtype) * g, bgrad, gp
            )
            write0 = jnp.logical_and(s == 0, bwd_valid)
            dx0_old = jax.lax.dynamic_index_in_dim(dx0, mbc, 0, keepdims=False)
            dx0 = jax.lax.dynamic_update_index_in_dim(
                dx0, jnp.where(write0, gx.astype(dx0.dtype), dx0_old), mbc, 0
            )

            # ---- rotate: activations right, cotangents left
            act_in = jax.lax.ppermute(y, axis, perm_fwd)
            grad_in = jax.lax.ppermute(gx, axis, perm_bwd)
            return act_in, grad_in, stash, bgrad, hgrad, dx0, loss_acc, aux_acc

        carry = (
            act0,
            act0,
            jnp.zeros((d_stash,) + mb_shape, x0s_l.dtype),
            jax.tree_util.tree_map(jnp.zeros_like, blocks_local),
            jax.tree_util.tree_map(jnp.zeros_like, head_p),
            jnp.zeros_like(x0s_l),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        _, _, _, bgrad, hgrad, dx0, loss_acc, aux_acc = jax.lax.fori_loop(
            0, n_ticks, tick, carry
        )

        loss = jax.lax.psum(loss_acc, reduce_axes) * scale
        if has_aux:
            # sum over stages (psum over the pipe axis) = sum over layers,
            # matching the sequential encoder's per-layer aux sum; mean over
            # (microbatch, data shard) matches the chunked loss semantics
            aux_total = jax.lax.psum(aux_acc, reduce_axes) * scale
            loss = loss + jnp.float32(aux_weight) * aux_total
        if has_data:
            bgrad = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, data_axis), bgrad
            )
        bgrad = jax.tree_util.tree_map(lambda g: g * jnp.asarray(scale, g.dtype), bgrad)
        hgrad = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, reduce_axes) * jnp.asarray(scale, g.dtype), hgrad
        )
        dx0 = jax.lax.psum(dx0, axis) * jnp.asarray(scale, dx0.dtype)
        if has_aux:
            return loss, bgrad, hgrad, dx0, aux_total
        return loss, bgrad, hgrad, dx0

    return run(
        blocks_params, head_params, x0s, stage_args, head_args, bcast_args,
        rng_blocks, rng_head,
    )


# ---------------------------------------------------------------------------
# Tensor parallelism inside the 1F1B stage (manual Megatron-style collectives)
# ---------------------------------------------------------------------------

def tp_blocks_layout(blocks: Any, n_heads: int, glu_act: bool, axis: str = "pipe",
                     tp_axis: str = "model"):
    """Re-layout stacked TransformerEncoderLayer params for manual TP.

    The flax layout fuses heads/GLU-halves into single columns; tensor
    parallelism needs shard-aligned dims: QKV columns become [3, H, dk]
    (heads shard), the out-proj input becomes [H, dk], and the (optionally
    GLU-doubled) w1 columns become [g, F] so each shard holds MATCHING
    halves of the gate (a contiguous column shard of [2F] would give one
    shard all of `a` and another all of `sigmoid(b)`).

    Returns (tp_tree, spec_tree, restore_fn) where restore_fn maps a
    gradient tree in the tp layout back to the flax layout.
    """
    qkv_w = blocks["slf_attn"]["qkv_proj"]["dense"]["kernel"]  # [L, D, 3D]
    lnum, d_model, _ = qkv_w.shape
    dk = d_model // n_heads
    g = 2 if glu_act else 1
    moe = "moe" in blocks
    relpos = "pos_proj" in blocks["slf_attn"]

    tp = {
        "ln1": blocks["norm1"],                      # {scale, bias} [L, D]
        "ln2": blocks["norm2"],
        "qkv_w": qkv_w.reshape(lnum, d_model, 3, n_heads, dk),
        "qkv_b": blocks["slf_attn"]["qkv_proj"]["dense"]["bias"].reshape(
            lnum, 3, n_heads, dk),
        "out_w": blocks["slf_attn"]["out_proj"]["dense"]["kernel"].reshape(
            lnum, n_heads, dk, d_model),
        "out_b": blocks["slf_attn"]["out_proj"]["dense"]["bias"],
    }
    if moe:
        # MoE FFN: experts shard over the tp axis (router replicated);
        # expert-stacked weights are already shard-aligned on dim 1
        tp["router_w"] = blocks["moe"]["router"]["dense"]["kernel"]  # [L, D, E]
        tp["router_b"] = blocks["moe"]["router"]["dense"]["bias"]    # [L, E]
        tp["moe_w1"] = blocks["moe"]["w1"]  # [L, E, D, F']
        tp["moe_b1"] = blocks["moe"]["b1"]  # [L, E, F']
        tp["moe_w2"] = blocks["moe"]["w2"]  # [L, E, F, D]
        tp["moe_b2"] = blocks["moe"]["b2"]  # [L, E, D]
    else:
        w1_w = blocks["ffn"]["w1"]["dense"]["kernel"]  # [L, D, g*F]
        d_ff = w1_w.shape[2] // g
        tp["w1_w"] = w1_w.reshape(lnum, d_model, g, d_ff)
        tp["w1_b"] = blocks["ffn"]["w1"]["dense"]["bias"].reshape(lnum, g, d_ff)
        tp["w2_w"] = blocks["ffn"]["w2"]["dense"]["kernel"]  # [L, F, D]
        tp["w2_b"] = blocks["ffn"]["w2"]["dense"]["bias"]
    if "concat_linear" in blocks:
        # concat_after linear consumes replicated tensors: keep it replicated
        tp["cat_w"] = blocks["concat_linear"]["dense"]["kernel"]  # [L, 2D, D]
        tp["cat_b"] = blocks["concat_linear"]["dense"]["bias"]
    if relpos:
        # rel-pos extras (modules.py:RelPosSelfAttention) — all head-major,
        # sharded over heads like qkv; pos_proj is bias-free
        tp["pos_w"] = blocks["slf_attn"]["pos_proj"]["dense"]["kernel"].reshape(
            lnum, d_model, n_heads, dk)
        tp["posu"] = blocks["slf_attn"]["posu"]  # [L, 1, H, 1, dk]
        tp["posv"] = blocks["slf_attn"]["posv"]
    specs = {
        "ln1": _specs(tp["ln1"], lambda a: P(axis, None)),
        "ln2": _specs(tp["ln2"], lambda a: P(axis, None)),
        "qkv_w": P(axis, None, None, tp_axis, None),
        "qkv_b": P(axis, None, tp_axis, None),
        "out_w": P(axis, tp_axis, None, None),
        "out_b": P(axis, None),
    }
    if moe:
        specs["router_w"] = P(axis, None, None)
        specs["router_b"] = P(axis, None)
        specs["moe_w1"] = P(axis, tp_axis, None, None)
        specs["moe_b1"] = P(axis, tp_axis, None)
        specs["moe_w2"] = P(axis, tp_axis, None, None)
        specs["moe_b2"] = P(axis, tp_axis, None)
    else:
        specs["w1_w"] = P(axis, None, None, tp_axis)
        specs["w1_b"] = P(axis, None, tp_axis)
        specs["w2_w"] = P(axis, tp_axis, None)
        specs["w2_b"] = P(axis, None)
    if "cat_w" in tp:
        specs["cat_w"] = P(axis, None, None)
        specs["cat_b"] = P(axis, None)
    if relpos:
        specs["pos_w"] = P(axis, None, tp_axis, None)
        specs["posu"] = P(axis, None, tp_axis, None, None)
        specs["posv"] = P(axis, None, tp_axis, None, None)

    def restore(gt):
        attn = {
            "qkv_proj": {"dense": {
                "kernel": gt["qkv_w"].reshape(lnum, d_model, 3 * d_model),
                "bias": gt["qkv_b"].reshape(lnum, 3 * d_model),
            }},
            "out_proj": {"dense": {
                "kernel": gt["out_w"].reshape(lnum, d_model, d_model),
                "bias": gt["out_b"],
            }},
        }
        if relpos:
            attn["pos_proj"] = {"dense": {
                "kernel": gt["pos_w"].reshape(lnum, d_model, d_model)}}
            attn["posu"] = gt["posu"]
            attn["posv"] = gt["posv"]
        out = {
            "norm1": gt["ln1"],
            "norm2": gt["ln2"],
            "slf_attn": attn,
        }
        if moe:
            out["moe"] = {
                "router": {"dense": {"kernel": gt["router_w"], "bias": gt["router_b"]}},
                "w1": gt["moe_w1"], "b1": gt["moe_b1"],
                "w2": gt["moe_w2"], "b2": gt["moe_b2"],
            }
        else:
            out["ffn"] = {
                "w1": {"dense": {"kernel": gt["w1_w"].reshape(lnum, d_model, g * d_ff),
                                 "bias": gt["w1_b"].reshape(lnum, g * d_ff)}},
                "w2": {"dense": {"kernel": gt["w2_w"], "bias": gt["w2_b"]}},
            }
        if "cat_w" in gt:
            out["concat_linear"] = {"dense": {"kernel": gt["cat_w"], "bias": gt["cat_b"]}}
        return out

    return tp, specs, restore


def _flax_layernorm(x, scale, bias, dtype, eps=1e-6):
    """nn.LayerNorm semantics: f32 stats (E[x²]−E[x]²), scale+bias, cast."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def _dropout(rng, x, rate: float):
    if rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def make_tp_stage_fwd(enc, per_stage: int, tp_axis: str = "model"):
    """Build a 1F1B ``stage_fwd`` computing TransformerEncoderLayer forward
    with tensor parallelism over ``tp_axis``: column-parallel QKV/w1 (heads /
    matched GLU halves shard), row-parallel out-proj/w2 closed by the "g"
    operator (psum-fwd/identity-bwd), and the "f" operator (identity-fwd/
    psum-bwd) at each sharded BRANCH input — the residual bypasses both —
    so the rematerialized VJP emits exactly the Megatron collectives.
    Params arrive in the ``tp_blocks_layout`` layout, locally sliced.

    Matches models/encoder.py:TransformerEncoderLayer exactly (including the
    reference-parity pre-norm residual quirk); dropout uses the folded
    per-(stage, microbatch, layer) rng, identical across model shards so the
    residual stream stays replicated.
    """
    from ..models.modules import (
        ACTIVATIONS, apply_attn_mask, attention_context, glu, relative_shift,
    )

    relpos = enc.relative_positional
    dtype = enc.dtype
    glu_act = enc.activation == "glu"
    act_fn = glu if glu_act else ACTIVATIONS[enc.activation]
    pre = enc.normalize_before
    concat_after = enc.concat_after
    moe = enc.moe_experts > 0
    f_op = _identity_psum(tp_axis)
    g_op = _psum_identity(tp_axis)

    def relpos_context(p, q, k, v, attn_mask, pos_emb):
        """RelPosSelfAttention.__call__ math on this shard's local heads
        (modules.py:369-398); posu/posv/pos_proj are head-sharded with qkv."""
        r = jnp.einsum("xsd,dhj->xhsj", pos_emb, p["pos_w"].astype(dtype))
        posu = p["posu"].astype(dtype)  # [1, Hl, 1, dk]
        posv = p["posv"].astype(dtype)
        ac = jnp.einsum("bhqd,bhkd->bhqk", q + posu, k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,xhsd->bhqs", q + posv, r,
                        preferred_element_type=jnp.float32)
        bd = relative_shift(bd)
        scores = (ac + bd) / (q.shape[-1] ** 0.5)
        scores = apply_attn_mask(scores, attn_mask)
        weights = jax.nn.softmax(scores, axis=-1).astype(dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                          preferred_element_type=jnp.float32).astype(dtype)

    def moe_ffn(p, x, r_ffn, r_jit, pad_mask):
        """MoEFeedForward.__call__ math with EXPERTS sharded over tp_axis:
        the router runs replicated; each shard computes its local experts'
        dispatch/FFN/combine and the partial outputs psum ("g"). The router
        gradient needs care: the dispatch/combine path contributes PARTIAL
        router cotangents (local experts only) — routed through an "f" on
        the logits so they psum to the full gradient — while the aux-loss
        path contributes IDENTICAL cotangents on every shard and reads the
        un-wrapped logits."""
        b, t, d = x.shape
        e = enc.moe_experts
        top_k = enc.moe_top_k
        cap = int(np.ceil(t * enc.moe_capacity_factor * top_k / e))
        cap = max(min(cap, t), 1)

        r_in = x
        if enc.moe_router_jitter > 0.0:
            noise = jax.random.uniform(
                r_jit, x.shape, x.dtype,
                1.0 - enc.moe_router_jitter, 1.0 + enc.moe_router_jitter)
            r_in = x * noise
        logits = (r_in.astype(jnp.float32) @ p["router_w"].astype(jnp.float32)
                  + p["router_b"].astype(jnp.float32))
        probs_aux = jax.nn.softmax(logits, axis=-1)         # aux path
        probs = jax.nn.softmax(f_op(logits), axis=-1)       # dispatch path
        valid = None if pad_mask is None else pad_mask.astype(jnp.float32)

        dispatch = jnp.zeros((b, t, e, cap), jnp.float32)
        combine = jnp.zeros((b, t, e, cap), jnp.float32)
        counts = jnp.zeros((b, e), jnp.float32)
        remaining = probs
        gate_sum = jnp.zeros((b, t), jnp.float32)
        slots = []
        for _ in range(top_k):
            idx = jnp.argmax(remaining, axis=-1)
            oh = jax.nn.one_hot(idx, e, dtype=jnp.float32)
            if valid is not None:
                oh = oh * valid[:, :, None]
            gate = jnp.sum(remaining * oh, axis=-1)
            slots.append((oh, gate))
            gate_sum = gate_sum + gate
            remaining = remaining * (1.0 - oh)
        for oh, gate in slots:
            pos = jnp.cumsum(oh, axis=1) - oh + counts[:, None, :]
            keep = (pos < cap).astype(jnp.float32) * oh
            counts = counts + jnp.sum(keep, axis=1)
            pos_oh = jax.nn.one_hot(
                jnp.sum(pos * oh, axis=-1).astype(jnp.int32), cap, dtype=jnp.float32)
            sel = keep[:, :, :, None] * pos_oh[:, :, None, :]
            dispatch = dispatch + sel
            gk = gate / jnp.maximum(gate_sum, 1e-9) if top_k > 1 else gate
            combine = combine + sel * gk[:, :, None, None]

        denom = jnp.maximum(jnp.sum(valid), 1.0) if valid is not None else float(b * t)
        f_frac = jnp.sum(slots[0][0], axis=(0, 1)) / denom
        masked = probs_aux if valid is None else probs_aux * valid[:, :, None]
        p_mean = jnp.sum(masked, axis=(0, 1)) / denom
        aux = e * jnp.sum(f_frac * p_mean)

        el = p["moe_w1"].shape[0]  # local experts on this shard
        e0 = jax.lax.axis_index(tp_axis) * el
        disp_l = jax.lax.dynamic_slice_in_dim(dispatch, e0, el, axis=2)
        comb_l = jax.lax.dynamic_slice_in_dim(combine, e0, el, axis=2)
        hs = f_op(x)
        xe = jnp.einsum("btec,btd->becd", disp_l.astype(dtype), hs)
        hm = jnp.einsum("becd,edf->becf", xe, p["moe_w1"].astype(dtype))
        hm = hm + p["moe_b1"].astype(dtype)[None, :, None, :]
        hm = glu(hm) if glu_act else ACTIVATIONS[enc.activation](hm)
        hm = _dropout(r_ffn, hm, enc.ffn_dropout)
        ye = jnp.einsum("becf,efd->becd", hm, p["moe_w2"].astype(dtype))
        ye = ye + p["moe_b2"].astype(dtype)[None, :, None, :]
        y = jnp.einsum("btec,becd->btd", comb_l.astype(dtype), ye)
        return g_op(y), aux.astype(jnp.float32)

    def layer_fwd(p, x, attn_mask, pos_emb, rng, pad_mask=None):
        r_attn, r_res1, r_ffn, r_res2 = jax.random.split(rng, 4)
        r_jit = r_ffn  # replicated jitter rng (pre-fold), matches all shards
        # dropout on REPLICATED tensors (attn out, residuals) must be
        # identical across model shards; dropout on the SHARDED ffn
        # activation must be iid per shard, else features f and f+F/tp
        # would always drop together
        r_ffn = jax.random.fold_in(r_ffn, jax.lax.axis_index(tp_axis))
        h = _flax_layernorm(x, p["ln1"]["scale"], p["ln1"]["bias"], dtype) if pre else x
        # reference-parity pre-norm: the residual is the NORMALIZED tensor
        residual = h if pre else x
        h_in = h  # pre-attention tensor: replicated consumer (concat_after)
        # "f" wraps ONLY the sharded branch — the residual bypasses it, else
        # its (replicated) cotangent would be psum-overcounted tp×
        h = f_op(h)
        qkv = jnp.einsum("btd,dchj->bchtj", h, p["qkv_w"].astype(dtype))
        qkv = qkv + p["qkv_b"].astype(dtype)[None, :, :, None, :]
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [B, Hl, T, dk] each
        if relpos:
            ctx = relpos_context(p, q, k, v, attn_mask, pos_emb)
        else:
            ctx, _ = attention_context(q, k, v, attn_mask, dtype)
        out = jnp.einsum("bhtj,hjd->btd", ctx, p["out_w"].astype(dtype))
        out = g_op(out) + p["out_b"].astype(dtype)
        out = _dropout(r_attn, out, enc.slf_attn_dropout)
        if concat_after:
            # reference parity: concat(h, attn_out) -> linear, NO residual
            # dropout (encoder.py:107-110); all tensors replicated here
            cat = jnp.concatenate([h_in, out], axis=-1)
            cc = jnp.einsum("btc,cd->btd", cat, p["cat_w"].astype(dtype))
            h = residual + cc + p["cat_b"].astype(dtype)
        else:
            h = residual + _dropout(r_res1, out, enc.residual_dropout)
        if not pre:
            h = _flax_layernorm(h, p["ln1"]["scale"], p["ln1"]["bias"], dtype)

        h2 = _flax_layernorm(h, p["ln2"]["scale"], p["ln2"]["bias"], dtype) if pre else h
        residual = h2 if pre else h
        aux = None
        if moe:
            out2, aux = moe_ffn(p, h2, r_ffn, r_jit, pad_mask)
        else:
            h2 = f_op(h2)
            h1 = jnp.einsum("btd,dgf->btgf", h2, p["w1_w"].astype(dtype))
            h1 = h1 + p["w1_b"].astype(dtype)[None, None]
            if glu_act:
                a, b = h1[:, :, 0], h1[:, :, 1]
                hact = a * jax.nn.sigmoid(b)
            else:
                hact = act_fn(h1[:, :, 0])
            hact = _dropout(r_ffn, hact, enc.ffn_dropout)
            out2 = jnp.einsum("btf,fd->btd", hact, p["w2_w"].astype(dtype))
            out2 = g_op(out2) + p["w2_b"].astype(dtype)
        h = residual + _dropout(r_res2, out2, enc.residual_dropout)
        if not pre:
            h = _flax_layernorm(h, p["ln2"]["scale"], p["ln2"]["bias"], dtype)
        return h, aux

    def stage_fwd(stage_p, x, sargs, bargs, rng_m):
        def body(xc, inp):
            p, i = inp
            y, aux = layer_fwd(p, xc, sargs["attn_mask"], bargs.get("pos_emb"),
                               jax.random.fold_in(rng_m, i),
                               pad_mask=sargs.get("pad_mask"))
            return y, aux

        y, auxs = jax.lax.scan(body, x, (stage_p, jnp.arange(per_stage)))
        if moe:
            return y, jnp.sum(auxs)
        return y

    return stage_fwd


def speech2text_1f1b_grad_fn(model, mesh, n_micro: int, axis: str = "pipe"):
    """Build ``(trainable_params, args, rng) -> (loss, grads, aux)`` computing
    the SpeechToText training loss/gradients under the 1F1B pipeline schedule.

    The encoder block stack (``scan_layers: true`` stacked params, sharded
    over ``axis``) is pipelined; the frontend (+ positional encoding) runs
    before as ordinary GSPMD compute, and the decoder + loss head runs on the
    last stage inside the schedule. MoE encoders are supported: each stage
    emits its layers' load-balance aux, threaded through the schedule with
    ``aux_weight=moe_aux_weight`` (reported in ``aux['moe_aux']``). A
    ``model`` mesh axis adds tensor parallelism inside each stage via the
    manual-collective ``make_tp_stage_fwd`` (dense, concat_after, and MoE
    layers, abs- or rel-positional; the frontend and loss head stay
    replicated over 'model').
    """
    from ..models.encoder import TransformerEncoderLayer
    from ..models.speech2text import SpeechToText, _build_encoder

    if not isinstance(model, SpeechToText):
        raise ValueError(
            f"1F1B pipeline supports speech2text models (got {type(model).__name__}); "
            "ctc/transducer heads are not wired as pipeline loss heads"
        )
    if getattr(model, "encoder_type", None) != "transformer":
        raise ValueError("1F1B pipeline requires a transformer encoder")
    enc = _build_encoder(model.encoder_type, model.encoder_cfg, model.dtype)
    if not enc.scan_layers:
        raise ValueError("1F1B pipeline requires encoder scan_layers: true")
    s_stages = mesh.shape[axis]
    if enc.n_blocks % s_stages != 0:
        raise ValueError(f"pipe={s_stages} must divide n_blocks={enc.n_blocks}")
    moe = enc.moe_experts > 0
    layer = TransformerEncoderLayer(
        d_model=enc.d_model, n_heads=enc.n_heads, d_ff=enc.d_ff,
        slf_attn_dropout=enc.slf_attn_dropout, ffn_dropout=enc.ffn_dropout,
        residual_dropout=enc.residual_dropout, normalize_before=enc.normalize_before,
        concat_after=enc.concat_after, activation=enc.activation,
        relative_positional=enc.relative_positional,
        moe_experts=enc.moe_experts, moe_top_k=enc.moe_top_k,
        moe_capacity_factor=enc.moe_capacity_factor,
        moe_router_jitter=enc.moe_router_jitter, dtype=enc.dtype,
    )
    per_stage = enc.n_blocks // s_stages
    has_data = "data" in mesh.shape
    dp = mesh.shape["data"] if has_data else 1
    tp = mesh.shape.get("model", 1)
    if tp > 1:
        if enc.n_heads % tp:
            raise ValueError(f"tp={tp} must divide n_heads={enc.n_heads}")
        if moe:
            if enc.moe_experts % tp:
                raise ValueError(
                    f"tp={tp} must divide moe_experts={enc.moe_experts}")
        elif enc.d_ff % tp:
            raise ValueError(f"tp={tp} must divide d_ff={enc.d_ff}")
        tp_stage_fwd = make_tp_stage_fwd(enc, per_stage)

    def split_params(trainable):
        extra = set(trainable) - {"frontend", "encoder", "decoder", "ctc"}
        if extra:
            raise ValueError(f"unexpected param collections for 1F1B: {extra}")
        enc_p = trainable["encoder"]
        front = {"frontend": trainable["frontend"]}
        fe = {k: enc_p[k] for k in ("pos_enc",) if k in enc_p}
        if fe:
            front["encoder"] = fe
        head = {"decoder": trainable["decoder"]}
        he = {k: enc_p[k] for k in ("after_norm",) if k in enc_p}
        if he:
            head["encoder"] = he
        if "ctc" in trainable:
            head["ctc"] = trainable["ctc"]
        return front, enc_p["blocks"], head

    def merge_grads(front_g, blocks_g, head_g):
        enc_g = dict(front_g.get("encoder", {}))
        enc_g.update(head_g.get("encoder", {}))
        enc_g["blocks"] = blocks_g
        grads = {"frontend": front_g["frontend"], "encoder": enc_g,
                 "decoder": head_g["decoder"]}
        if "ctc" in head_g:
            grads["ctc"] = head_g["ctc"]
        return grads

    def stage_fwd(stage_p, x, sargs, bargs, rng_m):
        def body(xc, inp):
            p, i = inp
            y, w = layer.apply(
                {"params": p}, xc, sargs["attn_mask"], bargs["pos_emb"], False,
                rngs={"dropout": jax.random.fold_in(rng_m, i)},
                **({"pad_mask": sargs["pad_mask"]} if moe else {}),
            )
            if moe:
                _, aux_i = w  # MoE layers return (attn_w, load-balance aux)
                return y, aux_i
            return y, None
        y, auxs = jax.lax.scan(body, x, (stage_p, jnp.arange(per_stage)))
        if moe:
            return y, jnp.sum(auxs)
        return y

    def head_vjp(head_p, y, hargs, bargs, rng_m):
        def hf(hp, yy):
            return model.apply(
                {"params": hp}, yy, hargs["mask"], hargs["targets"],
                hargs["tlen"], deterministic=False,
                rngs={"dropout": rng_m}, method="pipeline_head",
            )
        loss_m, vjp_fn = jax.vjp(hf, head_p, y)
        g_hp, g_y = vjp_fn(jnp.ones_like(loss_m))
        return loss_m, g_y, g_hp

    def grads_fn(trainable, args, rng):
        feats, feat_mask, targets, targets_length = args
        b = feats.shape[0]
        if b % (n_micro * dp) != 0:
            raise ValueError(
                f"batch {b} must divide into pp_micro_batches={n_micro} x dp={dp}"
            )
        r_pre, r_blocks, r_head = jax.random.split(rng, 3)
        front, blocks, head = split_params(trainable)

        def pre_fn(front_p):
            x, mask, attn_mask, pos_emb = model.apply(
                {"params": front_p}, feats, feat_mask, deterministic=False,
                train=True, rngs={"dropout": r_pre}, method="pipeline_pre",
            )
            return x, (mask, attn_mask, pos_emb)

        x0, pre_vjp, (mem_mask, attn_mask, pos_emb) = jax.vjp(
            pre_fn, front, has_aux=True
        )
        mb = b // n_micro

        def micro(a):
            return a.reshape((n_micro, mb) + a.shape[1:])

        x0s = micro(x0)
        stage_args = {"attn_mask": micro(attn_mask)}
        if moe:
            stage_args["pad_mask"] = micro(mem_mask)
        head_args = {
            "mask": micro(mem_mask),
            "targets": micro(targets),
            "tlen": micro(targets_length),
        }
        bcast = {"pos_emb": pos_emb}

        restore = None
        if tp > 1:
            blocks, tp_specs, restore = tp_blocks_layout(
                blocks, enc.n_heads, enc.activation == "glu", axis=axis
            )
        out = one_f_one_b_grads(
            tp_stage_fwd if tp > 1 else stage_fwd, head_vjp, blocks, head,
            x0s, stage_args, head_args, bcast, r_blocks, r_head, mesh,
            axis=axis,
            aux_weight=float(model.moe_aux_weight) if moe else None,
            blocks_specs=tp_specs if tp > 1 else None,
        )
        if moe:
            loss, blocks_g, head_g, dx0s, moe_aux = out
            aux = {"moe_aux": moe_aux}
        else:
            loss, blocks_g, head_g, dx0s = out
            aux = {}
        if restore is not None:
            blocks_g = restore(blocks_g)
        (front_g,) = pre_vjp(dx0s.reshape(x0.shape))
        return loss, merge_grads(front_g, blocks_g, head_g), aux

    return grads_fn
