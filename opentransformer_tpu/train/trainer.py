"""Trainer: jit-compiled train step over a device mesh.

Reference semantics preserved (``otrans/train/trainer.py:140-260``):
  * gradient accumulation: micro-batch losses scaled by 1/accum_steps, one
    optimizer update per ``accum_steps`` micro-batches
  * clip-by-global-norm, then optional per-param Gaussian grad noise
    (std ``grad_noise``, divided by accum_steps)
  * NaN-grad-norm guard: the update is skipped entirely (params, moments and
    the schedule step are untouched)
  * Noam et al. schedules step per optimizer update, not per micro-batch
  * MixSpeech: pairwise input mixing with a Beta(0.5, 0.5) λ and dual losses
  * window-100 mean loss, aux-loss meters, interval logging
  * per-epoch checkpoint + optimizer state, keep-last-N pruning

TPU-native execution model (replaces DataParallel/DDP + NCCL):
  * params live on a `Mesh` with NamedShardings (dp replicate + optional tp
    shard, see ``parallel/mesh.py``); batches are sharded over the ``data``
    axis; XLA emits the gradient all-reduce over ICI.
  * two compiled functions: ``_grad_step`` (per micro-batch, donates the
    accumulator) and ``_update_step`` (per optimizer update, donates params
    and opt state). The learning rate is a host scalar argument so all seven
    schedulers stay host-side python.
  * scalars (loss/grad-norm) are fetched only at log intervals to keep the
    device queue free of host syncs.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..parallel.mesh import batch_sharding, param_shardings, replicated
from .scheduler import build_optimizer, build_scheduler
from .utils import AuxiliaryLossAverageMeter, AverageMeter, MeanLoss, Visualizer

logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    nan_skips: jnp.ndarray  # i32 counter of skipped (non-finite) updates


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


class Trainer:
    """Drives epochs over a loader of (utt_ids, inputs, targets) batches.

    ``batch_fn`` adapts a loader batch to the model's apply signature — the
    default handles the speech (feats/mask/targets/lengths) contract; the LM
    path passes (src, tgt, tgt_length).
    """

    def __init__(
        self,
        params_cfg: Any,  # the 'train' config section
        model,
        mesh=None,
        expdir: str = "exp",
        checkpointer=None,
        is_mixspeech: bool = False,
        is_visual: bool = False,
        log_interval: int = 10,
        keep_last_n: int = 30,
        dev_loader=None,
        dev_probe_fn=None,
        batch_fn=None,
        static_kwargs: Optional[dict] = None,
        is_debug: bool = False,
        preprocess_fn=None,
        preprocess_state=None,
        eval_batch_fn=None,
        eval_preprocess_fn="inherit",
        pp_schedule: Optional[str] = None,
        pp_micro_batches: Optional[int] = None,
    ):
        # optional jit-compatible device preprocessing (e.g. on-device fbank +
        # SpecAugment, data/device_pipeline.py; corpus gather, data/resident.py):
        # maps raw batch_fn args + (rng, train) to model.apply args inside the
        # compiled loss step.
        self.preprocess_fn = preprocess_fn
        # large device arrays the preprocess reads (e.g. the HBM-resident
        # corpus, data/resident.py) MUST be threaded as jit ARGUMENTS, not
        # closure captures: a captured concrete jax.Array is embedded in the
        # lowered program as a constant, which balloons the compile payload
        # (a 1.8 GB corpus overflows remote-compile transports outright).
        # When set, this pytree is passed to preprocess_fn as `state=`.
        self.preprocess_state = preprocess_state
        # dev-loss eval may consume differently-shaped batches than training
        # (device-resident / on-device-extraction train loaders emit indices
        # or waveforms while the dev loader stays on the host feature path):
        # these override the train-side adapters for _eval_dev only.
        self.eval_batch_fn = eval_batch_fn
        self.eval_preprocess_fn = (preprocess_fn if eval_preprocess_fn == "inherit"
                                   else eval_preprocess_fn)
        # -debug truncates an epoch after 30 steps (reference trainer.py:254-255)
        self.is_debug = is_debug
        self.model = model
        self.mesh = mesh
        self.expdir = expdir
        self.checkpointer = checkpointer
        self.is_mixspeech = is_mixspeech
        self.log_interval = log_interval
        self.keep_last_n = keep_last_n
        self.dev_loader = dev_loader
        # optional per-epoch quality probe (e.g. greedy-decode dev CER,
        # cli/run.py): called with (params, epoch) after the dev-loss eval —
        # converts hours of blind training into epoch-1 collapse detection
        self.dev_probe_fn = dev_probe_fn
        self._last_nan_skips = None
        self.batch_fn = batch_fn or default_speech_batch
        self.eval_batch_fn = self.eval_batch_fn or self.batch_fn
        if static_kwargs is None:
            # speech models thread a static `train` flag (conformer conv norm);
            # LMs don't accept it.
            static_kwargs = {"train": True} if hasattr(model, "frontend_type") else {}
        self.static_kwargs = static_kwargs

        # pipeline schedule over a 'pipe' mesh axis: 'sharded' (default) is
        # the GSPMD weight-streaming stage sharding (params + opt state
        # sharded, lax.scan streams each layer from its owner); '1f1b' is the
        # interleaved compute pipeline (parallel/pipeline.py:one_f_one_b_grads)
        self.pp_schedule = pp_schedule or str(params_cfg.get("pp_schedule", "sharded"))
        self.pp_micro_batches = pp_micro_batches or params_cfg.get("pp_micro_batches")
        if self.pp_schedule == "1f1b":
            if mesh is None or "pipe" not in mesh.shape or mesh.shape["pipe"] < 2:
                raise ValueError("pp_schedule=1f1b needs a mesh with a pipe axis >= 2")
            if is_mixspeech:
                raise ValueError("mixspeech is not supported under pp_schedule=1f1b")

        # TPU-native multi-step execution: lax.scan N optimizer updates
        # inside ONE jitted program, so host<->device round trips amortize
        # N-fold (the per-dispatch latency, not the math, dominates small-
        # batch steps). Grouping is by identical batch shapes; ragged
        # leftovers fall back to the single-step path.
        self.steps_per_exec = int(params_cfg.get("steps_per_exec", 1))
        if self.steps_per_exec > 1 and self.pp_schedule == "1f1b":
            raise ValueError("steps_per_exec > 1 does not support pp_schedule=1f1b")

        self.accum_steps = int(params_cfg.get("accum_steps", 1))
        self.grad_clip = float(params_cfg.get("clip_grad", 0.0))
        self.grad_noise = float(params_cfg.get("grad_noise", 0.0))
        self.epochs = int(params_cfg.get("epochs", 1))

        self.opt_cfg = params_cfg.get("optimizer", {}) or {}
        self.opt_type = params_cfg.get("optimizer_type", "adam")
        # fused_update: run clip + noise + Adam + the parameter add on ONE
        # raveled [n_params] vector (see _build_update_fn_fused)
        self.fused_update = bool(params_cfg.get("fused_update", False))
        if self.fused_update:
            if self.opt_type != "adam":
                raise ValueError("train.fused_update supports optimizer_type adam only")
            # the fused path re-derives betas/eps/weight_decay/adam_m_dtype
            # itself; reject adam knobs it does not know about so a future
            # build_optimizer option cannot be silently ignored here
            known = {"lr", "betas", "eps", "weight_decay", "adam_m_dtype"}
            unknown = set(self.opt_cfg) - known
            if unknown:
                raise ValueError(
                    f"train.fused_update does not support optimizer keys "
                    f"{sorted(unknown)}; use the default per-leaf path"
                )
            if self.pp_schedule == "1f1b":
                raise ValueError("train.fused_update does not compose with pp_schedule=1f1b")
            if mesh is not None and any(
                mesh.shape.get(ax, 1) > 1 for ax in ("model", "pipe", "expert")
            ):
                raise ValueError(
                    "train.fused_update needs replicated params (data-axis-only "
                    "mesh): the flat moment buffer has no per-leaf shardings"
                )
        self.tx = build_optimizer(params_cfg.get("optimizer", {}), params_cfg.get("optimizer_type", "adam"))
        self.schedule = build_scheduler(
            params_cfg.get("scheduler", {}), params_cfg.get("scheduler_type", "transformer")
        )

        self.global_step = 1  # optimizer updates, matches reference counting
        self.global_epoch = 0
        # chaos-testing hook (the reference has no fault injection, SURVEY
        # §5): crash once at/after a given optimizer step; a marker file
        # disarms it so a supervised restart (run.py --supervise) can prove
        # crash-resume end-to-end
        self._fault_step = int(os.environ.get("OT_FAULT_INJECT_STEP", 0))
        self._fault_marker = os.environ.get("OT_FAULT_INJECT_MARKER")
        self.mean_loss = MeanLoss()
        self.visualizer = Visualizer(f"{expdir}/tb") if is_visual else None

        self._grad_fn = None
        self._update_fn = None
        self._eval_fn = None
        self._grad_core = None
        self._update_core = None
        self._multi_fn = None

    # ------------------------------------------------------------------ init
    def init_state(self, rng, sample_batch) -> TrainState:
        args = self.batch_fn(sample_batch)
        if self.preprocess_fn is not None:
            state_kw = ({} if self.preprocess_state is None
                        else {"state": self.preprocess_state})
            args = self.preprocess_fn(*args, rng=jax.random.PRNGKey(0),
                                      train=False, **state_kw)
        params = self.model.init(rng, *args)
        if self.mesh is not None:
            shardings = param_shardings(params, self.mesh)
            params = _put_global(params, shardings)
        if self.fused_update:
            opt_state = self._init_flat_opt_state(params["params"])
        else:
            opt_state = self.tx.init(params["params"])
        return TrainState(params=params, opt_state=opt_state, nan_skips=jnp.zeros((), jnp.int32))

    def _init_flat_opt_state(self, params):
        """Flat-buffer Adam state: single [n_params] moment vectors instead
        of per-leaf trees (``fused_update``). Reuses optax's ScaleByAdamState
        container so checkpointing stays uniform."""
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        m_dtype = self.opt_cfg.get("adam_m_dtype") or jnp.float32
        state = optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros((n,), m_dtype),
            nu=jnp.zeros((n,), jnp.float32),
        )
        if self.mesh is not None:
            state = _put_global(
                state, jax.tree_util.tree_map(lambda _: replicated(self.mesh), state)
            )
        return state

    # ------------------------------------------------------------ jitted fns
    def _build_grad_fn(self):
        if self.pp_schedule == "1f1b":
            return self._build_grad_fn_1f1b()
        model = self.model
        accum = self.accum_steps
        mix = self.is_mixspeech
        static_kwargs = dict(self.static_kwargs)
        preprocess = self.preprocess_fn

        def loss_fn(trainable, aux_cols, args, rng, pstate):
            # aux_cols: non-trainable collections (e.g. batch_stats for the
            # BatchNorm variants) threaded through and updated each step
            variables = {"params": trainable, **aux_cols}
            mutable = list(aux_cols.keys())
            if preprocess is not None:
                prng, rng = jax.random.split(rng)
                args = preprocess(*args, rng=prng, train=True,
                                  **({} if pstate is None else {"state": pstate}))
            new_cols = {}
            if mix:
                feats, feat_mask, targets, targets_length = args
                b = (feats.shape[0] // 2) * 2
                lam_rng, rng = jax.random.split(rng)
                lam = jax.random.beta(lam_rng, 0.5, 0.5)
                mixed = lam * feats[0:b:2] + (1.0 - lam) * feats[1:b:2]
                mmask = jnp.logical_or(feat_mask[0:b:2], feat_mask[1:b:2])
                out1 = model.apply(
                    variables, mixed, mmask, targets[0:b:2], targets_length[0:b:2],
                    deterministic=False, rngs={"dropout": rng},
                    **({"mutable": mutable} if mutable else {}), **static_kwargs,
                )
                out2 = model.apply(
                    variables, mixed, mmask, targets[1:b:2], targets_length[1:b:2],
                    deterministic=False, rngs={"dropout": rng},
                    **({"mutable": mutable} if mutable else {}), **static_kwargs,
                )
                if mutable:
                    (l1, _), _ = out1
                    (l2, _), new_cols = out2
                else:
                    l1, _ = out1
                    l2, _ = out2
                loss = lam * l1 + (1.0 - lam) * l2
                aux = {}
            else:
                out = model.apply(
                    variables, *args, deterministic=False, rngs={"dropout": rng},
                    **({"mutable": mutable} if mutable else {}), **static_kwargs
                )
                if mutable:
                    (loss, aux), new_cols = out
                else:
                    loss, aux = out
            return loss / accum, (loss, aux, new_cols)

        def grad_step(variables, grad_accum, args, rng, pstate=None):
            trainable = variables["params"]
            aux_cols = {k: v for k, v in variables.items() if k != "params"}
            (scaled, (loss, aux, new_cols)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, aux_cols, args, rng, pstate
            )
            grad_accum = jax.tree_util.tree_map(lambda a, g: a + g.astype(a.dtype), grad_accum, grads)
            new_variables = {"params": trainable, **{k: new_cols.get(k, v) for k, v in aux_cols.items()}}
            return new_variables, grad_accum, loss, aux

        self._grad_core = grad_step  # unjitted: reused by the multi-step scan
        return jax.jit(grad_step, donate_argnums=(1,))

    def _build_grad_fn_1f1b(self):
        """Pipelined grad step: 1F1B over the 'pipe' axis + manual dp."""
        from ..parallel.pipeline import speech2text_1f1b_grad_fn

        n_micro = int(self.pp_micro_batches or self.mesh.shape["pipe"])
        core = speech2text_1f1b_grad_fn(self.model, self.mesh, n_micro)
        accum = self.accum_steps
        preprocess = self.preprocess_fn

        def grad_step(variables, grad_accum, args, rng, pstate=None):
            aux_cols = {k: v for k, v in variables.items() if k != "params"}
            if aux_cols:
                raise ValueError(
                    f"pp_schedule=1f1b supports params-only models (got "
                    f"collections {sorted(aux_cols)})"
                )
            if preprocess is not None:
                prng, rng = jax.random.split(rng)
                args = preprocess(*args, rng=prng, train=True,
                                  **({} if pstate is None else {"state": pstate}))
            loss, grads, aux = core(variables["params"], args, rng)
            grad_accum = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype) / accum, grad_accum, grads
            )
            return variables, grad_accum, loss, aux

        return jax.jit(grad_step, donate_argnums=(1,))

    def _build_update_fn(self):
        if self.fused_update:
            return self._build_update_fn_fused()
        tx = self.tx
        clip = self.grad_clip
        noise = self.grad_noise
        accum = self.accum_steps

        def update(variables, opt_state, grads, nan_skips, lr, rng):
            params = variables["params"]
            gnorm = global_norm(grads)
            if clip > 0:
                scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads)
            if noise > 0:
                leaves, treedef = jax.tree_util.tree_flatten(grads)
                keys = jax.random.split(rng, len(leaves))
                leaves = [
                    g + (jax.random.normal(k, g.shape, g.dtype) * noise) / accum
                    for g, k in zip(leaves, keys)
                ]
                grads = jax.tree_util.tree_unflatten(treedef, leaves)

            ok = jnp.isfinite(gnorm)

            def do_update(_):
                updates, new_opt = tx.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
                return optax.apply_updates(params, updates), new_opt

            def skip(_):
                return params, opt_state

            new_params, new_opt = jax.lax.cond(ok, do_update, skip, None)
            new_variables = {**variables, "params": new_params}
            return new_variables, new_opt, nan_skips + (1 - ok.astype(jnp.int32)), gnorm

        self._update_core = update  # unjitted: reused by the multi-step scan
        return jax.jit(update, donate_argnums=(0, 1))

    def _build_update_fn_fused(self):
        """Fused flat-buffer update (``train.fused_update: true``).

        Clip-by-global-norm, optional grad noise, torch-semantics Adam (L2
        folded into the gradient before the moments, reference
        ``otrans/train/scheduler.py``) and the parameter add all run on ONE
        raveled [n_params] f32 vector — a handful of large HBM-friendly
        fusions instead of ~4 small HLO ops per parameter leaf (~200 leaves
        at the flagship geometry). Math is identical to the default per-leaf
        optax path (parity: tests/test_fused_update.py); grad noise draws one
        key over the flat vector instead of one per leaf (same distribution).
        Gated in __init__ to adam without model/pipe/expert sharding — the
        flat buffer has no per-leaf shardings to respect."""
        from jax.flatten_util import ravel_pytree

        clip = self.grad_clip
        noise = self.grad_noise
        accum = self.accum_steps
        b1, b2 = (float(x) for x in self.opt_cfg.get("betas", (0.9, 0.999)))
        eps = float(self.opt_cfg.get("eps", 1e-8))
        wd = float(self.opt_cfg.get("weight_decay", 0.0))
        m_dtype = self.opt_cfg.get("adam_m_dtype")

        def update(variables, opt_state, grads, nan_skips, lr, rng):
            params = variables["params"]
            g, _ = ravel_pytree(grads)
            g = g.astype(jnp.float32)
            gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
            if clip > 0:
                g = g * jnp.minimum(1.0, clip / (gnorm + 1e-6))
            if noise > 0:
                g = g + jax.random.normal(rng, g.shape, g.dtype) * (noise / accum)
            ok = jnp.isfinite(gnorm)
            p_flat, unravel = ravel_pytree(params)

            def do_update(_):
                p32 = p_flat.astype(jnp.float32)
                gw = g + wd * p32 if wd > 0 else g
                count = opt_state.count + 1
                mu = opt_state.mu.astype(jnp.float32) * b1 + gw * (1.0 - b1)
                nu = opt_state.nu * b2 + jnp.square(gw) * (1.0 - b2)
                c = count.astype(jnp.float32)
                step = (mu / (1.0 - b1 ** c)) / (jnp.sqrt(nu / (1.0 - b2 ** c)) + eps)
                new_flat = (p32 - lr * step).astype(p_flat.dtype)
                new_state = optax.ScaleByAdamState(
                    count=count,
                    mu=mu.astype(m_dtype) if m_dtype else mu,
                    nu=nu,
                )
                return new_flat, new_state

            def skip(_):
                return p_flat, opt_state

            new_flat, new_opt = jax.lax.cond(ok, do_update, skip, None)
            new_variables = {**variables, "params": unravel(new_flat)}
            return new_variables, new_opt, nan_skips + (1 - ok.astype(jnp.int32)), gnorm

        self._update_core = update  # unjitted: reused by the multi-step scan
        return jax.jit(update, donate_argnums=(0, 1))

    def _build_multi_fn(self):
        """N full update steps (grad + clip + NaN-guard + optimizer) under a
        single ``lax.scan`` in ONE jitted program — one host dispatch per N
        steps instead of 2N. Each update consumes ``accum_steps`` micro-
        batches via an inner accumulation scan (stacked_args leaves are
        [N, A, B, ...]), so gradient accumulation composes with multi-step
        execution. Semantically identical to the single-step loop (the scan
        bodies ARE the single-step cores); per-micro losses come back as
        [N, A]."""
        grad_core = self._grad_core
        update_core = self._update_core
        accum = self.accum_steps

        def multi(variables, opt_state, nan_skips, stacked_args, lrs, keys,
                  pstate=None):
            def body(carry, inp):
                variables, opt_state, nan_skips = carry
                args, lr, key = inp  # args leaves: [A, B, ...]
                k_micro, k_upd = jax.random.split(key)
                zeros = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), variables["params"]
                )

                def micro_body(mcarry, minp):
                    variables, gacc = mcarry
                    margs, mkey = minp
                    # pstate rides in from the outer jit as a tracer (a scan
                    # constant), never as an embedded program constant
                    variables, gacc, loss, aux = grad_core(
                        variables, gacc, margs, mkey, pstate)
                    return (variables, gacc), (loss, aux)

                (variables, gacc), (losses, auxes) = jax.lax.scan(
                    micro_body, (variables, zeros),
                    (args, jax.random.split(k_micro, accum)),
                )
                variables, opt_state, nan_skips, gnorm = update_core(
                    variables, opt_state, gacc, nan_skips, lr, k_upd
                )
                return (variables, opt_state, nan_skips), (losses, auxes, gnorm)

            (variables, opt_state, nan_skips), (losses, auxes, gnorms) = jax.lax.scan(
                body, (variables, opt_state, nan_skips), (stacked_args, lrs, keys)
            )
            return variables, opt_state, nan_skips, losses, auxes, gnorms

        return jax.jit(multi, donate_argnums=(0, 1))

    def _zeros_like_grads(self, variables):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), variables["params"]
        )
        if self.mesh is not None:
            zeros = _put_global(zeros, param_shardings(zeros, self.mesh))
        return zeros

    def _shard_batch(self, tree):
        if self.mesh is None:
            return tree
        sh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        n_data = self.mesh.shape.get("data", 1)

        if jax.process_count() > 1:
            # multihost: each host holds its row-slice of the global batch
            # (FeatureLoader sliced rows, identical shapes/steps on every
            # host); assemble the global array from per-process shards
            def put(x):
                global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
                return jax.make_array_from_process_local_data(sh, x, global_shape)

            return jax.tree_util.tree_map(put, tree)

        def put(x):
            # replicate ragged tails (last bucket batch may not divide the
            # data axis) instead of crashing; sharded is the common path
            target = sh if x.shape[0] % n_data == 0 else rep
            return jax.device_put(x, target)

        return jax.tree_util.tree_map(put, tree)

    # ----------------------------------------------------------------- train
    def train(self, state: TrainState, train_loader, rng) -> TrainState:
        if self._grad_fn is None:
            self._grad_fn = self._build_grad_fn()
            self._update_fn = self._build_update_fn()

        from .utils import Summary

        best = Summary()
        for epoch in range(self.global_epoch, self.epochs):
            # reshuffle BEFORE the epoch so resumed runs get the epoch-N
            # permutation, not a replay of epoch 0's
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            rng, epoch_rng = jax.random.split(rng)  # fresh randomness per epoch
            state = self.train_one_epoch(epoch, state, train_loader, epoch_rng)
            self.global_epoch = epoch + 1
            # multihost: only process 0 writes checkpoints (replaces the
            # reference's rank-0 gating, trainer.py:100-110)
            if self.checkpointer is not None and jax.process_index() == 0:
                self.checkpointer.save(
                    epoch, state, extra={"global_step": self.global_step}, keep_last_n=self.keep_last_n
                )
            if self.dev_loader is not None:
                dev_loss = self.evaluate(state, self.dev_loader)
                logger.info("epoch %d dev loss %.5f", epoch, dev_loss)
                if self.visualizer is not None:
                    self.visualizer.add_scalar("dev_loss", dev_loss, self.global_step)
                # best-checkpoint tracking (the reference's dev loop was
                # unreachable and would have crashed, SURVEY §8.6 — fixed)
                if (best.update(epoch, dev_loss) and self.checkpointer is not None
                        and jax.process_index() == 0):
                    self.checkpointer.save_params_only("model.best", state.params)
                    logger.info("new best epoch %d (dev loss %.5f)", epoch, dev_loss)
            if self.dev_probe_fn is not None:
                self.dev_probe_fn(state.params, epoch)
        if self.checkpointer is not None:
            self.checkpointer.wait()  # drain an in-flight async save
        return state

    def evaluate(self, state: TrainState, dev_loader) -> float:
        """Mean deterministic loss over a dev loader."""
        if self._eval_fn is None:
            model = self.model
            static_kwargs = {
                k: (False if k == "train" else v) for k, v in self.static_kwargs.items()
            }

            preprocess = self.eval_preprocess_fn

            @jax.jit
            def eval_step(params, args):
                if preprocess is not None:
                    a = preprocess(*args, rng=jax.random.PRNGKey(0), train=False)
                else:
                    a = args
                loss, _ = model.apply(params, *a, deterministic=True, **static_kwargs)
                return loss

            self._eval_fn = eval_step
        total, n = 0.0, 0
        for batch in dev_loader:
            args = self._shard_batch(self.eval_batch_fn(batch))
            total += float(self._eval_fn(state.params, args))
            n += 1
        return total / max(n, 1)

    def _maybe_fault_inject(self):
        if not self._fault_step or self.global_step < self._fault_step:
            return
        if self._fault_marker:
            if os.path.exists(self._fault_marker):
                return  # already fired once — disarmed
            with open(self._fault_marker, "w") as f:
                f.write(str(self.global_step))
        raise RuntimeError(
            f"fault injection: crashing at global step {self.global_step} "
            "(OT_FAULT_INJECT_STEP)"
        )

    def _flush_pending(self, pending, epoch, span_t0, final=False):
        """Drain queued (still-on-device) per-update losses into meters/logs.

        Each pending entry covers one jitted dispatch — ``(losses, auxes,
        lrs, gsteps, progress, gnorms)`` with losses ``[n_updates, accum]``
        (or a flat list for a single update), auxes a matching dict / list of
        dicts, and gnorms ``[n_updates]`` — and stays ON DEVICE until here.
        The whole queue is fetched with ONE ``jax.device_get`` (its async
        copy pass pipelines every buffer into a single host sync). Slicing
        per-update device scalars out of the window arrays and ``float()``ing
        them one by one — the previous scheme — cost two transport round
        trips per update; at ~0.3-2 s dispatch/D2H latency on a tunneled TPU
        (CLAUDE.md) that dominated the real epoch time 3x over the math.
        Returns a fresh span start time."""
        span = time.time() - span_t0
        fetched = jax.device_get(pending)
        pending.clear()
        last = None
        for losses, auxes, lrs, gsteps, progress, gnorms in fetched:
            loss_mat = np.atleast_2d(np.asarray(losses, dtype=np.float64))
            n_updates = loss_mat.shape[0]
            if isinstance(auxes, dict):
                aux_rows = [
                    [{k: v[i, j] for k, v in auxes.items()}
                     for j in range(loss_mat.shape[1])]
                    for i in range(n_updates)
                ]
            else:  # single update: flat list of per-micro dicts
                aux_rows = [list(auxes)]
            gnorm_list = (list(np.ravel(np.asarray(gnorms, dtype=np.float64)))
                          if gnorms is not None else [None] * n_updates)
            for i in range(n_updates):
                step_avg = float(loss_mat[i].mean())
                self.mean_loss.update(step_avg)
                if self.visualizer is not None:
                    self.visualizer.add_scalar("train_loss", step_avg, gsteps[i])
                    self.visualizer.add_scalar("lr", float(lrs[i]), gsteps[i])
                    if gnorm_list[i] is not None:
                        self.visualizer.add_scalar(
                            "grad_norm", float(gnorm_list[i]), gsteps[i])
                last = (step_avg, aux_rows[i], float(lrs[i]), gsteps[i],
                        progress, gnorm_list[i])
        if last is not None and not final:
            step_avg, aux_row, lr, gstep, progress, gnorm = last
            aux_meter = AuxiliaryLossAverageMeter()
            for aux in aux_row:
                aux_meter.update({k: float(v) for k, v in aux.items()}, 1)
            # pre-clip global grad norm + cumulative NaN-skip count: the
            # collapse/instability telltales (VERDICT r3 weak #1) — fetched
            # only at log boundaries, so no extra host syncs per step
            gn = f", GNorm:{float(gnorm):.3f}" if gnorm is not None else ""
            skips = int(self._last_nan_skips) if self._last_nan_skips is not None else 0
            sk = f", NaNSkips:{skips}" if skips else ""
            logger.info(
                "-Training-Epoch-%d(%.5f%%), Global Step:%d, lr:%.8f, Loss:%.5f, "
                "AvgLoss: %.5f, Run Time:%.3f%s%s%s",
                epoch, float(progress), gstep, lr, step_avg,
                self.mean_loss.mean(), span, aux_meter.avg_infos, gn, sk,
            )
        return time.time()

    def _train_one_epoch_multi(self, epoch: int, state: TrainState, train_loader, rng) -> TrainState:
        """steps_per_exec > 1: batches of identical shape run as ONE jitted
        N-step scan (`_build_multi_fn`); shape-change/tail leftovers take the
        single-step path. Step semantics (loss, meters, global_step, NaN
        guard) match the single-step loop exactly."""
        from jax.sharding import NamedSharding, PartitionSpec

        if self._grad_fn is None:
            self._grad_fn = self._build_grad_fn()
            self._update_fn = self._build_update_fn()
        if self._multi_fn is None:
            self._multi_fn = self._build_multi_fn()
        n_exec = self.steps_per_exec
        accum = self.accum_steps
        group_size = n_exec * accum  # micro-batches per jitted program
        mesh = self.mesh
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        multihost = jax.process_count() > 1
        params, opt_state, nan_skips = state.params, state.opt_state, state.nan_skips
        batches = list(train_loader) if not hasattr(train_loader, "__len__") else train_loader
        n_batches = len(batches)
        span_t0 = time.time()
        pending: list = []

        def stack_group(group):
            # group_size identical-shape micro-batches -> leaves [N, A, B, ...].
            # Stack on HOST (loader batches arrive as numpy): a jnp.stack
            # here would put the group on device only for the multihost
            # branch to pull it straight back with np.asarray.
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *group)
            stacked = jax.tree_util.tree_map(
                lambda x: x.reshape((n_exec, accum) + x.shape[1:]), stacked
            )
            if mesh is not None:
                if multihost:
                    # each host stacked its row-slices (FeatureLoader
                    # num_shards); assemble the global [N, A, B_global, ...]
                    def put(x):
                        spec = PartitionSpec(None, None, "data", *(None,) * (x.ndim - 3))
                        gshape = x.shape[:2] + (x.shape[2] * jax.process_count(),) + x.shape[3:]
                        return jax.make_array_from_process_local_data(
                            NamedSharding(mesh, spec), x, gshape
                        )
                else:
                    def put(x):
                        spec = (PartitionSpec(None, None, "data", *(None,) * (x.ndim - 3))
                                if x.shape[2] % n_data == 0 else PartitionSpec())
                        return jax.device_put(x, NamedSharding(mesh, spec))
                stacked = jax.tree_util.tree_map(put, stacked)
            return stacked

        # accumulation carry shared by the scanned and single-step paths so
        # windows span shape changes exactly like the single-step loop (an
        # early flush would mint extra updates with 1/accum-weighted grads)
        carry_gacc = None
        carry_micro = 0
        carry_losses: list = []
        carry_aux: list = []

        def emit_updates(losses, auxes, lrs, last_step, gs0, gnorms=None):
            # losses/auxes/gnorms stay UNSLICED device arrays (or host lists
            # for the single-step path): slicing per-update scalars out of a
            # window array dispatches one tiny device program per update and
            # float()ing them later costs another round trip each — on a
            # tunneled TPU those round trips, not the math, dominated epoch
            # time. _flush_pending batch-fetches the whole queue in one go.
            nonlocal span_t0
            progress = min(last_step + 1, n_batches) / max(n_batches, 1) * 100
            gsteps = []
            for _ in range(len(lrs)):
                self.global_step += 1
                gsteps.append(self.global_step)
            pending.append((losses, auxes, lrs, gsteps, progress, gnorms))
            if gs0 // self.log_interval != self.global_step // self.log_interval:
                span_t0 = self._flush_pending(pending, epoch, span_t0)
            self._maybe_fault_inject()

        def run_scan_group(group, last_step):
            # exactly n_exec complete accumulation windows, carry empty
            nonlocal params, opt_state, nan_skips, rng
            lrs = [self.schedule(self.global_step + i, self.global_epoch)
                   for i in range(n_exec)]
            rng, r = jax.random.split(rng)
            keys = jax.random.split(r, n_exec)
            gs0 = self.global_step
            params, opt_state, nan_skips, losses, auxes, gnorms = self._multi_fn(
                params, opt_state, nan_skips, stack_group(group),
                jnp.asarray(lrs, jnp.float32), keys, self.preprocess_state,
            )
            self._last_nan_skips = nan_skips
            # losses [N, A]; aux leaves [N, A]; gnorms [N] — queued whole,
            # one pending entry per dispatch (same meter/log semantics as the
            # single-step loop's accumulation flush, expanded at flush time)
            emit_updates(losses, auxes, lrs, last_step, gs0, gnorms=gnorms)

        def run_single(args, last_step, flush_partial=False):
            # one micro-batch through the single-step cores, updating when
            # the window fills (or at epoch end with flush_partial)
            nonlocal params, opt_state, nan_skips, rng
            nonlocal carry_gacc, carry_micro, carry_losses, carry_aux
            if args is not None:
                if carry_gacc is None:
                    carry_gacc = self._zeros_like_grads(params)
                rng, k1 = jax.random.split(rng)
                args = self._shard_batch(args)
                params, carry_gacc, loss, aux = self._grad_fn(
                    params, carry_gacc, args, k1, self.preprocess_state)
                carry_losses.append(loss)
                carry_aux.append(aux)
                carry_micro += 1
            if carry_micro > 0 and (carry_micro == accum or flush_partial):
                lr = self.schedule(self.global_step, self.global_epoch)
                gs0 = self.global_step
                rng, k2 = jax.random.split(rng)
                params, opt_state, nan_skips, gnorm = self._update_fn(
                    params, opt_state, carry_gacc, nan_skips, lr, k2
                )
                self._last_nan_skips = nan_skips
                emit_updates(carry_losses, carry_aux, [lr], last_step, gs0,
                             gnorms=[gnorm])
                carry_losses, carry_aux = [], []
                carry_gacc = None
                carry_micro = 0

        def drain(group, last_step):
            for args in group:
                run_single(args, last_step)

        group: list = []
        gsig = None
        for step, batch in enumerate(batches):
            _, inputs, targets = batch
            args = self.batch_fn((None, inputs, targets))
            sig = tuple((a.shape, str(a.dtype)) for a in jax.tree_util.tree_leaves(args))
            if sig != gsig and group:
                drain(group, step - 1)  # shape change: keep accumulating
                group = []
            gsig = sig
            if carry_micro > 0:
                # finish the in-flight window before grouping for the scan
                run_single(args, step)
            else:
                group.append(args)
                if len(group) == group_size:
                    run_scan_group(group, step)
                    group = []
            if self.is_debug and step > 30:
                break
        drain(group, n_batches - 1)
        run_single(None, n_batches - 1, flush_partial=True)  # epoch-end window
        self._flush_pending(pending, epoch, span_t0, final=True)
        return TrainState(params=params, opt_state=opt_state, nan_skips=nan_skips)

    def train_one_epoch(self, epoch: int, state: TrainState, train_loader, rng) -> TrainState:
        if self.steps_per_exec > 1:
            return self._train_one_epoch_multi(epoch, state, train_loader, rng)
        if self._grad_fn is None:
            self._grad_fn = self._build_grad_fn()
            self._update_fn = self._build_update_fn()
        grad_accum = self._zeros_like_grads(state.params)
        micro = 0
        span_t0 = time.time()
        params, opt_state, nan_skips = state.params, state.opt_state, state.nan_skips
        batches = list(train_loader) if not hasattr(train_loader, "__len__") else train_loader
        n_batches = len(batches)

        # losses stay device arrays until a log boundary — fetching a scalar
        # per micro-batch would force a host sync every step and serialize
        # dispatch (the whole point of the two-compiled-fn design).
        micro_losses: list = []
        micro_aux: list = []
        pending: list = []  # (losses, auxes, [lr], [gstep], progress, [gnorm])

        def flush(final: bool = False):
            return self._flush_pending(pending, epoch, span_t0, final)

        for step, batch in enumerate(batches):
            _, inputs, targets = batch
            args = self._shard_batch(self.batch_fn((None, inputs, targets)))
            skip = False
            if self.pp_schedule == "1f1b":
                # the 1F1B shard_map needs batch % (micro x dp) == 0; ragged
                # tail batches are dropped (drop_last semantics) — but an
                # already-accumulated window still flushes below
                div = int(self.pp_micro_batches or self.mesh.shape["pipe"])
                div *= self.mesh.shape.get("data", 1)
                if args[0].shape[0] % div != 0:
                    logger.warning(
                        "1f1b: dropping ragged batch of %d (not divisible "
                        "by micro x dp = %d)", args[0].shape[0], div)
                    skip = True
            if not skip:
                rng, r1 = jax.random.split(rng)
                params, grad_accum, loss, aux = self._grad_fn(
                    params, grad_accum, args, r1, self.preprocess_state)
                micro_losses.append(loss)
                micro_aux.append(aux)
                micro += 1

            if micro > 0 and (micro == self.accum_steps or step == n_batches - 1):
                lr = self.schedule(self.global_step, self.global_epoch)
                rng, r2 = jax.random.split(rng)
                params, opt_state, nan_skips, gnorm = self._update_fn(
                    params, opt_state, grad_accum, nan_skips, lr, r2
                )
                self._last_nan_skips = nan_skips
                self.global_step += 1
                progress = (step + 1) / max(n_batches, 1) * 100
                pending.append((micro_losses, micro_aux, [lr],
                                [self.global_step], progress, [gnorm]))
                micro_losses, micro_aux = [], []
                grad_accum = self._zeros_like_grads(params)
                micro = 0

                if self.global_step % self.log_interval == 0:
                    span_t0 = flush()
                self._maybe_fault_inject()

            if self.is_debug and step > 30:
                break

        flush(final=True)
        return TrainState(params=params, opt_state=opt_state, nan_skips=nan_skips)


def _put_global(tree, shardings):
    """Place a host-replicated pytree onto mesh shardings.

    Single-process: plain device_put. Multihost: device_put cannot target
    shardings spanning other processes, so each process materializes its
    addressable shards from its (identical, same-PRNG) host copy via
    ``make_array_from_callback`` — the standard global-array construction.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def default_speech_batch(batch):
    """(utt, inputs, targets) dicts → model.apply args for SpeechToText/CTC."""
    _, inputs, targets = batch
    return (
        jnp.asarray(inputs["inputs"]),
        jnp.asarray(inputs["mask"], bool),
        jnp.asarray(targets["targets"]),
        jnp.asarray(targets["targets_length"]),
    )


def wave_speech_batch(batch):
    """(utt, inputs, targets) with raw waveforms (extract_on_device mode)."""
    _, inputs, targets = batch
    return (
        jnp.asarray(inputs["waveforms"]),
        jnp.asarray(inputs["wave_lengths"]),
        jnp.asarray(targets["targets"]),
        jnp.asarray(targets["targets_length"]),
    )


def resident_speech_batch(batch):
    """(utt, inputs, targets) with HBM-resident features (data/resident.py):
    inputs carry only the [B] int32 corpus gather index."""
    _, inputs, targets = batch
    return (
        jnp.asarray(inputs["corpus_idx"]),
        jnp.asarray(targets["targets"]),
        jnp.asarray(targets["targets_length"]),
    )


def lm_batch(batch):
    """(utt, inputs, targets) → (src, tgt, tgt_length) for LM training."""
    _, inputs, targets = batch
    return (
        jnp.asarray(inputs["inputs"]),
        jnp.asarray(targets["targets"]),
        jnp.asarray(targets["targets_length"]),
    )
