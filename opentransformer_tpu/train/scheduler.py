"""Optimizers and LR schedulers.

Capability parity with reference ``otrans/train/scheduler.py``: optimizers
{adam, sgd} (torch-Adam semantics: L2 weight decay folded into the gradient
*before* the moment updates, not AdamW) and the seven schedulers
{constant, step-linear, epoch-linear, exp, step-exp, transformer (Noam),
linear-warmup-exp-decay}.

Design: every scheduler is a pure host-side callable ``lr(step, epoch)``;
the trainer feeds the scalar into the jitted update step, so schedules stay
arbitrarily expressive without touching compiled code (the reference mutates
optimizer param groups the same way, ``scheduler.py:36-47``). Step counting
matches the reference: the Noam/stepwise schedules see ``global_step``
starting at 1 and stepped once per *optimizer update* (not per micro-batch),
``otrans/train/trainer.py:232``.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import optax

Schedule = Callable[[int, int], float]  # (global_step, global_epoch) -> lr


def build_optimizer(opt_cfg: Any, opt_type: str = "adam") -> optax.GradientTransformation:
    """Build the lr-agnostic part of the optimizer (lr is applied by the
    trainer from the scheduler each update)."""
    wd = float(opt_cfg.get("weight_decay", 0.0))
    if opt_type == "adam":
        betas = opt_cfg.get("betas", (0.9, 0.999))
        chain = []
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))  # torch-Adam L2-into-grad
        chain.append(
            optax.scale_by_adam(
                b1=float(betas[0]), b2=float(betas[1]), eps=float(opt_cfg.get("eps", 1e-8))
            )
        )
        return optax.chain(*chain)
    if opt_type == "sgd":
        chain = []
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        momentum = float(opt_cfg.get("momentum", 0.0))
        if momentum > 0:
            chain.append(optax.trace(decay=momentum, nesterov=bool(opt_cfg.get("nesterov", False))))
        return optax.chain(*chain) if chain else optax.identity()
    raise KeyError(f"unknown optimizer type: {opt_type!r}")


def _linear(i: float, start: float, end: float, start_lr: float, end_lr: float) -> float:
    if i < start:
        return start_lr
    if i > end:
        return end_lr
    return start_lr + (i - start) * (end_lr - start_lr) / (end - start)


def build_scheduler(sched_cfg: Any, sched_type: str = "transformer") -> Schedule:
    cfg = sched_cfg

    if sched_type == "constant":
        lr0 = float(cfg["lr"])
        return lambda step, epoch: lr0

    if sched_type == "step-linear":
        final_step = float(cfg["final_step"])
        start_lr, final_lr = float(cfg["start_lr"]), float(cfg["final_lr"])
        return lambda step, epoch: _linear(step, 0, final_step, start_lr, final_lr)

    if sched_type == "epoch-linear":
        final_epoch = float(cfg["final_epoch"])
        start_lr, final_lr = float(cfg["start_lr"]), float(cfg["final_lr"])
        return lambda step, epoch: _linear(epoch, 0, final_epoch, start_lr, final_lr)

    if sched_type == "exp":
        # reference quirk: exp() of a linearly interpolated value
        final_step = float(cfg["final_step"])
        start_lr, final_lr = float(cfg["start_lr"]), float(cfg["final_lr"])
        return lambda step, epoch: math.exp(_linear(step, 0, final_step, start_lr, final_lr))

    if sched_type == "step-exp":
        # reference semantics: lr <- max(lr ** decay_factor, min_lr), a
        # self-referential power decay; reproduce with captured state.
        state = {"lr": float(cfg["init_lr"])}
        decay = float(cfg["decay_factor"])
        min_lr = float(cfg.get("min_lr", 1e-6))

        def step_exp(step, epoch):
            state["lr"] = max(state["lr"] ** decay, min_lr)
            return state["lr"]

        return step_exp

    if sched_type == "transformer":
        # Noam: factor * d^-0.5 * min(step^-0.5, step * warmup^-1.5)
        d = float(cfg["model_size"])
        warmup = float(cfg["warmup_steps"])
        factor = float(cfg.get("factor", 1.0))

        def noam(step, epoch):
            s = max(step, 1)
            return factor * d ** -0.5 * min(s ** -0.5, s * warmup ** -1.5)

        return noam

    if sched_type == "linear-warmup-exp-decay":
        warmup = float(cfg["warmup_steps"])
        decay_start = float(cfg["decay_start"])
        peak_lr = float(cfg["peak_lr"])
        final_lr = float(cfg["final_lr"])
        decay = float(cfg["decay_factor"])
        assert decay_start > warmup and decay < 1.0
        state = {"lr": peak_lr}

        def sched(step, epoch):
            if step < warmup:
                lr = _linear(step, 0, warmup, 0.0, peak_lr)
            elif step > decay_start:
                lr = max(state["lr"] ** decay, final_lr)
            else:
                lr = peak_lr
            state["lr"] = lr
            return lr

        return sched

    raise KeyError(f"unknown scheduler type: {sched_type!r}")


SCHEDULER_TYPES = (
    "constant",
    "step-linear",
    "epoch-linear",
    "exp",
    "step-exp",
    "transformer",
    "linear-warmup-exp-decay",
)
