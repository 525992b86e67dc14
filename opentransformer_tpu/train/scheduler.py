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
        # beyond-reference: `adam_m_dtype: bfloat16` stores the first moment
        # in bf16 (half the m buffer's HBM footprint and traffic; the update
        # math still runs in f32 — optax casts per step). The second moment
        # stays f32: its sqrt feeds the step size directly and bf16's 8
        # mantissa bits visibly perturb effective lr.
        m_dtype = opt_cfg.get("adam_m_dtype")
        chain.append(
            optax.scale_by_adam(
                b1=float(betas[0]), b2=float(betas[1]), eps=float(opt_cfg.get("eps", 1e-8)),
                mu_dtype=m_dtype,
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
        # self-referential power decay (otrans/train/scheduler.py:116-126).
        # Pure closed form of the recurrence so `-ct` resume reproduces the
        # exact lr trajectory: the trainer's global_step starts at 1 and the
        # k-th update applies the k-th decay (init_lr^(d^k)).
        init_lr = float(cfg["init_lr"])
        decay = float(cfg["decay_factor"])
        min_lr = float(cfg.get("min_lr", 1e-6))
        return lambda step, epoch: _power_decay_lr(init_lr, decay, min_lr, max(int(step), 0))

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
        # reference (otrans/train/scheduler.py:141-166): linear 0→peak over
        # warmup, hold to decay_start, then the same self-referential power
        # recurrence from peak. Pure in (step, epoch): k = step - decay_start
        # decay applications, resume-safe.
        warmup = float(cfg["warmup_steps"])
        decay_start = float(cfg["decay_start"])
        peak_lr = float(cfg["peak_lr"])
        final_lr = float(cfg["final_lr"])
        decay = float(cfg["decay_factor"])
        assert decay_start > warmup and decay < 1.0

        def sched(step, epoch):
            if step < warmup:
                return _linear(step, 0, warmup, 0.0, peak_lr)
            if step > decay_start:
                return _power_decay_lr(peak_lr, decay, final_lr, int(step - decay_start))
            return peak_lr

        return sched

    raise KeyError(f"unknown scheduler type: {sched_type!r}")


def _power_decay_lr(x0: float, d: float, m: float, k: int) -> float:
    """Closed form of k applications of ``x <- max(x ** d, m)`` from x0.

    The naive candidate after k unclamped applications is ``x0 ** (d**k)``,
    monotone in k (toward 1 for d < 1, away from 1 for d > 1). The clamp
    at m is a threshold event on that monotone sequence:

      * first application already clamped (x0**d < m): for a decreasing
        map (m**d <= m) the floor is absorbing; otherwise the sequence
        restarts purely from m.
      * clamp never reached by step k: pure powers.
      * decreasing sequence crossed below m at some j <= k: clamped to m
        there, and m is absorbing for a decreasing map.
    """
    if k <= 0:
        return x0
    if x0 ** d < m:
        if m ** d <= m:
            return m
        return m ** (d ** (k - 1))
    c = x0 ** (d ** k)
    return c if c >= m else m


SCHEDULER_TYPES = (
    "constant",
    "step-linear",
    "epoch-linear",
    "exp",
    "step-exp",
    "transformer",
    "linear-warmup-exp-decay",
)
