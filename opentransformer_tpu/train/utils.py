"""Training meters and logging helpers.

Parity with reference ``otrans/train/utils.py``: window-100 running mean
(`MeanLoss`), `AverageMeter`, auxiliary-loss meter, best-epoch `Summary`, and
an optional TensorBoard visualizer (kept import-guarded — the dependency is
optional).
"""

from __future__ import annotations

import collections
from typing import Any


class MeanLoss:
    """Running mean over the last `window` optimizer steps."""

    def __init__(self, window: int = 100):
        self.buf: collections.deque = collections.deque(maxlen=window)

    def update(self, v: float) -> None:
        self.buf.append(float(v))

    def mean(self) -> float:
        return sum(self.buf) / max(len(self.buf), 1)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class AuxiliaryLossAverageMeter:
    def __init__(self):
        self.meters: dict[str, AverageMeter] = {}

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def update(self, aux: dict[str, Any] | None, n: int = 1):
        if not aux:
            return
        for k, v in aux.items():
            self.meters.setdefault(k, AverageMeter()).update(float(v), n)

    @property
    def avg_infos(self) -> str:
        return "".join(f", {k}:{m.avg:.5f}" for k, m in self.meters.items())


class Summary:
    """Best-epoch tracker (lower is better)."""

    def __init__(self):
        self.best_epoch = -1
        self.best_value = float("inf")

    def update(self, epoch: int, value: float) -> bool:
        if value < self.best_value:
            self.best_value = value
            self.best_epoch = epoch
            return True
        return False


class Visualizer:
    """TensorBoard scalar writer; no-op if tensorboard isn't installed."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self.writer = SummaryWriter(logdir)
        except Exception:
            self.writer = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
