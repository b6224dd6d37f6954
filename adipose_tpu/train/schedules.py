"""Learning-rate schedules mirroring the reference's callbacks.

Behavioral spec:
  * ``CosineAnnealingWithWarmup`` (``train_adipose_unet_v3.py:368-407``):
    epoch-based; warmup is LINEAR FROM max_lr/warmup_epochs (not from 0):
    lr(e) = max_lr·(e+1)/warmup for e < warmup, then cosine from max_lr→min_lr.
  * ``CyclicLR`` (``src/utils/clr_callback.py:3-131``): iteration-based
    triangular / triangular2 / exp_range policies.
  * ``ReduceLROnPlateau`` (Keras, used at :1306-1315): factor 0.5, patience 5,
    max-mode on val dice — stateful, host-side.

All pure schedules are implemented as functions of the step/epoch so they can
live inside optax (device-side, no host sync); plateau reduction is inherently
reactive and stays a small host-side state machine.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def cosine_with_warmup(
    max_lr: float, min_lr: float, warmup_epochs: int, total_epochs: int
):
    """Epoch-indexed schedule function (reference :390-399 semantics)."""

    def schedule(epoch: int) -> float:
        if epoch < warmup_epochs:
            return (max_lr / warmup_epochs) * (epoch + 1)
        denom = max(total_epochs - warmup_epochs, 1)
        progress = (epoch - warmup_epochs) / denom
        return min_lr + 0.5 * (max_lr - min_lr) * (1 + math.cos(math.pi * progress))

    return schedule


def cyclic_lr(
    base_lr: float = 0.001,
    max_lr: float = 0.006,
    step_size: float = 2000.0,
    mode: str = "triangular",
    gamma: float = 1.0,
):
    """Iteration-indexed CLR (``clr_callback.py:66-131``).

    clr(i) = base + (max−base)·max(0, 1−|i/step − 2·cycle + 1|)·scale
    with scale 1 (triangular), 1/2^(cycle−1) (triangular2), γ^i (exp_range).
    """

    def schedule(iteration: int) -> float:
        cycle = math.floor(1 + iteration / (2 * step_size))
        x = abs(iteration / step_size - 2 * cycle + 1)
        if mode == "triangular":
            scale = 1.0
        elif mode == "triangular2":
            scale = 1.0 / (2.0 ** (cycle - 1))
        elif mode == "exp_range":
            scale = gamma**iteration
        else:
            raise ValueError(f"Unknown CLR mode: {mode}")
        return base_lr + (max_lr - base_lr) * max(0.0, 1.0 - x) * scale

    return schedule


@dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler (Keras semantics, max mode).

    Call ``update(metric)`` once per epoch; read ``.lr``.
    Keras waits ``patience`` epochs without improvement, then multiplies by
    ``factor`` (with ``min_delta=1e-4`` improvement threshold) and resets wait.
    """

    lr: float
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 1e-7
    min_delta: float = 1e-4
    mode: str = "max"
    best: float = field(default=None)
    wait: int = 0

    def update(self, metric: float) -> float:
        if self.best is None:
            self.best = metric
            return self.lr
        improved = (
            metric > self.best + self.min_delta
            if self.mode == "max"
            else metric < self.best - self.min_delta
        )
        if improved:
            self.best = metric
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.wait = 0
        return self.lr


@dataclass
class EarlyStopping:
    """Keras EarlyStopping (max mode, ``restore_best_weights`` handled by the
    trainer via checkpoints; patience 15 per reference :1279-1285)."""

    patience: int = 15
    min_delta: float = 0.0
    mode: str = "max"
    best: float = field(default=None)
    wait: int = 0
    stopped: bool = False
    best_epoch: int = -1

    def update(self, metric: float, epoch: int) -> bool:
        """Returns True when training should stop."""
        improved = self.best is None or (
            metric > self.best + self.min_delta
            if self.mode == "max"
            else metric < self.best - self.min_delta
        )
        if improved:
            self.best = metric
            self.best_epoch = epoch
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped
