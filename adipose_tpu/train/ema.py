"""Exponential moving average of parameters with best-snapshot semantics.

Behavioral spec: ``EMACallback`` (``train_adipose_unet_v3.py:410-505``):
  * after each epoch: ema ← decay·ema + (1−decay)·current (first epoch copies);
  * phase 1 uses decay 0.999 and never saves; phase 2 uses decay 0.995 and
    saves the EMA weights at the best monitored metric (else at train end).

TPU-native: the update is a jitted pytree op (runs on device, no host copies —
the reference's callback pulls all weights to host every epoch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _ema_update(ema_params, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


class EmaTracker:
    """Tracks EMA params and the best snapshot by a monitored metric."""

    def __init__(self, decay: float = 0.995, monitor_mode: str = "max"):
        self.decay = decay
        self.mode = monitor_mode
        self.ema_params = None
        self.best_metric = None
        self.best_snapshot = None

    def update(self, params, metric: float | None = None):
        if self.ema_params is None:
            # true copies: the caller's buffers may be donated by later steps
            self.ema_params = jax.tree.map(jnp.copy, params)
        else:
            self.ema_params = _ema_update(self.ema_params, params, self.decay)
        if metric is not None:
            better = self.best_metric is None or (
                metric > self.best_metric if self.mode == "max" else metric < self.best_metric
            )
            if better:
                self.best_metric = metric
                self.best_snapshot = self.ema_params
        return self.ema_params

    @property
    def snapshot(self):
        """Best EMA snapshot if one was recorded, else the current EMA
        (mirrors the reference's train-end fallback save, :471-480)."""
        return self.best_snapshot if self.best_snapshot is not None else self.ema_params
