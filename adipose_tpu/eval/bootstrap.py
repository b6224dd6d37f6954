"""Bootstrap confidence intervals over slides.

Behavioral spec: ``bootstrap_confidence_interval`` / ``safe_bootstrap_ci``
(``full_evaluation_enhanced.py:983-1018``): 10 000 resamples with replacement,
percentile CI at α=0.05, seed 42; NaN-safe wrapper.

TPU-native: all resamples are drawn and reduced in one vmapped device program —
the reference's Python list-comprehension loop is ~10⁴ sequential host calls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_bootstrap", "statistic"))
def _bootstrap_device(data: jax.Array, key, n_bootstrap: int, statistic: str):
    n = data.shape[0]
    idx = jax.random.randint(key, (n_bootstrap, n), 0, n)
    samples = data[idx]
    if statistic == "mean":
        stats = jnp.mean(samples, axis=1)
    elif statistic == "median":
        stats = jnp.median(samples, axis=1)
    else:
        raise ValueError(statistic)
    return stats


def bootstrap_confidence_interval(
    data,
    statistic: str = "mean",
    n_bootstrap: int = 10000,
    alpha: float = 0.05,
    seed: int = 42,
):
    """Returns (point_estimate, ci_lower, ci_upper)."""
    data = jnp.asarray(np.asarray(data, dtype=np.float32))
    stats = _bootstrap_device(data, jax.random.PRNGKey(seed), n_bootstrap, statistic)
    point = float(jnp.mean(data) if statistic == "mean" else jnp.median(data))
    lo, hi = np.percentile(np.asarray(stats), [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return point, float(lo), float(hi)


def safe_bootstrap_ci(data, statistic: str = "mean", **kw):
    """NaN/inf-safe variant (``full_evaluation_enhanced.py:1013-1018``)."""
    arr = np.asarray(data, dtype=np.float64)
    valid = arr[np.isfinite(arr)]
    if len(valid) == 0:
        return np.nan, (np.nan, np.nan)
    point, lo, hi = bootstrap_confidence_interval(valid, statistic, **kw)
    return point, (lo, hi)
