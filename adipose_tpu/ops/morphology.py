"""Grayscale/binary morphology on device — min/max filtering via reduce_window.

The reference uses cv2 morphology in several places:
  * vertical-band background estimation with a tall rectangular kernel
    (``preprocess_small_MS_SIMs.py:217-246``),
  * rolling-ball / top-hat illumination correction (:293-327, :357-390),
  * mask cleanup: close + small-component removal
    (``Segmentation/build_dataset.py:1134-1194``),
  * boundary refinement open/close (``full_evaluation_enhanced.py:386-390``).

TPU-native design: erosion/dilation are windowed min/max — a perfect fit for
``lax.reduce_window``. Rectangular structuring elements are exact and O(1)-ish
(XLA decomposes separably). Disk/ellipse elements use the standard alternating
cross/square iteration, which converges to an octagon inscribed in the disk —
an approximation we document and test within tolerance; callers needing exact
cv2-disk behavior can run the host fallback in :mod:`adipose_tpu.wsi.hostops`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -jnp.inf


def _pad_k(img: jax.Array, ky: int, kx: int, value: float) -> jax.Array:
    """SAME-style pad for a ky×kx window (handles even kernels: cv2 anchors at
    k//2, so the high side gets k-1-k//2)."""
    ry_lo, rx_lo = ky // 2, kx // 2
    ry_hi, rx_hi = ky - 1 - ry_lo, kx - 1 - rx_lo
    return jnp.pad(
        img, ((ry_lo, ry_hi), (rx_lo, rx_hi)), mode="constant", constant_values=value
    )


def _pad_for(img: jax.Array, ry: int, rx: int, value: float) -> jax.Array:
    return jnp.pad(img, ((ry, ry), (rx, rx)), mode="constant", constant_values=value)


@partial(jax.jit, static_argnames=("ky", "kx"))
def erode_rect(img: jax.Array, ky: int, kx: int) -> jax.Array:
    """Grayscale erosion (windowed min) with a ky×kx rectangle, cv2 border
    semantics (replicate ≈ +inf pad for min is wrong; cv2 uses BORDER_CONSTANT
    with max value for erode) — we pad with +inf so borders take interior mins."""
    x = img.astype(jnp.float32)
    xp = _pad_k(x, ky, kx, jnp.inf)
    return -jax.lax.reduce_window(
        -xp, _NEG_INF, jax.lax.max, (ky, kx), (1, 1), "VALID"
    )


@partial(jax.jit, static_argnames=("ky", "kx"))
def dilate_rect(img: jax.Array, ky: int, kx: int) -> jax.Array:
    x = img.astype(jnp.float32)
    xp = _pad_k(x, ky, kx, -jnp.inf)
    return jax.lax.reduce_window(xp, _NEG_INF, jax.lax.max, (ky, kx), (1, 1), "VALID")


def open_rect(img: jax.Array, ky: int, kx: int) -> jax.Array:
    return dilate_rect(erode_rect(img, ky, kx), ky, kx)


def close_rect(img: jax.Array, ky: int, kx: int) -> jax.Array:
    return erode_rect(dilate_rect(img, ky, kx), ky, kx)


# ---- Octagonal (disk-approx) elements ---------------------------------------

import numpy as _np

_CROSS = _np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)
_SQUARE = _np.ones((3, 3), dtype=bool)


def _masked_extreme(img: jax.Array, mask: jnp.ndarray, is_min: bool) -> jax.Array:
    pad_val = jnp.inf if is_min else -jnp.inf
    xp = _pad_for(img.astype(jnp.float32), 1, 1, pad_val)
    shifts = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if mask[dy + 1, dx + 1]:
                shifts.append(xp[1 + dy : 1 + dy + img.shape[0], 1 + dx : 1 + dx + img.shape[1]])
    stack = jnp.stack(shifts)
    return jnp.min(stack, axis=0) if is_min else jnp.max(stack, axis=0)


@partial(jax.jit, static_argnames=("radius",))
def erode_disk(img: jax.Array, radius: int) -> jax.Array:
    """Disk-approximate erosion: alternate 3×3 cross and square erosions radius
    times (octagonal limit set)."""
    x = img.astype(jnp.float32)
    for i in range(radius):
        mask = _CROSS if i % 2 == 0 else _SQUARE
        x = _masked_extreme(x, mask, is_min=True)
    return x


@partial(jax.jit, static_argnames=("radius",))
def dilate_disk(img: jax.Array, radius: int) -> jax.Array:
    x = img.astype(jnp.float32)
    for i in range(radius):
        mask = _CROSS if i % 2 == 0 else _SQUARE
        x = _masked_extreme(x, mask, is_min=False)
    return x


def open_disk(img: jax.Array, radius: int) -> jax.Array:
    return dilate_disk(erode_disk(img, radius), radius)


def close_disk(img: jax.Array, radius: int) -> jax.Array:
    return erode_disk(dilate_disk(img, radius), radius)


# ---- Composite corrections --------------------------------------------------


@partial(jax.jit, static_argnames=("kernel_width", "kernel_height"))
def remove_banding_morphological(
    img: jax.Array, kernel_width: int = 1, kernel_height: int = 512
) -> jax.Array:
    """Background subtraction with a tall rectangle opening
    (``preprocess_small_MS_SIMs.py:217-246``)."""
    x = img.astype(jnp.float32)
    background = open_rect(x, kernel_height, kernel_width)
    corrected = x - background + jnp.mean(background)
    return jnp.clip(corrected, 0.0, 255.0)


@partial(jax.jit, static_argnames=("radius",))
def correct_illumination_rolling_ball(img: jax.Array, radius: int = 100) -> jax.Array:
    """Rolling-ball background subtraction (disk-opening approximation of
    ``preprocess_small_MS_SIMs.py:293-327``)."""
    x = img.astype(jnp.float32)
    background = open_disk(x, radius)
    corrected = x - background + jnp.mean(background)
    return jnp.clip(corrected, 0.0, 255.0)


@partial(jax.jit, static_argnames=("kernel_size",))
def correct_illumination_tophat(img: jax.Array, kernel_size: int = 301) -> jax.Array:
    """White top-hat boost (``preprocess_small_MS_SIMs.py:357-390``)."""
    if kernel_size % 2 == 0:
        kernel_size += 1
    radius = kernel_size // 2
    x = img.astype(jnp.float32)
    tophat = x - open_disk(x, radius)
    return jnp.clip(x + tophat * 0.5, 0.0, 255.0)
