"""Overlap-blended reconstruction of full images from tile predictions.

Behavioral spec: ``Segmentation/full_evaluation_enhanced.py:115-230``:
  * GaussianBlender — 2-D Gaussian weight map w(x,y)=exp(−d²/(2σ²)) with
    σ = sigma_factor·tile_size (default 0.25), normalized to max 1; tiles are
    weight-accumulated into an accumulator/weight-sum pair then divided.
  * LinearBlender — plain averaging (weight ≡ 1).

TPU-native: reconstruction is a scatter-add over a device-resident canvas.
Tiles arrive as one (N, T, T) batch plus an (N, 2) position array; the entire
blend is a single jit program using ``scatter-add`` (XLA lowers dynamic-slice
accumulation efficiently). For canvases beyond HBM, callers stripe the canvas
(see :mod:`adipose_tpu.wsi.reconstruct`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_weight_map(tile_size: int, sigma_factor: float = 0.25) -> jnp.ndarray:
    """Gaussian tile-center weight map, peak-normalized to 1
    (``full_evaluation_enhanced.py:133-148``)."""
    center = tile_size / 2.0
    coords = jnp.arange(tile_size, dtype=jnp.float32)
    y = coords[:, None]
    x = coords[None, :]
    sigma = tile_size * sigma_factor
    dist_sq = (x - center) ** 2 + (y - center) ** 2
    weights = jnp.exp(-dist_sq / (2.0 * sigma**2))
    return weights / jnp.max(weights)


def _scatter_add(canvas: jax.Array, patches: jax.Array,
                 positions: jax.Array) -> jax.Array:
    """fori scatter-add of (N, T, T) patches into a canvas at (y, x) corners."""
    n, t, _ = patches.shape

    def body(i, cv):
        y = positions[i, 0]
        x = positions[i, 1]
        cur = jax.lax.dynamic_slice(cv, (y, x), (t, t))
        return jax.lax.dynamic_update_slice(cv, cur + patches[i], (y, x))

    return jax.lax.fori_loop(0, n, body, canvas)


@partial(jax.jit, donate_argnums=(0,))
def accumulate_predictions(acc: jax.Array, tiles: jax.Array,
                           positions: jax.Array, weight_map: jax.Array,
                           valid: jax.Array) -> jax.Array:
    """Add ``valid``-masked weighted tiles into the accumulator canvas.

    Device-resident incremental half of :func:`blend_tiles`, so callers (the
    WSI pipeline) can blend chunk-by-chunk without round-tripping N full
    (T, T) f32 prediction maps through the host. ``valid`` zeroes out the
    pad entries that batch-alignment appends.
    """
    w = tiles.astype(jnp.float32) * weight_map[None] * valid[:, None, None]
    return _scatter_add(acc, w, positions)


@partial(jax.jit, donate_argnums=(0,))
def accumulate_weights(wsum: jax.Array, positions: jax.Array,
                       weight_map: jax.Array, valid: jax.Array) -> jax.Array:
    """Add the weight map at each valid position (denominator canvas)."""
    w = weight_map[None] * valid[:, None, None]  # already (n, t, t)
    return _scatter_add(wsum, w, positions)


@jax.jit
def finalize_blend(acc: jax.Array, wsum: jax.Array) -> jax.Array:
    return acc / jnp.maximum(wsum, 1e-8)


@jax.jit
def finalize_blend_u8(acc: jax.Array, wsum: jax.Array) -> jax.Array:
    """Finalize + quantize to the u8 PNG encoding on device.

    Matches the artifact arithmetic ``(np.clip(p, 0, 1) * 255).astype(uint8)``
    (truncating cast, as the reference's ``prediction * 255`` saves —
    ``full_evaluation_enhanced.py:1060-1066``) so the downloaded bytes ARE the
    probability PNG payload: a 4096² map moves 16.8 MB instead of 33.5 (f16)
    or 67 (f32) through the host link.
    """
    p = acc / jnp.maximum(wsum, 1e-8)
    return (jnp.clip(p, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("height", "out_dtype"))
def finalize_blend_stripe(acc: jax.Array, wsum: jax.Array, y_start,
                          height: int, out_dtype: str = "uint8") -> jax.Array:
    """Finalize one canvas row-stripe ``[y_start, y_start + height)``.

    Same arithmetic as :func:`finalize_blend` / :func:`finalize_blend_u8`
    restricted to a row band. ``y_start`` is traced (all equal-height stripes
    share one compiled program); ``height`` is static. The WSI pipeline uses
    this to finalize — and start downloading — canvas stripes whose
    contributing tile rows are already segmented, overlapping the
    device->host transfer with the remaining segmentation compute
    (tiles never reach a stripe from a later tile row: row r+1 starts at or
    below the stripe boundary, the same invariant as
    ``wsi/reconstruct.py`` striped blending).
    """
    a = jax.lax.dynamic_slice_in_dim(acc, y_start, height, axis=0)
    w = jax.lax.dynamic_slice_in_dim(wsum, y_start, height, axis=0)
    p = a / jnp.maximum(w, 1e-8)
    if out_dtype == "uint8":
        return (jnp.clip(p, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return p.astype(jnp.dtype(out_dtype))


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def blend_tiles(
    tiles: jax.Array,
    positions: jax.Array,
    weight_map: jax.Array,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Weighted scatter-add blend of N tiles into an (out_h, out_w) canvas.

    Args:
      tiles: (N, T, T) predictions in [0,1] (or any float field).
      positions: (N, 2) int32 (y, x) top-left corners.
      weight_map: (T, T) blending weights (ones ⇒ LinearBlender semantics).

    Equivalent to ``GaussianBlender.reconstruct`` (:150-183): accumulate
    tile·w and w, then divide with a 1e-8 floor.
    """
    tiles = tiles.astype(jnp.float32)
    n, t, _ = tiles.shape
    acc = _scatter_add(jnp.zeros((out_h, out_w), jnp.float32),
                       tiles * weight_map[None], positions)
    wsum = _scatter_add(jnp.zeros((out_h, out_w), jnp.float32),
                        jnp.broadcast_to(weight_map[None], (n, t, t)),
                        positions)
    return acc / jnp.maximum(wsum, 1e-8)


def blend_tiles_gaussian(
    tiles, positions, out_shape, sigma_factor: float = 0.25
) -> jax.Array:
    """GaussianBlender-equivalent convenience wrapper."""
    t = int(np.asarray(tiles).shape[-1])
    wm = gaussian_weight_map(t, sigma_factor)
    return blend_tiles(
        jnp.asarray(tiles), jnp.asarray(positions, jnp.int32), wm,
        int(out_shape[0]), int(out_shape[1]),
    )


def blend_tiles_linear(tiles, positions, out_shape) -> jax.Array:
    """LinearBlender-equivalent (uniform weights ⇒ simple averaging,
    ``full_evaluation_enhanced.py:186-205``)."""
    t = int(np.asarray(tiles).shape[-1])
    wm = jnp.ones((t, t), jnp.float32)
    return blend_tiles(
        jnp.asarray(tiles), jnp.asarray(positions, jnp.int32), wm,
        int(out_shape[0]), int(out_shape[1]),
    )


def sliding_window_positions(
    image_shape, tile_size: int = 1024, overlap: float = 0.5
) -> np.ndarray:
    """Sliding-window tile origins, clamped to bounds, overlap ≤ 0.75
    (``SlidingWindowInference.extract_tile_positions``,
    ``full_evaluation_enhanced.py:240-273``)."""
    import math

    overlap = max(0.0, min(overlap, 0.75))
    stride = int(tile_size * (1 - overlap))
    h, w = int(image_shape[0]), int(image_shape[1])
    y_steps = max(1, math.ceil((h - tile_size) / stride) + 1)
    x_steps = max(1, math.ceil((w - tile_size) / stride) + 1)
    positions = []
    for yi in range(y_steps):
        for xi in range(x_steps):
            y = min(yi * stride, h - tile_size)
            x = min(xi * stride, w - tile_size)
            if y >= 0 and x >= 0 and y + tile_size <= h and x + tile_size <= w:
                positions.append((y, x))
    # reshape(-1, 2): an image smaller than the tile yields zero positions,
    # which must still index as an empty (0, 2) array, not shape (0,)
    return np.asarray(positions, dtype=np.int32).reshape(-1, 2)


@partial(jax.jit, static_argnames=("tile_size",))
def extract_tiles(image: jax.Array, positions: jax.Array, tile_size: int) -> jax.Array:
    """Gather (N, T, T) tiles from a device-resident image at given origins —
    the device-side counterpart of ``extract_tiles`` (:275-291)."""

    def one(pos):
        return jax.lax.dynamic_slice(image, (pos[0], pos[1]), (tile_size, tile_size))

    return jax.vmap(one)(positions.astype(jnp.int32))
