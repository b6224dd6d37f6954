"""Tile quality-control classifiers — white/empty and blur detection, batched.

Behavioral spec: ``Segmentation/build_dataset.py:1253-1284``
(``classify_tiles_batch``): a tile is *empty/white* when the fraction of pixels
whose channels are ALL ≥235 (``np.all(tile >= t, axis=2)``, :1264) exceeds
0.70; *blurry* when the variance of the 3×3 Laplacian of the cv2 grayscale
(weighted 0.299·R+0.587·G+0.114·B fixed-point, :1270) is below 7.5. The
classification-dataset builder applies the same gates to negatives only
(``Classification/build_class_dataset.py:560-572,692-702``).

TPU-native: both tests are elementwise + small-stencil ops, so a whole batch of
1024² tiles is classified in one fused jit program on device — the reference's
per-tile cv2 loop is one of its build-time hot spots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WHITE_THRESHOLD = 235.0
WHITE_RATIO = 0.70
BLUR_THRESHOLD = 7.5

@jax.jit
def white_ratio(tile: jax.Array, threshold: float = WHITE_THRESHOLD) -> jax.Array:
    """Fraction of near-white pixels. Accepts (H, W) grayscale or (H, W, 3) RGB.

    RGB: a pixel is white only when ALL channels are ≥ threshold
    (``np.all(tile >= white_threshold, axis=2)``, ``build_dataset.py:1264``).
    """
    t = tile.astype(jnp.float32)
    white = (t >= threshold) if t.ndim == 2 else jnp.all(t >= threshold, axis=-1)
    return jnp.mean(white.astype(jnp.float32))


def _cv2_gray(rgb: jax.Array) -> jax.Array:
    """cv2.cvtColor(BGR2GRAY) on RGB-ordered channels, bit-exact for u8-origin
    values: fixed-point ``(R·9798 + G·19235 + B·3735 + 16384) >> 15`` (OpenCV's
    CV_8U descale with yuv_shift=15; verified bit-exact vs cv2 5.0)."""
    i = jnp.round(rgb.astype(jnp.float32)).astype(jnp.int32)
    y = (i[..., 0] * 9798 + i[..., 1] * 19235 + i[..., 2] * 3735 + 16384) >> 15
    return y.astype(jnp.float32)


@jax.jit
def laplacian_variance(tile: jax.Array) -> jax.Array:
    """Variance of the 3×3 Laplacian response (cv2.Laplacian(...).var()).

    RGB tiles are first converted with cv2's weighted fixed-point grayscale
    (``build_dataset.py:1270`` converts BGR→gray before the Laplacian).
    cv2 uses BORDER_REFLECT_101 padding; we reproduce it via jnp.pad 'reflect'.
    """
    t = tile.astype(jnp.float32)
    if t.ndim == 3:
        t = _cv2_gray(t)
    # Shift-and-add stencil instead of a C_in=1 conv: under vmap
    # (classify_tiles_batch) XLA's conv layout assignment pushes the batch
    # dim into the 128-lane position ({0,2,1}, 16× padded) and the choice
    # infects the whole QC program — the same pathology measured for the
    # augmentation field blur (see data/augment.py:_blur_fixed).
    h, w = t.shape
    p = jnp.pad(t, 1, mode="reflect")
    resp = (p[0:h, 1:w + 1] + p[2:h + 2, 1:w + 1]
            + p[1:h + 1, 0:w] + p[1:h + 1, 2:w + 2]
            - 4.0 * t)
    return jnp.var(resp)


@jax.jit
def classify_tile(
    tile: jax.Array,
    white_threshold: float = WHITE_THRESHOLD,
    white_ratio_limit: float = WHITE_RATIO,
    blur_threshold: float = BLUR_THRESHOLD,
) -> dict:
    """QC verdict for one tile: empty (white), blurry, or good.

    Matches ``classify_tiles_batch`` (``build_dataset.py:1253-1284``): the white
    test runs first; the blur test only disqualifies non-empty tiles.
    """
    wr = white_ratio(tile, white_threshold)
    lv = laplacian_variance(tile)
    is_empty = wr > white_ratio_limit
    is_blurry = (~is_empty) & (lv < blur_threshold)
    return {
        "white_ratio": wr,
        "laplacian_var": lv,
        "is_empty": is_empty,
        "is_blurry": is_blurry,
        "is_good": ~(is_empty | is_blurry),
    }


classify_tiles_batch = jax.jit(jax.vmap(classify_tile, in_axes=(0, None, None, None)))
