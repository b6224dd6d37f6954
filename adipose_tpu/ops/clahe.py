"""CLAHE (contrast-limited adaptive histogram equalization) in pure jnp.

The reference uses ``cv2.createCLAHE`` for illumination/contrast enhancement
(``preprocess_small_MS_SIMs.py:393-430``, chunker enhancement variants
``large_wsi_to_small_wsi_MS.py:182-298``). This is a device-side
implementation with cv2-compatible semantics: per-tile 256-bin histograms,
clip-limit redistribution, CDF mapping, and bilinear interpolation between the
four surrounding tile mappings.

Differences from cv2 (documented, tested at tolerance): cv2 pads the image so
tiles divide evenly and uses uniform residual redistribution with an iterative
pass; we use single-pass redistribution — visually and statistically
indistinguishable for the enhancement use-case here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("tile_grid", "nbins"))
def clahe(
    img: jax.Array,
    clip_limit: float = 2.0,
    tile_grid: int = 8,
    nbins: int = 256,
) -> jax.Array:
    """CLAHE on a uint8-range grayscale image; returns float32 in [0, 255].

    Requires H and W divisible by tile_grid (callers pad with reflect first;
    the WSI pipeline's tile sizes are powers of two so this holds).
    """
    x = img.astype(jnp.float32)
    h, w = x.shape
    th, tw = h // tile_grid, w // tile_grid
    npx = th * tw

    tiles = x.reshape(tile_grid, th, tile_grid, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tile_grid, tile_grid, npx)

    bins = jnp.clip(tiles.astype(jnp.int32), 0, nbins - 1)
    one_hot = jax.nn.one_hot(bins, nbins, dtype=jnp.float32)
    hist = jnp.sum(one_hot, axis=2)  # (G, G, nbins)

    # Clip-limit redistribution (cv2 scales clip by tile pixel count / nbins)
    clip = jnp.maximum(clip_limit * npx / nbins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / nbins

    cdf = jnp.cumsum(hist, axis=-1)
    # Map through scaled CDF → output intensity per (tile, bin)
    mapping = jnp.clip((cdf / npx) * (nbins - 1), 0.0, nbins - 1.0)  # (G, G, nbins)

    # Bilinear interpolation between the 4 surrounding tile mappings.
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    ty = (yy + 0.5) / th - 0.5  # tile-space coordinates of each pixel row
    tx = (xx + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ty), 0, tile_grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(tx), 0, tile_grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tile_grid - 1)
    x1 = jnp.clip(x0 + 1, 0, tile_grid - 1)
    wy = jnp.clip(ty - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(tx - x0, 0.0, 1.0)[None, :]

    pix_bins = jnp.clip(x.astype(jnp.int32), 0, nbins - 1)

    def lookup(tyi, txi):
        # mapping[tyi, txi] per pixel: gather per-pixel mapped value
        m = mapping[tyi][:, txi]  # (h, w, nbins) via fancy indexing per axis
        return jnp.take_along_axis(m, pix_bins[..., None], axis=-1)[..., 0]

    v00 = lookup(y0, x0)
    v01 = lookup(y0, x1)
    v10 = lookup(y1, x0)
    v11 = lookup(y1, x1)

    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return jnp.clip(out, 0.0, 255.0)
