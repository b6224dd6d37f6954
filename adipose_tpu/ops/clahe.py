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

#: Quality cutoffs published by the reference's contrast-grouping analysis
#: (``analysis/contrast_and_normalization_analysis/adaptive_clahe_function.py:18-26``).
#: ``contrast_group_census`` (data/analysis.py) re-derives dataset-specific
#: values in the same JSON shape.
DEFAULT_ADAPTIVE_CUTOFFS = {
    "contrast_ratio": {"poor_cutoff": 0.183, "good_cutoff": 0.267},
    "laplacian_variance": {"good_cutoff": 38.2},
}


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


def _clahe_any_shape(x: jax.Array, clip_limit: float, tile_grid: int) -> jax.Array:
    """CLAHE with reflect padding to the next grid multiple (cropped back)."""
    h, w = x.shape
    ph, pw = (-h) % tile_grid, (-w) % tile_grid
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    return clahe(x, clip_limit=clip_limit, tile_grid=tile_grid)[:h, :w]


def _percentile_unit(x: jax.Array, p_low: float, p_high: float) -> jax.Array:
    """``clip((x - p_lo) / (p_hi - p_lo + 1e-3), 0, 1)`` — the exact stretch the
    reference's adaptive function applies (``adaptive_clahe_function.py:23-24``,
    note the +1e-3 denominator guard, unlike the builder's percentile norm)."""
    lo, hi = jnp.percentile(x, jnp.array([p_low, p_high]))
    return jnp.clip((x - lo) / (hi - lo + 1e-3), 0.0, 1.0)


def adaptive_clahe_normalize(
    img,
    cutoffs: dict | None = None,
) -> tuple[jax.Array, str]:
    """Quality-adaptive CLAHE + percentile normalization → unit-range float.

    Behavioral spec: ``analysis/contrast_and_normalization_analysis/
    adaptive_clahe_function.py:5-38`` — route each grayscale image by measured
    quality:

    * ``contrast_ratio < poor_cutoff`` → aggressive CLAHE (clip 2.0, 8×8 grid)
      then 5–95 percentile stretch ("poor");
    * ``contrast_ratio > good_cutoff`` and sharpness above its good cutoff →
      2–98 percentile stretch only ("good");
    * otherwise → mild CLAHE (clip 1.5, 12×12 grid) then 5–95 stretch
      ("medium").

    The quality decision is two host scalars (mean/std ratio + Laplacian
    variance), so the branch stays in Python; each arm is a jitted device
    program. Returns ``(image_in_[0,1], strategy)`` where strategy is one of
    ``poor | good | medium``.
    """
    from adipose_tpu.ops.qc import laplacian_variance

    cuts = cutoffs or DEFAULT_ADAPTIVE_CUTOFFS
    x = jnp.asarray(img).astype(jnp.float32)
    mean = float(jnp.mean(x))
    std = float(jnp.std(x))
    contrast_ratio = std / (mean + 1e-6)
    # The reference is inconsistent here: its census measures sharpness on the
    # uint8-clipped image (analyze_contrast_groups.py:47-48) while its
    # generated function uses the raw float (adaptive_clahe_function.py:15).
    # We standardize on the census's uint8 so the routing matches the cutoffs'
    # derivation; for fractional-valued inputs near the good-cutoff this can
    # route differently than the reference's generated function.
    sharpness = float(laplacian_variance(jnp.clip(x, 0, 255).astype(jnp.uint8)))

    cr = cuts["contrast_ratio"]
    lap_good = cuts["laplacian_variance"]["good_cutoff"]
    if contrast_ratio < cr["poor_cutoff"]:
        out = _percentile_unit(_clahe_any_shape(x, 2.0, 8), 5.0, 95.0)
        return out, "poor"
    if contrast_ratio > cr["good_cutoff"] and sharpness > lap_good:
        return _percentile_unit(x, 2.0, 98.0), "good"
    out = _percentile_unit(_clahe_any_shape(x, 1.5, 12), 5.0, 95.0)
    return out, "medium"
