"""Pallas TPU kernels for the tile-preprocessing hot path.

Why these kernels: every tile entering the models takes the same path —
uint8 load → per-tile statistics (QC, normalization) → normalized float —
and the reference computes each statistic as its own pass over the pixels
(numpy: ``.mean()``, ``.std()``, ``np.percentile`` sort, white-count,
``train_adipose_unet_v3.py:568-607`` / ``build_dataset.py:1253-1284``). At
1024² that's 4 MB per pass per tile. The kernels here read each tile from HBM
ONCE into VMEM and produce everything in that single residency:

  * :func:`fused_zscore_normalize` — mean, var, white-ratio AND the
    dataset-z-scored output in one pass (grid over the batch; one 1024²
    f32 tile block = 4 MB in + 4 MB out, well inside the ~16 MB VMEM/core).
    MEASURED A WASH vs plain jnp (scripts/bench_preprocess.py, 2026-08-19:
    7 152 vs 7 398 tiles/s at b64 with forced-download timing) — XLA already
    fuses the three reductions + z-score into one HBM pass. Kept as an
    exported alternative; NOT used by any production path. The percentile
    kernel below is the one that wins (4.6× vs the sort, BASELINE.md);
  * :func:`histogram_u8` — 256-bin histogram per tile, computed as a
    bins×lanes VPU comparison reduction (no scatter needed on TPU);
  * :func:`percentile_normalize_u8` — exact percentile stretch for uint8
    tiles via the histogram CDF (the reference's ``np.percentile`` is a
    ~1M-element sort per tile; for 8-bit data the histogram is exact and
    runs at VPU bandwidth).

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adipose_tpu.core.jitopts import infer_jit


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---- Fused z-score normalize + stats ---------------------------------------


def _fused_zscore_kernel(mean_ref, std_ref, in_ref, white_thresh_ref,
                         out_ref, stats_ref):
    # Mosaic has no direct u8→f32 cast; hop through i32.
    x = in_ref[:].astype(jnp.int32).astype(jnp.float32)
    n = x.size
    s = jnp.sum(x)
    s2 = jnp.sum(x * x)
    tile_mean = s / n
    tile_var = s2 / n - tile_mean * tile_mean
    white = jnp.sum((x >= white_thresh_ref[0]).astype(jnp.float32)) / n
    # stats block is a TPU-tileable (1, 8, 128) slab; lanes 0..2 of row 0
    # carry [mean, std, white_ratio], the caller slices them out.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    tile_std = jnp.sqrt(jnp.maximum(tile_var, 0.0))
    vals = jnp.where(
        lane == 0, tile_mean,
        jnp.where(lane == 1, tile_std, jnp.where(lane == 2, white, 0.0)),
    )
    stats_ref[:] = jnp.where(row == 0, vals, 0.0)
    out_ref[:] = (x - mean_ref[0]) / (std_ref[0] + 1e-10)


@functools.partial(infer_jit, static_argnames=("interpret",))
def fused_zscore_normalize(
    tiles: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    white_threshold: float = 235.0,
    interpret: bool | None = None,
):
    """One-pass per-tile stats + dataset z-score.

    Args:
      tiles: (B, H, W) uint8/float tile batch.
      mean, std: scalar dataset statistics (the values persisted in
        ``normalization_stats.json``).

    Returns:
      (normalized (B, H, W) float32, stats (B, 3) float32 [mean, std, white_ratio]).
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, w = tiles.shape
    grid = (b,)
    out_shape = (
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
    )
    kernel = pl.pallas_call(
        _fused_zscore_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )
    mean_s = jnp.asarray([mean], jnp.float32)
    std_s = jnp.asarray([std], jnp.float32)
    thresh_s = jnp.asarray([white_threshold], jnp.float32)
    normalized, stats_slab = kernel(mean_s, std_s, tiles, thresh_s)
    return normalized, stats_slab[:, 0, :3]


# ---- Histogram + exact uint8 percentile ------------------------------------


@jax.jit
def histogram_u8(tiles: jax.Array) -> jax.Array:
    """Per-tile 256-bin histogram of uint8-range values → (B, 256) float32.

    XLA formulation bounded to 32 bins per pass (the full 256×N broadcast
    overflows VMEM); the Pallas path below folds the histogram into the
    percentile kernel's SMEM scratch instead.
    """
    b = tiles.shape[0]
    x = tiles.astype(jnp.int32).reshape(b, -1)

    def chunk(bin_start):
        bins = bin_start + jnp.arange(32, dtype=jnp.int32)
        return jnp.sum(
            (x[:, None, :] == bins[None, :, None]).astype(jnp.float32), axis=2
        )

    chunks = jax.lax.map(chunk, jnp.arange(0, 256, 32, dtype=jnp.int32))
    return jnp.moveaxis(chunks, 0, 1).reshape(b, 256)


def _percentile_kernel(rank_lo_ref, frac_lo_ref, rank_hi_ref, frac_hi_ref,
                       in_ref, out_ref, hist_ref):
    """Histogram (SMEM scratch) → CDF percentiles → normalized tile, all in
    one VMEM residency of the input block."""
    x = in_ref[:].astype(jnp.int32)
    xf = x.astype(jnp.float32)

    def hist_body(bin_idx, carry):
        hist_ref[bin_idx] = jnp.sum((x == bin_idx).astype(jnp.float32))
        return carry

    jax.lax.fori_loop(0, 256, hist_body, 0)

    def cdf_body(bin_idx, carry):
        cum, vl_lo, vh_lo, vl_hi, vh_hi = carry
        cum = cum + hist_ref[bin_idx]
        # value at sorted index k = smallest v with cdf[v] > k
        # ⇒ v = Σ_b [cdf[b] ≤ k]
        vl_lo += (cum <= rank_lo_ref[0]).astype(jnp.float32)
        vh_lo += (cum <= rank_lo_ref[0] + 1.0).astype(jnp.float32)
        vl_hi += (cum <= rank_hi_ref[0]).astype(jnp.float32)
        vh_hi += (cum <= rank_hi_ref[0] + 1.0).astype(jnp.float32)
        return cum, vl_lo, vh_lo, vl_hi, vh_hi

    zero = jnp.float32(0.0)
    _, vl_lo, vh_lo, vl_hi, vh_hi = jax.lax.fori_loop(
        0, 256, cdf_body, (zero, zero, zero, zero, zero)
    )
    low = vl_lo + frac_lo_ref[0] * (vh_lo - vl_lo)
    high = vl_hi + frac_hi_ref[0] * (vh_hi - vl_hi)
    scale = jnp.maximum(high - low, 1e-3)
    out_ref[:] = jnp.clip((xf - low) / scale, 0.0, 1.0)


@functools.partial(infer_jit, static_argnames=("p_low", "p_high", "interpret"))
def percentile_normalize_u8(
    tiles: jax.Array,
    p_low: float = 1.0,
    p_high: float = 99.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact percentile stretch to [0,1] for uint8 tiles — one HBM pass.

    Matches ``normalize_image(method='percentile')``
    (``src/utils/data.py:413-416``, numpy 'linear' interpolation) without the
    per-tile sort: for 8-bit data the order statistic is exactly recoverable
    from a 256-bin CDF, which lives in SMEM scratch inside the kernel.
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, w = tiles.shape
    n = h * w
    rank_lo = p_low / 100.0 * (n - 1)
    rank_hi = p_high / 100.0 * (n - 1)
    kernel = pl.pallas_call(
        _percentile_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.SMEM((256,), jnp.float32)],
        interpret=interpret,
    )
    import math

    return kernel(
        jnp.asarray([math.floor(rank_lo)], jnp.float32),
        jnp.asarray([rank_lo - math.floor(rank_lo)], jnp.float32),
        jnp.asarray([math.floor(rank_hi)], jnp.float32),
        jnp.asarray([rank_hi - math.floor(rank_hi)], jnp.float32),
        tiles,
    )
