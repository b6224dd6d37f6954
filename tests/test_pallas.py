"""Pallas kernel tests (interpret mode on CPU) vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops.pallas.preprocess import (
    fused_zscore_normalize,
    histogram_u8,
    percentile_normalize_u8,
)


@pytest.fixture
def tiles(rng):
    return (rng.rand(3, 64, 64) * 255).astype(np.uint8)


def test_fused_zscore(tiles):
    out, stats = fused_zscore_normalize(jnp.asarray(tiles), 127.0, 50.0)
    out, stats = np.asarray(out), np.asarray(stats)
    f = tiles.astype(np.float64)
    want = (f - 127.0) / (50.0 + 1e-10)
    assert np.abs(out - want).max() < 1e-3
    for i in range(3):
        assert stats[i, 0] == pytest.approx(f[i].mean(), abs=1e-2)
        assert stats[i, 1] == pytest.approx(f[i].std(), abs=1e-2)
        assert stats[i, 2] == pytest.approx((f[i] >= 235).mean(), abs=1e-6)


def test_histogram_exact(tiles):
    hist = np.asarray(histogram_u8(jnp.asarray(tiles)))
    for i in range(3):
        want = np.bincount(tiles[i].ravel(), minlength=256)
        assert np.array_equal(hist[i].astype(int), want)


def test_percentile_normalize_matches_numpy(tiles):
    got = np.asarray(percentile_normalize_u8(jnp.asarray(tiles), 1.0, 99.0))
    for i in range(3):
        f = tiles[i].astype(np.float64)
        plow, phigh = np.percentile(f, (1.0, 99.0))
        want = np.clip((f - plow) / max(phigh - plow, 1e-3), 0, 1)
        assert np.abs(got[i] - want).max() < 1e-5


def test_percentile_constant_tile():
    flat = np.full((1, 32, 32), 100, np.uint8)
    got = np.asarray(percentile_normalize_u8(jnp.asarray(flat)))
    assert np.isfinite(got).all()
    assert np.all(got == 0.0)  # zero range ⇒ (x - low)/1e-3 = 0
