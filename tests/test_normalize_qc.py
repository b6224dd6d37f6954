"""Normalization + QC tests vs numpy/cv2 oracles."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops import normalize, qc


class TestNormalize:
    def test_percentile_unit(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        got = np.asarray(normalize.percentile_unit(jnp.asarray(img)))
        plow, phigh = np.percentile(img, (1, 99))
        want = np.clip((img - plow) / max(phigh - plow, 1e-3), 0, 1)
        assert np.abs(got - want).max() < 1e-4

    def test_minmax(self, rng):
        img = rng.rand(32, 32).astype(np.float32) * 100
        got = np.asarray(normalize.minmax_unit(jnp.asarray(img)))
        want = (img - img.min()) / max(img.max() - img.min(), 1e-3)
        assert np.abs(got - want).max() < 1e-5

    def test_zscore_self(self, rng):
        img = rng.rand(32, 32).astype(np.float32) * 100
        got = np.asarray(normalize.zscore_self(jnp.asarray(img)))
        assert abs(got.mean()) < 1e-4
        assert got.std() == pytest.approx(1.0, abs=1e-3)

    def test_zscore_dataset(self, rng):
        img = rng.rand(32, 32).astype(np.float32) * 100
        got = np.asarray(normalize.zscore_dataset(jnp.asarray(img), 50.0, 10.0))
        want = (img - 50.0) / (10.0 + 1e-10)
        assert np.abs(got - want).max() < 1e-4

    def test_zscore_to_target(self, rng):
        img = (rng.rand(64, 64) * 200 + 20).astype(np.float32)
        got = np.asarray(normalize.zscore_to_target(jnp.asarray(img)))
        # target stats reached before clipping; most pixels unclipped here
        assert got.mean() == pytest.approx(200.99, abs=3.0)
        assert got.min() >= 0 and got.max() <= 255

    def test_zscore_to_target_constant_image(self):
        img = jnp.full((16, 16), 100.0)
        got = np.asarray(normalize.zscore_to_target(img))
        assert np.all(got == 100.0)  # zero-std passthrough (stain_normalization.py:368-371)

    def test_percentile_stretch_255(self, rng):
        img = (rng.rand(64, 64) * 200).astype(np.float32)
        got = np.asarray(normalize.percentile_stretch_255(jnp.asarray(img)))
        low, high = np.percentile(img, (1, 99))
        want = (np.clip(img, low, high) - low) / (high - low) * 255.0
        assert np.abs(got - want).max() < 1e-2

    def test_dispatcher_errors(self):
        with pytest.raises(ValueError):
            normalize.normalize_image(jnp.zeros((4, 4)), method="bogus")
        with pytest.raises(ValueError):
            normalize.normalize_image(jnp.zeros((4, 4)), method="zscore_dataset")


class TestQC:
    def test_white_tile_flagged_empty(self):
        tile = jnp.full((128, 128), 250.0)
        v = qc.classify_tile(tile)
        assert bool(v["is_empty"])
        assert not bool(v["is_good"])

    def test_textured_tile_good(self, rng):
        tile = jnp.asarray((rng.rand(128, 128) * 200).astype(np.float32))
        v = qc.classify_tile(tile)
        assert bool(v["is_good"])

    def test_flat_gray_tile_blurry(self):
        tile = jnp.full((128, 128), 100.0)
        v = qc.classify_tile(tile)
        assert bool(v["is_blurry"])  # zero Laplacian variance, not white

    def test_laplacian_matches_cv2(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        got = float(qc.laplacian_variance(jnp.asarray(img)))
        want = cv2.Laplacian(img, cv2.CV_32F).var()
        assert got == pytest.approx(want, rel=1e-3)

    def test_white_ratio_matches_numpy(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        got = float(qc.white_ratio(jnp.asarray(img)))
        want = np.mean(img >= 235.0)
        assert got == pytest.approx(want, abs=1e-6)

    def test_batch(self, rng):
        tiles = jnp.asarray(rng.rand(4, 64, 64).astype(np.float32) * 255)
        v = qc.classify_tiles_batch(tiles, 235.0, 0.70, 7.5)
        assert v["is_good"].shape == (4,)

    def test_white_ratio_rgb_all_channels(self, rng):
        # biased bright so a meaningful fraction trips the all-channel test
        img = (200 + rng.rand(64, 64, 3) * 55).astype(np.uint8)
        got = float(qc.white_ratio(jnp.asarray(img)))
        want = np.all(img >= 235, axis=2).mean()  # build_dataset.py:1264
        assert got == pytest.approx(want, abs=1e-6)

    def test_cv2_gray_bit_exact(self, rng):
        rgb = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        want = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
        got = np.asarray(qc._cv2_gray(jnp.asarray(rgb)))
        assert np.array_equal(got.astype(np.uint8), want)
        assert np.array_equal(got, want.astype(np.float32))

    def test_laplacian_rgb_matches_cv2_pipeline(self, rng):
        rgb = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        gray = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
        want = cv2.Laplacian(gray, cv2.CV_64F).var()  # build_dataset.py:1270
        got = float(qc.laplacian_variance(jnp.asarray(rgb)))
        assert got == pytest.approx(want, rel=1e-5)
