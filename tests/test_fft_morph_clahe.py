"""FFT deband, morphology, CLAHE tests vs numpy/cv2 oracles."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops import clahe, fftops, morphology


def banded_image(rng, h=128, w=128, period=16, amp=30.0):
    base = (rng.rand(h, w) * 50 + 100).astype(np.float32)
    cols = np.arange(w)
    banding = amp * np.sin(2 * np.pi * cols / period)
    return np.clip(base + banding[None, :], 0, 255).astype(np.float32)


class TestFFT:
    def test_deband_reduces_band_energy(self, rng):
        img = banded_image(rng, period=16)
        freq = 1.0 / 16
        out = np.asarray(
            fftops.remove_banding_fft(jnp.asarray(img), band_freq_range=(freq * 0.7, freq * 1.3))
        )
        def band_peak(x):
            # pure vertical banding lives at (row=crow, col=ccol±freq·w)
            f = np.abs(np.fft.fftshift(np.fft.fft2(x)))
            r, c = x.shape[0] // 2, x.shape[1] // 2
            col = c + int(round(freq * x.shape[1]))
            return f[r - 1 : r + 2, col - 1 : col + 2].max()
        assert band_peak(out) < 0.1 * band_peak(img)

    def test_deband_matches_numpy_oracle(self, rng):
        """Bit-level oracle of the reference mask construction
        (preprocess_small_MS_SIMs.py:165-213)."""
        img = banded_image(rng, h=64, w=64)
        rng_args = dict(band_freq_range=(0.05, 0.15), vertical_width=3,
                        smooth_sigma_scale=0.5, blend=1.0)
        got = np.asarray(fftops.remove_banding_fft(jnp.asarray(img), **rng_args))

        f_shift = np.fft.fftshift(np.fft.fft2(img))
        rows, cols = img.shape
        crow, ccol = rows // 2, cols // 2
        freq_low, freq_high = 0.05, 0.15
        band_width = freq_high - freq_low
        center_freq = (freq_low + freq_high) / 2
        y_idx = (np.arange(rows) - crow) / rows
        x_idx = (np.arange(cols) - ccol) / cols
        y_grid, x_grid = np.meshgrid(y_idx, x_idx, indexing="ij")
        sigma_x = max(band_width * 0.5, band_width * 0.25)
        sigma_y = max((3 / rows) * 0.5, 1.0 / rows)
        gl = np.exp(-0.5 * (((x_grid + center_freq) / sigma_x) ** 2 + (y_grid / sigma_y) ** 2))
        gr = np.exp(-0.5 * (((x_grid - center_freq) / sigma_x) ** 2 + (y_grid / sigma_y) ** 2))
        mask = np.clip(1 - np.clip(gl + gr, 0, 1), 0, 1)
        want = np.clip(np.abs(np.fft.ifft2(np.fft.ifftshift(f_shift * mask))), 0, 255)
        assert np.abs(got - want).max() < 0.1

    def test_column_normalize_kills_banding(self, rng):
        img = banded_image(rng)
        out = np.asarray(fftops.remove_banding_column_normalize(jnp.asarray(img)))
        col_means = out.mean(axis=0)
        assert col_means.std() < 1.0  # columns equalized
        assert out.mean() == pytest.approx(img.mean(), abs=2.0)  # global preserved

    def test_gaussian_blur_close_to_cv2(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        got = np.asarray(fftops.gaussian_blur(jnp.asarray(img), 2.0))
        want = cv2.GaussianBlur(img, (0, 0), 2.0)
        # interiors match; cv2 border handling differs slightly at edges
        assert np.abs(got[8:-8, 8:-8] - want[8:-8, 8:-8]).max() < 0.5

    def test_unsharp(self, rng):
        img = (rng.rand(64, 64) * 200).astype(np.float32)
        out = np.asarray(fftops.sharpen_unsharp(jnp.asarray(img), 1.0, 0.5))
        blurred = cv2.GaussianBlur(img, (0, 0), 1.0)
        want = np.clip(img + 0.5 * (img - blurred), 0, 255)
        assert np.abs(out[8:-8, 8:-8] - want[8:-8, 8:-8]).max() < 1.0


class TestMorphology:
    def test_erode_rect_matches_cv2(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        got = np.asarray(morphology.erode_rect(jnp.asarray(img), 5, 3))
        want = cv2.erode(img, np.ones((5, 3), np.uint8))
        assert np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4]).max() < 1e-4

    def test_dilate_rect_matches_cv2(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        got = np.asarray(morphology.dilate_rect(jnp.asarray(img), 3, 7))
        want = cv2.dilate(img, np.ones((3, 7), np.uint8))
        assert np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4]).max() < 1e-4

    def test_open_idempotent(self, rng):
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        o1 = np.asarray(morphology.open_rect(jnp.asarray(img), 3, 3))
        o2 = np.asarray(morphology.open_rect(jnp.asarray(o1), 3, 3))
        assert np.abs(o1 - o2).max() < 1e-4

    def test_banding_removal_morphological(self, rng):
        img = banded_image(rng, h=128, w=128)
        out = np.asarray(morphology.remove_banding_morphological(jnp.asarray(img), 1, 64))
        assert out.shape == img.shape
        assert np.isfinite(out).all()

    def test_disk_erosion_bounded_by_rect(self, rng):
        """Disk(r) ⊆ square(2r+1) ⇒ disk erosion ≥ square erosion."""
        img = (rng.rand(64, 64) * 255).astype(np.float32)
        disk = np.asarray(morphology.erode_disk(jnp.asarray(img), 3))
        square = np.asarray(morphology.erode_rect(jnp.asarray(img), 7, 7))
        assert np.all(disk >= square - 1e-4)
        assert np.all(disk <= img + 1e-4)


class TestCLAHE:
    def test_uniform_image_unchanged(self):
        img = jnp.full((128, 128), 100.0)
        out = np.asarray(clahe.clahe(img))
        assert np.abs(out - 100.0).max() < 3.0

    def test_improves_contrast_of_squeezed_histogram(self, rng):
        img = (rng.rand(128, 128) * 40 + 100).astype(np.float32)
        out = np.asarray(clahe.clahe(jnp.asarray(img), clip_limit=4.0))
        assert out.std() > img.std()  # contrast expanded

    def test_close_to_cv2_statistics(self, rng):
        img = (rng.rand(128, 128) * 120 + 60).astype(np.uint8)
        got = np.asarray(clahe.clahe(jnp.asarray(img.astype(np.float32)), 2.0, 8))
        want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img).astype(np.float32)
        # Same global statistics within a few gray levels
        assert abs(got.mean() - want.mean()) < 6.0
        assert abs(got.std() - want.std()) < 8.0
