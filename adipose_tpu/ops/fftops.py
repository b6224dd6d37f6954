"""FFT debanding + illumination/contrast field ops for ECM fluorescence channels.

Behavioral spec: ``pre-post-processing_tools/preprocess_small_MS_SIMs.py``:
  * ``remove_banding_fft`` (:145-214) — Gaussian notch pair at ±center_freq on
    the horizontal frequency axis (vertical banding ⇒ horizontal spectral lines),
    inverse FFT, optional blend with the original.
  * ``remove_banding_column_normalize`` (:249-290) — per-column standardization
    with optional global-statistics restoration.
  * ``correct_illumination_polynomial`` (:329-355) — heavy Gaussian-blur
    multiplicative flat-field correction.
  * ``sharpen_image`` (:434-459) — unsharp mask.

TPU-native: jnp.fft runs on device; Gaussian blur is a separable conv (two 1-D
convs — O(r) not O(r²)); everything jits and batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=("band_freq_range", "vertical_width", "smooth_sigma_scale"),
)
def remove_banding_fft(
    img: jax.Array,
    band_freq_range: tuple = (0.01, 0.05),
    vertical_width: int = 3,
    smooth_sigma_scale: float = 0.5,
    blend: float = 1.0,
) -> jax.Array:
    """FFT notch filter for vertical banding; input/output float32 in [0,255]
    (``preprocess_small_MS_SIMs.py:145-214``)."""
    x = img.astype(jnp.float32)
    rows, cols = x.shape
    f = jnp.fft.fftshift(jnp.fft.fft2(x))

    crow, ccol = rows // 2, cols // 2
    freq_low = max(min(band_freq_range[0], 0.5), 0.0)
    freq_high = max(min(band_freq_range[1], 0.5), freq_low + 1e-4)
    band_width = max(freq_high - freq_low, 1e-4)
    center_freq = (freq_low + freq_high) / 2.0

    y_idx = (jnp.arange(rows, dtype=jnp.float32) - crow) / rows
    x_idx = (jnp.arange(cols, dtype=jnp.float32) - ccol) / cols
    y_grid = y_idx[:, None]
    x_grid = x_idx[None, :]

    sigma_x = max(band_width * smooth_sigma_scale, band_width * 0.25)
    sigma_y = max((vertical_width / rows) * smooth_sigma_scale, 1.0 / rows)

    g_left = jnp.exp(-0.5 * (((x_grid + center_freq) / sigma_x) ** 2 + (y_grid / sigma_y) ** 2))
    g_right = jnp.exp(-0.5 * (((x_grid - center_freq) / sigma_x) ** 2 + (y_grid / sigma_y) ** 2))
    notch = jnp.clip(g_left + g_right, 0.0, 1.0)
    mask = jnp.clip(1.0 - notch, 0.0, 1.0)

    filtered = jnp.abs(jnp.fft.ifft2(jnp.fft.ifftshift(f * mask)))
    filtered = jnp.clip(filtered, 0.0, 255.0)
    return jnp.clip(x * (1.0 - blend) + filtered * blend, 0.0, 255.0)


@jax.jit
def remove_banding_column_normalize(img: jax.Array, preserve_global: bool = True) -> jax.Array:
    """Per-column standardization (``preprocess_small_MS_SIMs.py:249-290``)."""
    x = img.astype(jnp.float32)
    g_mean, g_std = jnp.mean(x), jnp.std(x)
    col_mean = jnp.mean(x, axis=0, keepdims=True)
    col_std = jnp.std(x, axis=0, keepdims=True) + 1e-10
    z = (x - col_mean) / col_std
    restored = z * g_std + g_mean
    lo, hi = jnp.min(z), jnp.max(z)
    scaled = (z - lo) / (hi - lo + 1e-10) * 255.0
    out = jnp.where(preserve_global, restored, scaled)
    return jnp.clip(out, 0.0, 255.0)


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur matching cv2.GaussianBlur(ksize=0) support
    (radius = round(4σ) for float inputs), reflect-101 padding."""
    if sigma <= 0:
        return img.astype(jnp.float32)
    radius = max(1, int(round(4.0 * sigma)))
    k = _gaussian_kernel1d(sigma, radius)
    x = img.astype(jnp.float32)
    pad = [(radius, radius), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    x = jax.lax.conv_general_dilated(
        xp[None, None], k[None, None, :, None], (1, 1), "VALID"
    )[0, 0]
    xp = jnp.pad(x, [(0, 0), (radius, radius)], mode="reflect")
    x = jax.lax.conv_general_dilated(
        xp[None, None], k[None, None, None, :], (1, 1), "VALID"
    )[0, 0]
    return x


@partial(jax.jit, static_argnames=("smoothing_sigma",))
def correct_illumination_polynomial(img: jax.Array, smoothing_sigma: float = 150.0) -> jax.Array:
    """Multiplicative flat-field via heavy Gaussian blur
    (``preprocess_small_MS_SIMs.py:329-355``)."""
    x = img.astype(jnp.float32)
    background = gaussian_blur(x, smoothing_sigma)
    corrected = x * (jnp.mean(background) / (background + 1.0))
    return jnp.clip(corrected, 0.0, 255.0)


@partial(jax.jit, static_argnames=("sigma",))
def sharpen_unsharp(img: jax.Array, sigma: float = 1.0, amount: float = 0.5) -> jax.Array:
    """Unsharp mask (``preprocess_small_MS_SIMs.py:434-459``)."""
    x = img.astype(jnp.float32)
    blurred = gaussian_blur(x, sigma)
    return jnp.clip(x + amount * (x - blurred), 0.0, 255.0)
