"""sRGB ↔ CIELAB conversion in pure jnp (D65, 2° observer).

The reference leans on ``skimage.color.rgb2lab``/``lab2rgb`` for its Reinhard
stain transfer (``src/utils/stain_normalization.py:27,83,115,137``). Rebuilding
the conversion as jnp lets the entire stain-normalization step run fused on
device over whole tile batches instead of per-tile scikit-image calls — the
reference's own build profile shows per-tile Reinhard dominating dataset build
time (``Segmentation/build_dataset.py:1211-1250``).

Formulas are the standard CIE ones (identical to skimage's implementation):
sRGB gamma decode → linear RGB → XYZ (D65 matrix) → f(t) companding → L*a*b*.
Verified against skimage to ~1e-4 in tests/test_color.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sRGB D65 → XYZ (rows: X, Y, Z), IEC 61966-2-1
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)
_XYZ2RGB = jnp.linalg.inv(_RGB2XYZ)

# D65 reference white
_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)

_DELTA = 6.0 / 29.0
_DELTA3 = _DELTA**3
_KAPPA = 1.0 / (3.0 * _DELTA**2)


def srgb_to_linear(rgb: jax.Array) -> jax.Array:
    """Gamma-decode sRGB in [0,1] to linear light."""
    rgb = rgb.astype(jnp.float32)
    return jnp.where(
        rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4
    )


def linear_to_srgb(lin: jax.Array) -> jax.Array:
    lin = jnp.maximum(lin.astype(jnp.float32), 0.0)
    return jnp.where(
        lin <= 0.0031308, lin * 12.92, 1.055 * lin ** (1.0 / 2.4) - 0.055
    )


def _f(t: jax.Array) -> jax.Array:
    return jnp.where(t > _DELTA3, jnp.cbrt(t), _KAPPA * t + 4.0 / 29.0)


def _f_inv(ft: jax.Array) -> jax.Array:
    return jnp.where(ft > _DELTA, ft**3, (ft - 4.0 / 29.0) / _KAPPA)


def _apply_3x3(m: jnp.ndarray, v: jax.Array) -> jax.Array:
    """(..., 3) @ 3×3ᵀ as explicit elementwise FMAs.

    A (N, 3)×(3, 3) matmul is numerically degraded by default matmul precision
    (bf16 on TPU) and is MXU-hostile anyway; the expanded form runs exactly in
    f32 on the VPU and fuses with neighbors.
    """
    c0, c1, c2 = v[..., 0], v[..., 1], v[..., 2]
    out = [m[r, 0] * c0 + m[r, 1] * c1 + m[r, 2] * c2 for r in range(3)]
    return jnp.stack(out, axis=-1)


def rgb2lab(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1], shape (..., 3) → L*a*b* (L in [0,100])."""
    lin = srgb_to_linear(jnp.clip(rgb, 0.0, 1.0))
    xyz = _apply_3x3(_RGB2XYZ, lin)
    fxyz = _f(xyz / _WHITE)
    fx, fy, fz = fxyz[..., 0], fxyz[..., 1], fxyz[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab2rgb(lab: jax.Array) -> jax.Array:
    """L*a*b* → sRGB in [0,1] (clipped)."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = _f_inv(jnp.stack([fx, fy, fz], axis=-1)) * _WHITE
    lin = _apply_3x3(_XYZ2RGB, xyz)
    return jnp.clip(linear_to_srgb(lin), 0.0, 1.0)


@jax.jit
def rgb2gray(rgb: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma (cv2.COLOR_RGB2GRAY weights), shape (...,3) → (...)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.einsum("...c,c->...", rgb.astype(jnp.float32), w)
