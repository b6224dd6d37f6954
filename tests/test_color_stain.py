"""Color conversion vs cv2's float LAB (same CIE formulas skimage uses);
Reinhard stain transfer behavior.

skimage isn't in this image; cv2.cvtColor on float32 input produces true
CIELAB (L in [0,100]) via the identical D65 standard, so it serves as the
independent oracle for the reference's rgb2lab/lab2rgb usage
(``src/utils/stain_normalization.py:27``).
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops import color, stain


def sk_rgb2lab(rgb):
    return cv2.cvtColor(rgb.astype(np.float32), cv2.COLOR_RGB2LAB).astype(np.float64)


def sk_lab2rgb(lab):
    return np.clip(
        cv2.cvtColor(lab.astype(np.float32), cv2.COLOR_LAB2RGB), 0, 1
    ).astype(np.float64)


def test_rgb2lab_matches_cv2(rng):
    rgb = rng.rand(32, 32, 3).astype(np.float32)
    got = np.asarray(color.rgb2lab(jnp.asarray(rgb)))
    want = sk_rgb2lab(rgb)
    # cv2's float LAB path is LUT-based and quantized to ~0.5 LAB-unit steps;
    # our analytic conversion is the exact CIE formula, so compare at the
    # oracle's own quantization tolerance.
    assert np.abs(got - want).max() < 0.7


def test_lab2rgb_matches_cv2(rng):
    rgb = rng.rand(16, 16, 3).astype(np.float32)
    lab = sk_rgb2lab(rgb)
    got = np.asarray(color.lab2rgb(jnp.asarray(lab.astype(np.float32))))
    want = sk_lab2rgb(lab)
    assert np.abs(got - want).max() < 5e-3


def test_roundtrip_identity(rng):
    rgb = rng.rand(16, 16, 3).astype(np.float32)
    back = np.asarray(color.lab2rgb(color.rgb2lab(jnp.asarray(rgb))))
    assert np.abs(back - rgb).max() < 1e-3


def test_reinhard_moves_stats_to_reference(rng):
    src = (rng.rand(64, 64, 3) * 0.5 + 0.25).astype(np.float32)
    ref_mean = jnp.asarray([62.5, 8.3, 14.7])
    ref_std = jnp.asarray([15.2, 12.1, 8.9])
    out = stain.reinhard_normalize(jnp.asarray(src), ref_mean, ref_std)
    out_mean, out_std = stain.compute_lab_stats(out)
    # After transfer (pre-clipping) LAB stats match the reference; clipping to
    # gamut perturbs slightly, so tolerances are loose.
    assert np.abs(np.asarray(out_mean) - np.asarray(ref_mean)).max() < 6.0
    got_std = np.asarray(out_std)
    assert np.all(got_std > 0.3 * np.asarray(ref_std))


def test_reinhard_matches_numpy_oracle(rng):
    """Exact oracle: skimage-based Reinhard as written in the reference
    (stain_normalization.py:94-146), modulo the LAB conversion tolerance."""
    src = (rng.rand(32, 32, 3)).astype(np.float32)
    ref_mean = np.array([62.5, 8.3, 14.7])
    ref_std = np.array([15.2, 12.1, 8.9])
    lab = sk_rgb2lab(src.astype(np.float64))
    sm = lab.reshape(-1, 3).mean(0)
    ss = lab.reshape(-1, 3).std(0)
    lab_n = (lab - sm) * (ref_std / ss) + ref_mean
    want = np.clip(sk_lab2rgb(lab_n), 0, 1)
    got = np.asarray(
        stain.reinhard_normalize(jnp.asarray(src), jnp.asarray(ref_mean, dtype=jnp.float32),
                                 jnp.asarray(ref_std, dtype=jnp.float32))
    )
    assert np.abs(got - want).max() < 2e-2


def test_normalize_image_uint8_roundtrip(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    out = np.asarray(stain.normalize_image(img))
    assert out.dtype == np.uint8
    assert out.shape == img.shape


def test_batch_matches_single(rng):
    batch = rng.rand(3, 16, 16, 3).astype(np.float32)
    ref_mean, ref_std = stain.DEFAULT_REFERENCE.as_arrays()
    got = np.asarray(stain.reinhard_normalize_batch(jnp.asarray(batch), ref_mean, ref_std))
    for i in range(3):
        single = np.asarray(stain.reinhard_normalize(jnp.asarray(batch[i]), ref_mean, ref_std))
        assert np.abs(got[i] - single).max() < 1e-5


def test_lab_stats_from_metadata(tmp_path):
    meta = tmp_path / "m.json"
    meta.write_text(
        '{"lab_statistics": {"L": {"mean": 1.0, "std": 2.0}, '
        '"A": {"mean": 3.0, "std": 4.0}, "B": {"mean": 5.0, "std": 6.0}}}'
    )
    s = stain.LabStats.from_metadata(meta)
    assert s.mean == (1.0, 3.0, 5.0)
    assert s.std == (2.0, 4.0, 6.0)
