"""Modality comparison (Pseudocolored vs ECM) + ECM↔Pseudo rescaling.

Behavioral spec:
  * ``pre-post-processing_tools/compare_pseudocolored_ecm_tiles.py`` —
    MSE / SSIM / histogram correlation per tile pair (:81), stratified
    sampling (:266), side-by-side + diff-heatmap renders;
  * ``pre-post-processing_tools/ECM_scaling.py`` — resample ECM images to the
    Pseudocolored reference dimensions with selectable interpolation (:114).

SSIM is implemented in jnp (skimage is not in this env): the standard
Wang et al. windowed formulation with an 11×11 Gaussian (σ=1.5), matching
``skimage.metrics.structural_similarity(gaussian_weights=True)`` defaults.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

_INTERP = {
    "nearest": cv2.INTER_NEAREST,
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
    "lanczos": cv2.INTER_LANCZOS4,
}


def resample_image(img: np.ndarray, target_hw, method: str = "bilinear") -> np.ndarray:
    """(``ECM_scaling.py:114``)."""
    if method not in _INTERP:
        raise ValueError(f"unknown interpolation: {method}")
    h, w = int(target_hw[0]), int(target_hw[1])
    return cv2.resize(img, (w, h), interpolation=_INTERP[method])


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


@partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    """Windowed SSIM (mean over valid positions)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    w = _gaussian_window()[None, None]

    def filt(x):
        return jax.lax.conv_general_dilated(x[None, None], w, (1, 1), "VALID")[0, 0]

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = filt(a * a), filt(b * b), filt(a * b)
    va = mu_aa - mu_a**2
    vb = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return jnp.mean(s)


@jax.jit
def histogram_correlation(a: jax.Array, b: jax.Array, nbins: int = 256) -> jax.Array:
    """Pearson correlation of the two intensity histograms
    (cv2.compareHist HISTCMP_CORREL semantics)."""
    def hist(x):
        idx = jnp.clip(x.astype(jnp.int32), 0, nbins - 1).reshape(-1)
        return jax.ops.segment_sum(jnp.ones_like(idx, jnp.float32), idx, nbins)

    ha, hb = hist(a), hist(b)
    ha = ha - jnp.mean(ha)
    hb = hb - jnp.mean(hb)
    return jnp.sum(ha * hb) / jnp.maximum(
        jnp.sqrt(jnp.sum(ha**2) * jnp.sum(hb**2)), 1e-10
    )


def compute_metrics(img_a: np.ndarray, img_b: np.ndarray) -> dict:
    """Per-pair MSE/SSIM/hist-correlation (``compare_..._tiles.py:81``).
    Images are resampled to matching shape first when needed."""
    if img_a.shape != img_b.shape:
        img_b = resample_image(img_b, img_a.shape[:2])
    a = jnp.asarray(img_a).astype(jnp.float32)  # native-dtype upload
    b = jnp.asarray(img_b).astype(jnp.float32)
    return {
        "mse": float(jnp.mean((a - b) ** 2)),
        "ssim": float(ssim(a, b)),
        "histogram_correlation": float(histogram_correlation(a, b)),
    }


def stratified_sample(paths, n: int, seed: int = 865):
    """Evenly-strided deterministic sample (``compare_..._tiles.py:266``)."""
    paths = sorted(paths)
    if len(paths) <= n:
        return paths
    idx = np.linspace(0, len(paths) - 1, n).astype(int)
    return [paths[i] for i in idx]


def compare_directories(
    pseudo_dir: str | Path, ecm_dir: str | Path, output_dir: str | Path,
    n_samples: int = 50, n_perfect: int | None = None,
    n_mismatch: int | None = None, seed: int | None = None,
) -> list:
    """Paired-by-stem comparison with metrics CSV + diff heatmaps.

    ``n_perfect``/``n_mismatch`` sample separately from same-dimension pairs
    and dimension-mismatched pairs (``compare_pseudocolored_ecm_tiles.py:
    321-332``); without them, one stratified sample of ``n_samples``."""
    import pandas as pd

    pseudo_dir, ecm_dir = Path(pseudo_dir), Path(ecm_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    ecm_by_stem = {p.stem: p for p in ecm_dir.glob("*") if p.is_file()}
    pairs = [
        (p, ecm_by_stem[p.stem])
        for p in pseudo_dir.glob("*")
        if p.is_file() and p.stem in ecm_by_stem
    ]
    if n_perfect is not None or n_mismatch is not None:
        rng = np.random.RandomState(865 if seed is None else seed)
        perfect, mismatch = [], []
        for pp, ep in pairs:
            a, b = cv2.imread(str(pp)), cv2.imread(str(ep))
            if a is None or b is None:
                continue
            (perfect if a.shape[:2] == b.shape[:2] else mismatch).append((pp, ep))

        def pick(group, n):
            if n is None or len(group) <= n:
                return group
            idx = rng.choice(len(group), n, replace=False)
            return [group[i] for i in idx]

        pairs = pick(perfect, n_perfect) + pick(mismatch, n_mismatch)
    else:
        pairs = stratified_sample(pairs, n_samples)
    rows = []
    for pp, ep in pairs:
        a = cv2.imread(str(pp), cv2.IMREAD_GRAYSCALE)
        b = cv2.imread(str(ep), cv2.IMREAD_GRAYSCALE)
        if a is None or b is None:
            continue
        m = compute_metrics(a, b)
        rows.append({"tile": pp.stem, **m})
        if b.shape != a.shape:
            b = resample_image(b, a.shape[:2])
        diff = cv2.applyColorMap(
            cv2.convertScaleAbs(cv2.absdiff(a, b)), cv2.COLORMAP_JET
        )
        side = np.concatenate([cv2.cvtColor(a, cv2.COLOR_GRAY2BGR),
                               cv2.cvtColor(b, cv2.COLOR_GRAY2BGR), diff], axis=1)
        cv2.imwrite(str(output_dir / f"{pp.stem}_comparison.jpg"), side)
    pd.DataFrame(rows).to_csv(output_dir / "comparison_metrics.csv", index=False)
    return rows


def convert_tif_to_jpg(
    input_path: str | Path, output_path: str | Path, quality: int = 95,
    invert: bool = False,
) -> bool:
    """16-bit→8-bit min-max + grayscale→RGB JPEG
    (``convert_tif_to_jpg.py:118``); ``--invert`` flips intensities after the
    bit-depth conversion (:148)."""
    img = cv2.imread(str(input_path), cv2.IMREAD_UNCHANGED)
    if img is None:
        return False
    if img.dtype == np.uint16:
        from adipose_tpu.wsi.chunker import convert_16_to_8bit

        img = convert_16_to_8bit(img)
    if invert:
        img = 255 - img
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    return bool(cv2.imwrite(str(output_path), img, [cv2.IMWRITE_JPEG_QUALITY, quality]))
