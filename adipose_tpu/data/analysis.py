"""Offline dataset analyses — tile-quality census + preprocessing comparison.

Behavioral spec: the ``pre-post-processing_tools/analysis/`` script family
(~4.5 kLoC of one-off reports — tile-quality census, CLAHE/percentile/
normalization comparisons, preprocessing-pipeline visualizer). Consolidated
here as two parameterized drivers:

  * :func:`tile_quality_census` — batched QC statistics over a tile directory
    (white ratio, Laplacian variance, intensity moments) with distribution
    summary + per-tile CSV — the 'tile census' report;
  * :func:`preprocessing_comparison` — applies a set of enhancement variants
    (none / zscore / percentile / CLAHE / deband) to sample tiles and tabulates
    quality metrics (sharpness, entropy, contrast) per variant — the
    'preprocessing comparison' reports.

All pixel math runs device-batched through the ops layer.
"""

from __future__ import annotations

import json
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np

from adipose_tpu.data.stain_select import shannon_entropy
from adipose_tpu.ops.clahe import clahe
from adipose_tpu.ops.fftops import remove_banding_fft
from adipose_tpu.ops.normalize import percentile_stretch_255, zscore_to_target
from adipose_tpu.ops.qc import classify_tiles_batch


def _tile_files(tiles_dir: Path):
    exts = (".jpg", ".jpeg", ".png", ".tif", ".tiff")
    return sorted(p for p in Path(tiles_dir).rglob("*") if p.suffix.lower() in exts)


def tile_quality_census(
    tiles_dir: str | Path,
    output_dir: str | Path,
    batch_size: int = 16,
    max_tiles: int | None = None,
) -> dict:
    """QC census over a tile directory → census.csv + census_summary.json."""
    import pandas as pd

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = _tile_files(Path(tiles_dir))
    if max_tiles:
        files = files[:max_tiles]
    rows = []
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        imgs = []
        for f in chunk:
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is not None:
                imgs.append((f, img))
        if not imgs:
            continue
        shapes = {im.shape for _, im in imgs}
        for shape in shapes:
            sel = [(f, im) for f, im in imgs if im.shape == shape]
            batch = jnp.asarray(np.stack([im for _, im in sel]).astype(np.float32))
            v = classify_tiles_batch(batch, 235.0, 0.70, 7.5)
            for j, (f, im) in enumerate(sel):
                rows.append({
                    "tile": f.name,
                    "white_ratio": float(v["white_ratio"][j]),
                    "laplacian_var": float(v["laplacian_var"][j]),
                    "is_empty": bool(v["is_empty"][j]),
                    "is_blurry": bool(v["is_blurry"][j]),
                    "is_good": bool(v["is_good"][j]),
                    "mean": float(im.mean()),
                    "std": float(im.std()),
                })
    df = pd.DataFrame(rows)
    df.to_csv(output_dir / "census.csv", index=False)
    summary = {
        "n_tiles": len(df),
        "n_good": int(df["is_good"].sum()) if len(df) else 0,
        "n_empty": int(df["is_empty"].sum()) if len(df) else 0,
        "n_blurry": int(df["is_blurry"].sum()) if len(df) else 0,
        "mean_intensity": float(df["mean"].mean()) if len(df) else None,
        "std_intensity": float(df["std"].mean()) if len(df) else None,
        "mean_laplacian_var": float(df["laplacian_var"].mean()) if len(df) else None,
    }
    (output_dir / "census_summary.json").write_text(json.dumps(summary, indent=2))
    return summary


VARIANTS = ("none", "zscore", "percentile", "clahe", "deband_fft")


def _apply_variant(img: np.ndarray, variant: str) -> np.ndarray:
    x = jnp.asarray(img.astype(np.float32))
    if variant == "none":
        out = x
    elif variant == "zscore":
        out = zscore_to_target(x)
    elif variant == "percentile":
        out = percentile_stretch_255(x)
    elif variant == "clahe":
        h, w = img.shape
        g = 8
        ph, pw = (-h) % g, (-w) % g
        if ph or pw:
            x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
        out = clahe(x)[:h, :w]
    elif variant == "deband_fft":
        out = remove_banding_fft(x)
    else:
        raise ValueError(variant)
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def preprocessing_comparison(
    tiles_dir: str | Path,
    output_dir: str | Path,
    variants: tuple = VARIANTS,
    n_samples: int = 10,
    save_images: bool = True,
) -> list:
    """Per-variant quality metrics over sample tiles → comparison CSV (+ side-
    by-side renders)."""
    import pandas as pd

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = _tile_files(Path(tiles_dir))
    step = max(1, len(files) // max(n_samples, 1))
    samples = files[::step][:n_samples]
    rows = []
    for f in samples:
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        panels = []
        for variant in variants:
            out = _apply_variant(img, variant)
            rows.append({
                "tile": f.name,
                "variant": variant,
                "sharpness": float(cv2.Laplacian(out, cv2.CV_64F).var()),
                "entropy": shannon_entropy(out),
                "contrast": float(out.std()),
                "mean": float(out.mean()),
            })
            panels.append(out)
        if save_images:
            strip = np.concatenate(panels, axis=1)
            cv2.imwrite(str(output_dir / f"{f.stem}_variants.jpg"), strip)
    df = pd.DataFrame(rows)
    df.to_csv(output_dir / "preprocessing_comparison.csv", index=False)
    pivot = df.groupby("variant")[["sharpness", "entropy", "contrast"]].mean()
    pivot.to_csv(output_dir / "preprocessing_summary.csv")
    return rows


def _component_shape_stats(binary: np.ndarray, min_area: int = 10) -> list[dict]:
    """Per-connected-component shape descriptors of a binary mask.

    cv2-native equivalent of skimage ``regionprops`` as used by the reference
    (``analysis/morphology parameter_analysis/analyze_training_data.py:91-117``):
    area, perimeter, circularity 4πA/P², major/minor ellipse axes →
    aspect ratio + eccentricity. Components below ``min_area`` px are skipped
    (reference skips area < 10, :106-108).
    """
    contours, _ = cv2.findContours(
        binary.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )
    cells = []
    for c in contours:
        area = float(cv2.contourArea(c))
        if area < min_area:
            continue
        perimeter = float(cv2.arcLength(c, closed=True))
        circularity = 4.0 * np.pi * area / (perimeter**2 + 1e-10)
        if len(c) >= 5:
            (_, _), (d1, d2), _ = cv2.fitEllipse(c)
            major, minor = max(d1, d2), min(d1, d2)
        else:
            (_, _), (d1, d2), _ = cv2.minAreaRect(c)
            major, minor = max(d1, d2), min(d1, d2)
        aspect = major / (minor + 1e-10)
        ecc = float(np.sqrt(max(0.0, 1.0 - (minor / (major + 1e-10)) ** 2)))
        cells.append({
            "area": area, "perimeter": perimeter, "circularity": circularity,
            "aspect_ratio": float(aspect), "eccentricity": ecc,
        })
    return cells


def _dist_stats(values: list[float], percentiles: bool = False) -> dict:
    if not values:
        base = {"min": 0.0, "max": 0.0, "mean": 0.0, "median": 0.0}
        if percentiles:
            base.update({"std": 0.0, "percentile_5": 0.0, "percentile_95": 0.0})
        return base
    a = np.asarray(values, np.float64)
    base = {
        "min": float(a.min()), "max": float(a.max()),
        "mean": float(a.mean()), "median": float(np.median(a)),
    }
    if percentiles:
        base.update({
            "std": float(a.std()),
            "percentile_5": float(np.percentile(a, 5)),
            "percentile_95": float(np.percentile(a, 95)),
        })
    return base


def morphology_census(
    masks_dir: str | Path,
    output_dir: str | Path,
    n_samples: int = 10,
    min_area: int = 10,
) -> dict:
    """Adipose-cell morphology census → optimized post-processing parameters.

    Behavioral spec: ``analysis/morphology parameter_analysis/
    analyze_training_data.py`` — samples N masks evenly, measures every cell's
    area/circularity/aspect-ratio/eccentricity distribution, then derives the
    reference's recommended post-processing envelope (:182-210): min/max cell
    size from the 5th/95th area percentiles with ×0.5/×1.5 buffers clamped to
    [50, 50000], circularity floor mean−0.4 clamped ≥0.1, aspect-ratio ceiling
    mean+1.5 clamped ≤6.0, kernel size 3, plus the fixed CRF constants the
    reference emits for 1024² meat tissue. Writes
    ``morphology_analysis.json``.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = _tile_files(Path(masks_dir))
    step = max(1, len(files) // max(n_samples, 1))
    samples = files[::step][:n_samples]

    all_cells: list[dict] = []
    sample_results: dict = {}
    for f in samples:
        mask = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        if mask is None:
            continue
        binary = (mask.astype(np.float32) > 0.5 * max(1.0, float(mask.max()))).astype(np.uint8)
        cells = _component_shape_stats(binary, min_area=min_area)
        sample_results[f.name] = {
            "num_cells": len(cells),
            "tissue_coverage": float(binary.mean()),
            "mean_area": float(np.mean([c["area"] for c in cells])) if cells else 0.0,
            "mean_circularity": (
                float(np.mean([c["circularity"] for c in cells])) if cells else 0.0
            ),
        }
        all_cells.extend(cells)

    stats = {
        "total_cells_analyzed": len(all_cells),
        "area_stats": _dist_stats([c["area"] for c in all_cells], percentiles=True),
        "circularity_stats": _dist_stats([c["circularity"] for c in all_cells]),
        "aspect_ratio_stats": _dist_stats([c["aspect_ratio"] for c in all_cells]),
        "eccentricity_stats": _dist_stats([c["eccentricity"] for c in all_cells]),
        "sample_results": sample_results,
    }
    area, circ, aspect = (
        stats["area_stats"], stats["circularity_stats"], stats["aspect_ratio_stats"]
    )
    optimized = {
        "morphological": {
            "min_cell_size": max(50, int(area["percentile_5"] * 0.5)),
            "max_cell_size": min(50000, int(area["percentile_95"] * 1.5)),
            "min_circularity": max(0.1, circ["mean"] - 2 * 0.2),
            "max_aspect_ratio": min(6.0, aspect["mean"] + 1.5),
            "morph_kernel_size": 3,
        },
        # fixed constants the reference emits for 1024² meat tissue (:204-210)
        "crf": {"bilateral_sxy": 25, "bilateral_srgb": 15, "gaussian_sxy": 4},
    }
    report = {"cell_statistics": stats, "optimized_parameters": optimized}
    (output_dir / "morphology_analysis.json").write_text(json.dumps(report, indent=2))
    return report
