"""Offline dataset analyses — tile-quality census + preprocessing comparison.

Behavioral spec: the ``pre-post-processing_tools/analysis/`` script family
(~4.5 kLoC of one-off reports — tile-quality census, CLAHE/percentile/
normalization comparisons, preprocessing-pipeline visualizer). Consolidated
here as parameterized drivers:

  * :func:`tile_quality_census` — batched QC statistics over a tile directory
    (white ratio, Laplacian variance, intensity moments) with distribution
    summary + per-tile CSV — the 'tile census' report;
  * :func:`preprocessing_comparison` — applies a set of enhancement variants
    (none / zscore / percentile / CLAHE / deband) to sample tiles and tabulates
    quality metrics (sharpness, entropy, contrast) per variant — the
    'preprocessing comparison' reports;
  * :func:`morphology_census` — cell-shape statistics over mask tiles →
    optimized post-processing parameters;
  * :func:`contrast_group_census` — quality grouping → adaptive-CLAHE cutoffs
    (``analyze_contrast_groups.py``);
  * :func:`preprocessing_pipeline_visualization` — staged pipeline panels
    (``visualize_preprocessing_pipeline.py``).

All pixel math runs device-batched through the ops layer.
"""

from __future__ import annotations

import json
from pathlib import Path

import cv2
import jax
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


# ---------------------------------------------------------------------------
# Contrast grouping analysis → adaptive-CLAHE cutoffs
# (analysis/contrast_and_normalization_analysis/analyze_contrast_groups.py)
# ---------------------------------------------------------------------------


def _box_mean(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k×k sliding mean with reflect-101 borders (cv2.filter2D default),
    computed as two separable cumsum passes — O(N) instead of O(N·k²)."""
    pad = k // 2
    xp = jnp.pad(x, pad, mode="reflect")

    def box1d(a, axis):
        c = jnp.cumsum(a, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        c = jnp.concatenate([zero, c], axis=axis)
        hi = jax.lax.slice_in_dim(c, k, c.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, c.shape[axis] - k, axis=axis)
        return hi - lo

    return box1d(box1d(xp, 0), 1) / float(k * k)


@jax.jit
def _quality_arrays(x: jnp.ndarray):
    """Device program for the per-image quality metrics: intensity moments,
    15×15 local-contrast field, and the 256-bin histogram."""
    mean = jnp.mean(x)
    std = jnp.std(x)
    dyn = jnp.max(x) - jnp.min(x)
    local_mean = _box_mean(x, 15)
    local_var = jnp.maximum(_box_mean(x * x, 15) - local_mean**2, 0.0)
    local_std = jnp.sqrt(local_var)
    hist = jnp.histogram(x, bins=256, range=(0.0, 255.0))[0].astype(jnp.float32)
    return mean, std, dyn, jnp.mean(local_std), jnp.std(local_std), hist


def image_quality_metrics(img: np.ndarray) -> dict:
    """The ten quality metrics of ``analyze_contrast_groups.py:34-90``:
    intensity moments, contrast ratio / dynamic range / CV, Laplacian-variance
    sharpness, 15×15 local-contrast statistics, histogram entropy, and
    smoothed-histogram peak prominence. Pixel math runs on device; the
    histogram post-processing (5-tap Gaussian smooth + peak scan) is 256
    scalars on host."""
    from adipose_tpu.ops.qc import laplacian_variance

    x = jnp.asarray(img, jnp.float32)
    mean, std, dyn, avg_lc, std_lc, hist = (
        np.asarray(v) for v in _quality_arrays(x)
    )
    lap = float(laplacian_variance(jnp.clip(x, 0, 255).astype(jnp.uint8)))
    p = hist / max(hist.sum(), 1.0)
    entropy = float(-np.sum(p * np.log2(p + 1e-10)))
    smooth = cv2.GaussianBlur(hist.reshape(-1, 1), (1, 5), 1.0).ravel()
    interior = smooth[1:-1]
    is_peak = (interior > smooth[:-2]) & (interior > smooth[2:])
    peaks = interior[is_peak]
    peak_prom = float(peaks.max() / (smooth.mean() + 1e-6)) if peaks.size else 0.0
    mean, std = float(mean), float(std)
    return {
        "mean_intensity": mean,
        "std_intensity": std,
        "contrast_ratio": std / (mean + 1e-6),
        "dynamic_range": float(dyn),
        "coefficient_variation": std / mean * 100 if mean else 0.0,
        "laplacian_variance": lap,
        "avg_local_contrast": float(avg_lc),
        "local_contrast_variation": float(std_lc) / (float(avg_lc) + 1e-6),
        "entropy": entropy,
        "peak_prominence": peak_prom,
    }


def _census_splits(dataset_dir: Path) -> dict:
    """dataset/{train,val,test}/images layout when present, else one flat
    split (the reference hard-codes the three-split layout, :101-114).
    A lone ``images/`` child is used directly so sibling ``masks/`` artifacts
    never enter the census."""
    splits = {}
    for name in ("train", "val", "test"):
        d = dataset_dir / name / "images"
        if d.is_dir():
            splits[name] = d
    if splits:
        return splits
    sub = dataset_dir / "images"
    return {"all": sub if sub.is_dir() else dataset_dir}


def contrast_group_census(
    dataset_dir: str | Path,
    output_dir: str | Path,
    n_per_split: int = 2,
    seed: int = 865,
) -> dict:
    """Contrast-based quality grouping → adaptive-CLAHE cutoffs.

    Behavioral spec: ``analysis/contrast_and_normalization_analysis/
    analyze_contrast_groups.py`` — sample images per split (seed 865, :117),
    measure :func:`image_quality_metrics`, set poor/good cutoffs at the 33rd/
    67th percentile of contrast ratio, sharpness, and local contrast
    (:189-196), classify each image (contrast primary, sharpness tiebreak on
    the good side, :229-243), and emit the reference's artifact set:
    ``image_quality_analysis.csv``, ``contrast_analysis_grouping.png``,
    ``adaptive_clahe_function.py`` (generated, parameterizing
    :func:`adipose_tpu.ops.clahe.adaptive_clahe_normalize`) plus a cutoffs
    JSON, and ``CONTRAST_GROUPING_ANALYSIS.md`` (:363-418).
    """
    import random as _random

    import pandas as pd

    dataset_dir, output_dir = Path(dataset_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    rng = _random.Random(seed)

    rows = []
    for split, img_dir in _census_splits(dataset_dir).items():
        files = sorted(img_dir.glob("*.jpg")) or [
            f for f in _tile_files(img_dir) if "masks" not in f.parent.parts
        ]
        if not files:
            continue
        for idx, f in enumerate(rng.sample(files, min(n_per_split, len(files)))):
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            m = image_quality_metrics(img.astype(np.float32))
            m.update(split=split, sample_id=f"{split}_sample{idx + 1}",
                     filename=f.name)
            rows.append(m)
    if not rows:
        raise FileNotFoundError(f"no images under {dataset_dir}")
    df = pd.DataFrame(rows)

    cutoffs = {}
    for metric in ("contrast_ratio", "laplacian_variance", "avg_local_contrast"):
        lo, hi = np.percentile(df[metric].values, [33, 67])
        cutoffs[metric] = {"poor_cutoff": float(lo), "good_cutoff": float(hi)}

    def classify(row):
        if row["contrast_ratio"] < cutoffs["contrast_ratio"]["poor_cutoff"]:
            return "Poor Quality (Needs CLAHE)"
        if (row["contrast_ratio"] > cutoffs["contrast_ratio"]["good_cutoff"]
                and row["laplacian_variance"]
                > cutoffs["laplacian_variance"]["good_cutoff"]):
            return "Good Quality (Percentile Only)"
        return "Medium Quality (Mild CLAHE)"

    df["quality_group"] = df.apply(classify, axis=1)
    df.to_csv(output_dir / "image_quality_analysis.csv", index=False)
    (output_dir / "adaptive_clahe_cutoffs.json").write_text(
        json.dumps(cutoffs, indent=2)
    )
    # The reference emits a ready-to-import module with the cutoffs baked in
    # (:258-298); ours parameterizes the library op instead of inlining cv2.
    (output_dir / "adaptive_clahe_function.py").write_text(
        "# Generated by adipose_tpu contrast_group_census "
        f"from {len(df)} sample images.\n"
        "from adipose_tpu.ops.clahe import adaptive_clahe_normalize\n\n"
        f"CUTOFFS = {json.dumps(cutoffs, indent=4)}\n\n\n"
        "def adaptive_clahe_normalization(img):\n"
        '    """Quality-adaptive CLAHE+percentile normalization -> [0,1]."""\n'
        "    import numpy as np\n"
        "    out, _strategy = adaptive_clahe_normalize(img, CUTOFFS)\n"
        "    return np.asarray(out)\n"
    )
    _plot_contrast_grouping(df, output_dir / "contrast_analysis_grouping.png")

    counts = df["quality_group"].value_counts()
    cr, lv = cutoffs["contrast_ratio"], cutoffs["laplacian_variance"]
    report = (
        "# Image Quality Analysis and Adaptive CLAHE Cutoffs\n\n"
        f"Based on {len(df)} sample images ({n_per_split} per split, "
        f"seed {seed}).\n\n"
        "## Determined cutoffs\n\n"
        "**Contrast ratio (std/mean):**\n"
        f"- Poor (needs CLAHE): < {cr['poor_cutoff']:.3f}\n"
        f"- Medium (mild CLAHE): {cr['poor_cutoff']:.3f} – "
        f"{cr['good_cutoff']:.3f}\n"
        f"- Good (percentile only): > {cr['good_cutoff']:.3f}\n\n"
        "**Sharpness (Laplacian variance):**\n"
        f"- Poor: < {lv['poor_cutoff']:.1f}\n"
        f"- Medium: {lv['poor_cutoff']:.1f} – {lv['good_cutoff']:.1f}\n"
        f"- Good: > {lv['good_cutoff']:.1f}\n\n"
        "## Group distribution\n\n"
        + "\n".join(f"- {k}: {v}" for k, v in counts.items())
        + "\n\n## Strategy\n\n"
        "1. Poor: CLAHE clip 2.0 grid 8×8 + 5–95 percentile\n"
        "2. Medium: CLAHE clip 1.5 grid 12×12 + 5–95 percentile\n"
        "3. Good: 2–98 percentile only\n\n"
        "Generated: contrast_analysis_grouping.png, "
        "image_quality_analysis.csv, adaptive_clahe_function.py, "
        "adaptive_clahe_cutoffs.json\n"
    )
    (output_dir / "CONTRAST_GROUPING_ANALYSIS.md").write_text(report)
    return {"cutoffs": cutoffs, "n_images": len(df),
            "groups": counts.to_dict()}


def _plot_contrast_grouping(df, out_path: Path) -> None:
    """4-panel grouping figure (``analyze_contrast_groups.py:301-342``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(16, 12))
    codes = df["quality_group"].astype("category").cat.codes
    axes[0, 0].scatter(df["contrast_ratio"], df["laplacian_variance"],
                       c=codes, cmap="viridis", alpha=0.7, s=100)
    for _, row in df.iterrows():
        axes[0, 0].annotate(row["sample_id"],
                            (row["contrast_ratio"], row["laplacian_variance"]),
                            xytext=(5, 5), textcoords="offset points",
                            fontsize=8)
    axes[0, 0].set_xlabel("Contrast Ratio (std/mean)")
    axes[0, 0].set_ylabel("Laplacian Variance (sharpness)")
    axes[0, 0].set_title("Image Quality Metrics")

    counts = df["quality_group"].value_counts()
    axes[0, 1].bar(range(len(counts)), counts.values)
    axes[0, 1].set_xticks(range(len(counts)))
    axes[0, 1].set_xticklabels(counts.index, rotation=45, ha="right")
    axes[0, 1].set_title("Quality Group Distribution")
    axes[0, 1].set_ylabel("Number of Images")

    axes[1, 0].hist(df["contrast_ratio"], bins=8, alpha=0.7, edgecolor="black")
    axes[1, 0].set_xlabel("Contrast Ratio")
    axes[1, 0].set_title("Contrast Ratio Distribution")
    axes[1, 1].hist(df["laplacian_variance"], bins=8, alpha=0.7,
                    edgecolor="black")
    axes[1, 1].set_xlabel("Laplacian Variance (Sharpness)")
    axes[1, 1].set_title("Sharpness Distribution")
    for ax in axes.ravel():
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


# ---------------------------------------------------------------------------
# Preprocessing-pipeline visualizer
# (analysis/visualize_preprocessing_pipeline.py)
# ---------------------------------------------------------------------------


def preprocessing_pipeline_visualization(
    tiles_dir: str | Path,
    output_dir: str | Path,
    n_samples: int = 7,
    stats_path: str | Path | None = None,
) -> dict:
    """Original → Reinhard → z-score → percentile panels for sample tiles.

    Behavioral spec: ``analysis/visualize_preprocessing_pipeline.py`` —
    evenly-spread sample tiles (:60-65), each pushed through the four
    preprocessing stages in both color and grayscale (:73-151), rendered as an
    image row + histogram row per tile with per-stage statistics, saved as
    ``preprocessing_pipeline_color.png`` / ``..._grayscale.png`` (:163-264).
    Stage math runs on device through the ops layer; dataset z-score stats
    come from ``normalization_stats.json`` when given, else are computed over
    the samples (:303-306).
    """
    from adipose_tpu.data.stats import compute_dataset_statistics
    from adipose_tpu.ops import stain
    from adipose_tpu.ops.normalize import percentile_unit, zscore_dataset

    tiles_dir, output_dir = Path(tiles_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = _tile_files(tiles_dir)
    if not files:
        raise FileNotFoundError(f"no tiles under {tiles_dir}")
    step = max(1, len(files) // max(n_samples, 1))
    samples = files[::step][:n_samples]

    if stats_path is not None:
        stats = json.loads(Path(stats_path).read_text())
        mean, std = float(stats["mean"]), float(stats["std"])
    else:
        mean, std = compute_dataset_statistics([str(p) for p in samples])

    tiles_data = []
    for f in samples:
        bgr = cv2.imread(str(f), cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
        reinhard_rgb = np.asarray(stain.normalize_image(rgb))
        reinhard_gray = cv2.cvtColor(reinhard_rgb, cv2.COLOR_RGB2GRAY).astype(
            np.float32
        )
        rg = jnp.asarray(reinhard_gray)
        zscore_gray = np.asarray(zscore_dataset(rg, mean, std))
        percentile_gray = np.asarray(percentile_unit(rg))
        gray3 = lambda g: np.repeat(g[..., None], 3, axis=-1)  # noqa: E731
        tiles_data.append({
            "name": f.stem,
            "color": [rgb.astype(np.float32), reinhard_rgb.astype(np.float32),
                      gray3(zscore_gray), gray3(percentile_gray)],
            "grayscale": [gray, reinhard_gray, zscore_gray, percentile_gray],
        })
    if not tiles_data:
        raise RuntimeError("no tiles could be processed")

    outputs = {}
    for version in ("color", "grayscale"):
        outputs[version] = str(
            _plot_pipeline_stages(tiles_data, output_dir, version)
        )
    outputs["stats"] = {"mean": mean, "std": std}
    return outputs


_STAGE_NAMES = ("Original", "Reinhard Normalized", "Reinhard + Z-score",
                "Reinhard + Percentile")
_STAGE_COLORS = ("red", "green", "blue", "orange")


def _plot_pipeline_stages(tiles_data, output_dir: Path, version: str) -> Path:
    """Image-row + histogram-row grid, one pair of rows per tile
    (``visualize_preprocessing_pipeline.py:163-264``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(tiles_data)
    fig = plt.figure(figsize=(20, 4 * n + 3))
    title = "Original Colors" if version == "color" else "Grayscale (Network View)"
    fig.suptitle(
        f"Preprocessing Pipeline - {title}: "
        "Original → Reinhard → Z-score → Percentile",
        fontsize=16, fontweight="bold", y=0.98,
    )
    for ti, tile in enumerate(tiles_data):
        images = tile["color"] if version == "color" else tile["grayscale"]
        for si, (img, name, color) in enumerate(
            zip(images, _STAGE_NAMES, _STAGE_COLORS)
        ):
            ax = plt.subplot(n * 2, 4, ti * 8 + si + 1)
            if version == "color":
                ax.imshow(np.clip(img, 0, 255).astype(np.uint8))
            elif si <= 1:  # original / reinhard stay in [0, 255]
                ax.imshow(np.clip(img, 0, 255).astype(np.uint8),
                          cmap="gray", vmin=0, vmax=255)
            else:  # normalized stages: rescale for display
                lo, hi = float(img.min()), float(img.max())
                disp = (img - lo) / (hi - lo) if hi > lo else img
                ax.imshow(disp, cmap="gray", vmin=0, vmax=1)
            label = f"{name}\n{tile['name']}" if ti == 0 else name
            ax.set_title(label, fontsize=10, fontweight="bold", color=color)
            ax.axis("off")

            hx = plt.subplot(n * 2, 4, ti * 8 + si + 5)
            data = img
            if data.ndim == 3:
                data = cv2.cvtColor(
                    np.clip(data, 0, 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
                )
            flat = np.asarray(data, np.float32).ravel()
            hx.hist(flat, bins=50, alpha=0.7, density=True, color=color)
            hx.set_xlabel("Pixel Value", fontsize=8)
            hx.set_ylabel("Density", fontsize=8)
            hx.tick_params(labelsize=7)
            hx.text(
                0.05, 0.95,
                f"μ={flat.mean():.2f}\nσ={flat.std():.2f}\n"
                f"Range=[{flat.min():.2f}, {flat.max():.2f}]",
                transform=hx.transAxes, fontsize=7, verticalalignment="top",
                bbox=dict(boxstyle="round", facecolor="white", alpha=0.8),
            )
    fig.text(
        0.02, 0.02,
        f"Pipeline stages ({title}): 1. Original raw tile  "
        "2. Reinhard stain normalization  "
        "3. dataset z-score  4. 1–99 percentile",
        fontsize=10,
        bbox=dict(boxstyle="round", facecolor="lightyellow", alpha=0.8),
    )
    fig.tight_layout(rect=[0, 0.05, 1, 0.96])
    out = output_dir / f"preprocessing_pipeline_{version}.png"
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out


# ---------------------------------------------------------------------------
# Normalization-method comparison suites — one named mode per reference script
# in ``analysis/contrast_and_normalization_analysis/`` (same method grids,
# per-sample comparison panels, metrics CSV, and summary markdown).
# ---------------------------------------------------------------------------

_Z_MEAN, _Z_STD = 200.99, 25.26  # dataset stats (stain_normalization.py:348)

#: mode → [(title, clahe (clip, grid) | "zscore" | None, percentile | None)].
#: Grids transcribed from the reference scripts (cited per mode).
NORM_COMPARISON_MODES = {
    # compare_clahe_percentile.py:48-90
    "clahe-percentile": (
        ("Original", None, None),
        ("CLAHE Only", (2.0, 8), None),
        ("Percentile (0.5-99.5)", None, (0.5, 99.5)),
        ("CLAHE + Percentile (0.5-99.5)", (2.0, 8), (0.5, 99.5)),
        ("Percentile (0.2-99.8)", None, (0.2, 99.8)),
        ("CLAHE + Percentile (0.2-99.8)", (2.0, 8), (0.2, 99.8)),
    ),
    # compare_normalization_methods.py:107-150
    "normalization-methods": (
        ("Original", None, None),
        ("CLAHE Only", (2.0, 8), None),
        ("Percentile Only (1-99)", None, (1.0, 99.0)),
        ("CLAHE + Percentile (Aggressive)", (2.0, 8), (1.0, 99.0)),
        ("Gentle Percentile (10-90)", None, (10.0, 90.0)),
        ("Light CLAHE + Wider Percentile", (1.2, 16), (5.0, 95.0)),
    ),
    # compare_requested_methods.py:52-95
    "requested-methods": (
        ("Current Z-score", "zscore", None),
        ("Percentile (0.01-99.99)", None, (0.01, 99.99)),
        ("Mild CLAHE + Percentile (0.01-99.99)", (1.5, 12), (0.01, 99.99)),
        ("Percentile (0.05-99.95)", None, (0.05, 99.95)),
        ("Mild CLAHE + Percentile (0.05-99.95)", (1.5, 12), (0.05, 99.95)),
        ("Mild CLAHE + Percentile (0.001-99.999)", (1.5, 12), (0.001, 99.999)),
    ),
    # compare_final_methods.py:47-90
    "final-methods": (
        ("Original", None, None),
        ("CLAHE", (2.0, 8), None),
        ("Percentile (0.1-99.9)", None, (0.1, 99.9)),
        ("Mild CLAHE", (1.5, 12), None),
        ("Percentile (0.05-99.95)", None, (0.05, 99.95)),
        ("Mild CLAHE + Percentile (0.05-99.95)", (1.5, 12), (0.05, 99.95)),
    ),
    # compare_very_final.py:47-86
    "very-final": (
        ("Original", None, None),
        ("CLAHE", (2.0, 8), None),
        ("Mild CLAHE", (1.5, 12), None),
        ("Mild CLAHE + Percentile (0.05-99.95)", (1.5, 12), (0.05, 99.95)),
        ("Mild CLAHE + Percentile (0.01-99.99)", (1.5, 12), (0.01, 99.99)),
    ),
}

#: reference output-file suffix per mode (``{sample}_{suffix}.png``)
_MODE_SUFFIX = {
    "clahe-percentile": "clahe_percentile_comparison",
    "normalization-methods": "normalization_comparison_updated",
    "requested-methods": "requested_comparison",
    "final-methods": "final_comparison",
    "very-final": "very_final_comparison",
}


def _clahe_255(x: jnp.ndarray, clip: float, grid: int) -> jnp.ndarray:
    """Device CLAHE on a [0,255] image of any shape (reflect-pad to grid)."""
    h, w = x.shape
    ph, pw = (-h) % grid, (-w) % grid
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    return clahe(x, clip_limit=clip, tile_grid=grid)[:h, :w]


def apply_norm_method(img: np.ndarray, clahe_spec, perc) -> np.ndarray:
    """One comparison-grid method on a [0,255] grayscale image (device-side).

    Returns [0,1] floats for percentile methods, [0,1]-scaled for plain
    CLAHE/original panels, raw z-scores for the "zscore" method — matching the
    value ranges the reference scripts pass to their plots."""
    x = jnp.asarray(img, jnp.float32)
    if clahe_spec == "zscore":  # compare_requested_methods.py:40-43
        return np.asarray((x - _Z_MEAN) / (_Z_STD + 1e-10))
    if clahe_spec is not None:
        clip, grid = clahe_spec
        x = _clahe_255(x, clip, grid)
    if perc is not None:
        lo, hi = jnp.percentile(x, jnp.asarray(perc, jnp.float32))
        return np.asarray(jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-3), 0, 1))
    return np.asarray(x / 255.0)


def _comparison_samples(tiles_dir: Path, n_samples: int) -> list:
    """(name, image) samples; dataset/{split}/images layouts yield the
    reference's ``{split}_sample{i}`` naming, flat dirs use file stems."""
    out = []
    splits = _census_splits(tiles_dir)
    for split, d in splits.items():
        files = _tile_files(d)[:n_samples]
        for i, f in enumerate(files):
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            name = f"{split}_sample{i + 1}" if split != "all" else f.stem
            out.append((name, img.astype(np.float32)))
    return out


def normalization_comparison(
    tiles_dir: str | Path,
    output_dir: str | Path,
    mode: str,
    n_samples: int = 2,
) -> dict:
    """One reference ``compare_*.py`` suite: per-sample image+histogram panels
    for the mode's method grid, a per-method metrics CSV, and a summary
    markdown — artifact set matching the reference script of the same mode."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    if mode not in NORM_COMPARISON_MODES:
        raise ValueError(f"unknown mode {mode!r}; choose from "
                         f"{sorted(NORM_COMPARISON_MODES)}")
    methods = NORM_COMPARISON_MODES[mode]
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    samples = _comparison_samples(Path(tiles_dir), n_samples)
    rows = []
    for name, img in samples:
        outs = [(t, apply_norm_method(img, c, p)) for t, c, p in methods]
        fig = plt.figure(figsize=(4 * len(methods), 8))
        for idx, (title, arr) in enumerate(outs):
            ax = fig.add_subplot(2, len(methods), idx + 1)
            disp = arr
            if "Z-score" in title:  # display-normalize (ref :115-118)
                disp = (arr - arr.min()) / (arr.max() - arr.min() + 1e-6)
            ax.imshow(disp, cmap="gray", vmin=0, vmax=1)
            ax.set_title(title, fontsize=11, weight="bold")
            ax.axis("off")
            hx = fig.add_subplot(2, len(methods), len(methods) + idx + 1)
            hx.hist(arr.ravel(), bins=50, alpha=0.8, color="lightblue",
                    edgecolor="black")
            hx.set_title("Histogram", fontsize=9)
            hx.grid(True, alpha=0.3)
            rows.append({
                "sample": name, "method": title,
                "mean": float(arr.mean()), "std": float(arr.std()),
                "min": float(arr.min()), "max": float(arr.max()),
                "sharpness": float(cv2.Laplacian(
                    np.clip(disp * 255, 0, 255).astype(np.uint8),
                    cv2.CV_64F).var()),
                "entropy": shannon_entropy(
                    np.clip(disp * 255, 0, 255).astype(np.uint8)),
            })
        fig.suptitle(f"{mode} methods comparison — {name}", fontsize=14)
        fig.tight_layout(rect=[0, 0, 1, 0.96])
        fig.savefig(output_dir / f"{name}_{_MODE_SUFFIX[mode]}.png", dpi=120)
        plt.close(fig)

    df = pd.DataFrame(rows)
    csv_path = output_dir / f"{mode.replace('-', '_')}_metrics.csv"
    df.to_csv(csv_path, index=False)
    md = [f"# {mode} comparison summary", "",
          f"Samples: {len(samples)}; methods: {len(methods)}", "",
          "| method | mean | std | sharpness | entropy |", "|---|---|---|---|---|"]
    if len(df):
        for title, g in df.groupby("method", sort=False):
            md.append(f"| {title} | {g['mean'].mean():.3f} | "
                      f"{g['std'].mean():.3f} | {g['sharpness'].mean():.1f} | "
                      f"{g['entropy'].mean():.2f} |")
    summary_path = output_dir / f"{mode.upper().replace('-', '_')}_COMPARISON_SUMMARY.md"
    summary_path.write_text("\n".join(md) + "\n")
    return {"mode": mode, "n_samples": len(samples),
            "csv": str(csv_path), "summary": str(summary_path)}


# --- comprehensive dataset-wide normalization analysis ----------------------
# (comprehensive_normalization_analysis.py: 4 methods × sampled tiles →
#  dataset_normalization_metrics.csv + dashboard PNG + report; optional
#  adipocyte-reference similarity scoring)

_COMPREHENSIVE_METHODS = {
    "current_zscore": ("zscore", None),
    "clahe_percentile": ((2.0, 8), (0.01, 99.99)),
    "mild_clahe_percentile": ((1.5, 12), (0.01, 99.99)),
    "percentile_only": (None, (0.01, 99.99)),
}

_QUALITY_METRICS = ("contrast_ratio", "laplacian_variance", "entropy",
                    "edge_density", "dynamic_range",
                    "local_contrast_consistency")


@jax.jit
def _unit_quality_arrays(x: jnp.ndarray):
    """Moments + 15×15 local-std spread + 256-bin [0,1] histogram on device."""
    mean, std = jnp.mean(x), jnp.std(x)
    dyn = jnp.max(x) - jnp.min(x)
    local_mean = _box_mean(x, 15)
    local_std = jnp.sqrt(jnp.maximum(_box_mean(x * x, 15) - local_mean**2, 0.0))
    hist = jnp.histogram(x, bins=256, range=(0.0, 1.0))[0].astype(jnp.float32)
    return mean, std, dyn, jnp.std(local_std), hist


def comprehensive_metrics(img: np.ndarray, method_name: str = "") -> dict:
    """The 8 segmentation-oriented quality metrics of
    ``comprehensive_normalization_analysis.py:27-76`` ([0,1]-scaled input;
    >1.1 max is treated as [0,255] and rescaled, like the reference)."""
    x = np.asarray(img, np.float32)
    if x.max() > 1.1:
        x = x / 255.0
    mean, std, dyn, std_lstd, hist = (
        np.asarray(v) for v in _unit_quality_arrays(jnp.asarray(x)))
    u8 = np.clip(x * 255, 0, 255).astype(np.uint8)
    lap = float(cv2.Laplacian(u8, cv2.CV_64F).var())
    edges = cv2.Canny(u8, 50, 150)
    p = hist / (hist.sum() + 1e-10)
    entropy = float(-np.sum(p * np.log2(p + 1e-10)))
    return {
        "method": method_name,
        "mean_intensity": float(mean),
        "std_intensity": float(std),
        "contrast_ratio": float(std) / (float(mean) + 1e-6),
        "laplacian_variance": lap,
        "entropy": entropy,
        "edge_density": float((edges > 0).sum()) / edges.size,
        "dynamic_range": float(dyn),
        "local_contrast_consistency": 1.0 / (float(std_lstd) + 1e-6),
    }


def comprehensive_normalization_analysis(
    dataset_dir: str | Path,
    output_dir: str | Path,
    n_per_split: int = 100,
    adipocyte_dir: str | Path | None = None,
) -> dict:
    """Dataset-wide method comparison: sample tiles per split, score each of
    the four normalization methods with the 8 quality metrics, and (when an
    adipocyte reference directory is given) Gaussian-similarity-score every
    tile/method against the adipocyte standards
    (``comprehensive_normalization_analysis.py:183-289``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(42)  # ref: random.seed(42) (:158)
    rows = []
    for split, d in _census_splits(Path(dataset_dir)).items():
        files = _tile_files(d)
        if len(files) > n_per_split:
            files = [files[i] for i in
                     sorted(rng.choice(len(files), n_per_split, replace=False))]
        for f in files:
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            img = img.astype(np.float32)
            for method, (cl, pc) in _COMPREHENSIVE_METHODS.items():
                out = apply_norm_method(img, cl, pc)
                m = comprehensive_metrics(out, method)
                m.update({"filename": f.name, "split": split})
                rows.append(m)
    df = pd.DataFrame(rows)
    df.to_csv(output_dir / "dataset_normalization_metrics.csv", index=False)

    result = {"n_rows": len(df),
              "csv": str(output_dir / "dataset_normalization_metrics.csv")}

    adip_df = None
    if adipocyte_dir is not None and Path(adipocyte_dir).is_dir():
        arows = []
        for f in _tile_files(Path(adipocyte_dir)):
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            z = apply_norm_method(img.astype(np.float32), "zscore", None)
            m = comprehensive_metrics(z, "adipocyte_reference")
            m["filename"] = f.name
            arows.append(m)
        adip_df = pd.DataFrame(arows)
        adip_df.to_csv(output_dir / "adipocyte_reference_metrics.csv", index=False)
        if len(adip_df) and len(df):
            stats = {k: (adip_df[k].mean(), adip_df[k].std())
                     for k in _QUALITY_METRICS}
            srows = []
            for _, row in df.iterrows():
                scores = {}
                for k in _QUALITY_METRICS:
                    zd = abs((row[k] - stats[k][0]) / (stats[k][1] + 1e-6))
                    scores[f"{k}_similarity"] = float(np.exp(-zd / 2))
                srows.append({"filename": row["filename"], "split": row["split"],
                              "method": row["method"],
                              "overall_similarity":
                                  float(np.mean(list(scores.values()))),
                              **scores})
            sim_df = pd.DataFrame(srows)
            sim_df.to_csv(output_dir / "similarity_to_adipocytes.csv", index=False)
            result["similarity_csv"] = str(output_dir / "similarity_to_adipocytes.csv")

    # dashboard: per-method distribution of each quality metric
    if len(df):
        fig, axes = plt.subplots(2, 3, figsize=(18, 10))
        for ax, metric in zip(axes.ravel(), _QUALITY_METRICS):
            data = [df[df["method"] == m][metric].dropna()
                    for m in _COMPREHENSIVE_METHODS]
            ax.boxplot(data, tick_labels=list(_COMPREHENSIVE_METHODS))
            ax.set_title(metric)
            ax.tick_params(axis="x", rotation=30)
        fig.suptitle("Comprehensive normalization analysis")
        fig.tight_layout(rect=[0, 0, 1, 0.96])
        fig.savefig(output_dir / "comprehensive_normalization_analysis.png",
                    dpi=120)
        plt.close(fig)

    md = ["# Comprehensive normalization report", "",
          f"Tiles × methods scored: {len(df)}", "",
          "| method | " + " | ".join(_QUALITY_METRICS) + " |",
          "|---" * (len(_QUALITY_METRICS) + 1) + "|"]
    if len(df):
        for m, g in df.groupby("method", sort=False):
            md.append("| " + m + " | " +
                      " | ".join(f"{g[k].mean():.4g}" for k in _QUALITY_METRICS)
                      + " |")
    if adip_df is not None and len(adip_df):
        md += ["", f"Adipocyte references scored: {len(adip_df)}"]
    (output_dir / "COMPREHENSIVE_NORMALIZATION_REPORT.md").write_text(
        "\n".join(md) + "\n")
    result["report"] = str(output_dir / "COMPREHENSIVE_NORMALIZATION_REPORT.md")
    return result
