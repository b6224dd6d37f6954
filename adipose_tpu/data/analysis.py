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
