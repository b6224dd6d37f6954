"""Threshold optimization on slide-level macro F1.

Behavioral spec (``full_evaluation_enhanced.py:891-983,1593-1627``):
  * grid 0.10..0.90 step 0.05; per threshold, tiles group by slide id, the mean
    tile F1 per slide is averaged across slides (slide-macro F1), best wins;
  * optional two-stage adaptive search: coarse 0.1..0.9 step 0.1 then fine
    ±0.05 step 0.01 around the winner;
  * tile-level variant for backward compatibility.

TPU-native: per-tile F1 across ALL thresholds computes in one vmapped pass per
tile batch (:func:`adipose_tpu.ops.metrics.f1_threshold_sweep`); only the
(tiles × thresholds) F1 matrix crosses to host for slide grouping.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.ops.metrics import f1_threshold_sweep


def extract_slide_id(tile_path: str) -> str:
    """Strip a trailing ``_rX_cY`` pair (``full_evaluation_enhanced.py:658-678``)."""
    stem = Path(tile_path).stem
    parts = stem.split("_")
    if len(parts) >= 2 and parts[-2].startswith("r") and parts[-1].startswith("c"):
        return "_".join(parts[:-2])
    if parts[-1].startswith(("r", "c")):
        return "_".join(parts[:-1])
    return stem


#: module-level jit: repeated calls (coarse + fine adaptive stages, repeated
#: evaluations) reuse the compiled sweep instead of re-jitting per call
_sweep_jit = jax.jit(jax.vmap(f1_threshold_sweep, in_axes=(0, 0, None)))


def _f1_matrix(predictions, ground_truths, thresholds) -> np.ndarray:
    """(n_tiles, n_thresholds) F1 matrix, computed on device per tile.

    Batches per shape group — sliding-window datasets mix image sizes."""
    thr = jnp.asarray(thresholds, jnp.float32)
    groups = defaultdict(list)
    for i, p in enumerate(predictions):
        groups[p.shape].append(i)
    out = np.empty((len(predictions), len(thr)), np.float64)
    for shape, idxs in groups.items():
        preds = jnp.asarray(np.stack([predictions[i] for i in idxs]))
        trues = jnp.asarray(np.stack([ground_truths[i] for i in idxs]))
        out[idxs] = np.asarray(_sweep_jit(preds, trues, thr))
    return out


def _slide_macro_f1(f1_matrix: np.ndarray, slide_ids) -> np.ndarray:
    """Mean-over-tiles per slide, then mean over slides, per threshold."""
    groups = defaultdict(list)
    for row, sid in enumerate(slide_ids):
        groups[sid].append(row)
    per_slide = np.stack(
        [f1_matrix[rows].mean(axis=0) for rows in groups.values()]
    )
    return per_slide.mean(axis=0)


def optimize_threshold_f1_slide_level(
    predictions, ground_truths, tile_paths, threshold_range=None
):
    """Returns (optimal_threshold, f1_scores) — slide-macro criterion
    (``full_evaluation_enhanced.py:891-947``)."""
    if threshold_range is None:
        threshold_range = np.arange(0.1, 0.95, 0.05)
    slide_ids = [extract_slide_id(p) for p in tile_paths]
    f1 = _f1_matrix(predictions, ground_truths, threshold_range)
    macro = _slide_macro_f1(f1, slide_ids)
    best = int(np.argmax(macro))
    return float(threshold_range[best]), macro


def optimize_threshold_f1(predictions, ground_truths, threshold_range=None):
    """Tile-level variant (``full_evaluation_enhanced.py:950-983``)."""
    if threshold_range is None:
        threshold_range = np.arange(0.1, 0.95, 0.05)
    f1 = _f1_matrix(predictions, ground_truths, threshold_range)
    mean_f1 = f1.mean(axis=0)
    best = int(np.argmax(mean_f1))
    return float(threshold_range[best]), mean_f1


def optimize_threshold_adaptive(predictions, ground_truths, tile_paths):
    """Two-stage grid: coarse 0.1..0.9 step 0.1, then ±0.05 step 0.01
    (``full_evaluation_enhanced.py:1596-1616``)."""
    coarse = np.arange(0.1, 0.95, 0.1)
    t1, _ = optimize_threshold_f1_slide_level(
        predictions, ground_truths, tile_paths, coarse
    )
    fine = np.arange(max(0.01, t1 - 0.05), min(0.99, t1 + 0.05) + 1e-9, 0.01)
    t2, scores = optimize_threshold_f1_slide_level(
        predictions, ground_truths, tile_paths, fine
    )
    return t2, scores
