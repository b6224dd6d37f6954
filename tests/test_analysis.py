"""Offline analysis drivers: census + preprocessing comparison."""

import json

import cv2
import numpy as np

from adipose_tpu.data.analysis import (
    morphology_census,
    preprocessing_comparison,
    tile_quality_census,
)


def _make_tiles(tmp_path, rng, n=6):
    d = tmp_path / "tiles"
    d.mkdir()
    for i in range(n):
        if i == 0:
            img = np.full((64, 64), 250, np.uint8)  # white/empty
        else:
            img = (rng.rand(64, 64) * 200).astype(np.uint8)
        cv2.imwrite(str(d / f"t{i}.jpg"), img)
    return d


def test_census(tmp_path, rng):
    d = _make_tiles(tmp_path, rng)
    summary = tile_quality_census(d, tmp_path / "out", batch_size=4)
    assert summary["n_tiles"] == 6
    assert summary["n_empty"] >= 1
    assert (tmp_path / "out" / "census.csv").exists()
    assert (tmp_path / "out" / "census_summary.json").exists()


def test_preprocessing_comparison(tmp_path, rng):
    d = _make_tiles(tmp_path, rng, n=4)
    rows = preprocessing_comparison(d, tmp_path / "cmp", n_samples=2)
    variants = {r["variant"] for r in rows}
    assert {"none", "zscore", "percentile", "clahe", "deband_fft"} <= variants
    assert (tmp_path / "cmp" / "preprocessing_comparison.csv").exists()
    assert (tmp_path / "cmp" / "preprocessing_summary.csv").exists()
    assert any(p.name.endswith("_variants.jpg") for p in (tmp_path / "cmp").iterdir())


def test_morphology_census(tmp_path):
    """Known geometry: circles must yield their analytic area/circularity and
    the recommended size envelope must bracket them."""
    d = tmp_path / "masks"
    d.mkdir()
    for i, r in enumerate((8, 12, 16)):
        mask = np.zeros((128, 128), np.uint8)
        cv2.circle(mask, (40, 40), r, 255, -1)
        cv2.circle(mask, (96, 96), r + 2, 255, -1)
        cv2.imwrite(str(d / f"m{i}.png"), mask)
    report = morphology_census(d, tmp_path / "morph", n_samples=3)
    stats = report["cell_statistics"]
    assert stats["total_cells_analyzed"] == 6
    # circles: circularity near 1 (rasterized contour slightly below)
    assert 0.75 < stats["circularity_stats"]["mean"] <= 1.05
    assert stats["aspect_ratio_stats"]["mean"] < 1.3
    # area of r=8 disk ≈ 201 px — the min/max envelope must bracket all cells
    p = report["optimized_parameters"]["morphological"]
    assert p["min_cell_size"] <= stats["area_stats"]["min"]
    assert p["max_cell_size"] >= stats["area_stats"]["max"]
    assert p["morph_kernel_size"] == 3
    assert (tmp_path / "morph" / "morphology_analysis.json").exists()
    # JSON round-trips
    loaded = json.loads((tmp_path / "morph" / "morphology_analysis.json").read_text())
    assert loaded["optimized_parameters"]["crf"]["bilateral_sxy"] == 25
