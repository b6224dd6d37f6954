"""Offline analysis drivers: census + preprocessing comparison."""

import json

import cv2
import numpy as np

from adipose_tpu.data.analysis import preprocessing_comparison, tile_quality_census


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
