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


def test_adaptive_clahe_routing(rng):
    """Quality routing matches the reference decision table
    (adaptive_clahe_function.py:18-35): flat low-contrast -> CLAHE, sharp
    high-contrast -> percentile only; all outputs land in [0, 1]."""
    from adipose_tpu.ops.clahe import adaptive_clahe_normalize

    flat = (100 + rng.randn(100, 130) * 5).astype(np.float32)
    out, strat = adaptive_clahe_normalize(flat)
    assert strat == "poor"
    assert out.shape == flat.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    sharp = (rng.rand(96, 96) * 255).astype(np.float32)
    out2, strat2 = adaptive_clahe_normalize(sharp)
    assert strat2 == "good"
    assert float(out2.max()) <= 1.0


def test_image_quality_metrics_oracle(rng):
    """Device metrics match the reference's numpy/cv2 formulas
    (analyze_contrast_groups.py:34-90)."""
    from adipose_tpu.data.analysis import image_quality_metrics

    img = (rng.rand(128, 128) * 220 + 10).astype(np.float32)
    m = image_quality_metrics(img)
    assert abs(m["mean_intensity"] - img.mean()) < 1e-2
    assert abs(m["std_intensity"] - img.std()) < 1e-2
    assert abs(m["contrast_ratio"] - img.std() / (img.mean() + 1e-6)) < 1e-4
    assert abs(m["dynamic_range"] - (img.max() - img.min())) < 1e-3
    # cv2 oracle for local contrast
    k = np.ones((15, 15), np.float32) / 225.0
    lm = cv2.filter2D(img, -1, k)
    lv = cv2.filter2D(img**2, -1, k) - lm**2
    ls = np.sqrt(np.maximum(lv, 0))
    assert abs(m["avg_local_contrast"] - ls.mean()) < 0.05
    # entropy oracle
    hist, _ = np.histogram(img, bins=256, range=(0, 255))
    p = hist / hist.sum()
    ent = -np.sum(p * np.log2(p + 1e-10))
    assert abs(m["entropy"] - ent) < 1e-3
    assert m["peak_prominence"] >= 0.0


def test_contrast_group_census(tmp_path, rng):
    from adipose_tpu.data.analysis import contrast_group_census

    root = tmp_path / "dataset"
    for split in ("train", "val", "test"):
        d = root / split / "images"
        d.mkdir(parents=True)
        for i in range(3):
            if i == 0:
                img = (100 + rng.randn(64, 64) * 3).astype(np.uint8)
            else:
                img = (rng.rand(64, 64) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{split}{i}.jpg"), img)
    out = tmp_path / "cg"
    summary = contrast_group_census(root, out, n_per_split=2)
    assert summary["n_images"] == 6
    assert set(summary["cutoffs"]) == {
        "contrast_ratio", "laplacian_variance", "avg_local_contrast"
    }
    for name in ("image_quality_analysis.csv", "contrast_analysis_grouping.png",
                 "adaptive_clahe_function.py", "adaptive_clahe_cutoffs.json",
                 "CONTRAST_GROUPING_ANALYSIS.md"):
        assert (out / name).exists(), name
    cuts = json.loads((out / "adaptive_clahe_cutoffs.json").read_text())
    cr = cuts["contrast_ratio"]
    assert cr["poor_cutoff"] <= cr["good_cutoff"]
    # generated module is importable and runs the adaptive op
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_adaptive", out / "adaptive_clahe_function.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.adaptive_clahe_normalization(
        (rng.rand(48, 48) * 255).astype(np.float32))
    assert res.shape == (48, 48) and res.max() <= 1.0


def test_preprocessing_pipeline_visualization(tmp_path, rng):
    from adipose_tpu.data.analysis import preprocessing_pipeline_visualization

    d = tmp_path / "tiles"
    d.mkdir()
    for i in range(3):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"t{i}.jpg"), img)
    out = preprocessing_pipeline_visualization(d, tmp_path / "viz", n_samples=2)
    from pathlib import Path

    assert Path(out["color"]).exists()
    assert Path(out["grayscale"]).exists()
    assert out["stats"]["std"] > 0


def test_adaptive_clahe_medium_branch(rng):
    """Medium arm: mild CLAHE (clip 1.5, grid 12) on a shape that is NOT a
    multiple of 12, exercising the reflect-pad + crop path."""
    from adipose_tpu.ops.clahe import adaptive_clahe_normalize

    # contrast ratio between the cutoffs (0.183, 0.267]: mean 100, std ~22
    mid = np.clip(100 + rng.randn(70, 85) * 22, 0, 255).astype(np.float32)
    cr = mid.std() / (mid.mean() + 1e-6)
    assert 0.183 <= cr  # sanity: not in the poor band
    out, strat = adaptive_clahe_normalize(mid)
    assert strat in ("medium", "good")
    if strat != "medium":  # force the medium arm deterministically
        cuts = {"contrast_ratio": {"poor_cutoff": 0.0, "good_cutoff": 10.0},
                "laplacian_variance": {"good_cutoff": 1e9}}
        out, strat = adaptive_clahe_normalize(mid, cuts)
        assert strat == "medium"
    assert out.shape == mid.shape
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    assert float(out.max()) - float(out.min()) > 0.5  # stretched, not constant


def test_normalization_comparison_modes(tmp_path, rng):
    """Each compare_*.py suite has a named mode emitting the reference's
    artifact set (per-sample panel PNG, metrics CSV, summary md)."""
    from adipose_tpu.data.analysis import (
        NORM_COMPARISON_MODES,
        normalization_comparison,
    )

    d = _make_tiles(tmp_path, rng, n=3)
    assert set(NORM_COMPARISON_MODES) == {
        "clahe-percentile", "normalization-methods", "requested-methods",
        "final-methods", "very-final"}
    out = normalization_comparison(d, tmp_path / "nc", "clahe-percentile",
                                   n_samples=1)
    assert out["n_samples"] == 1
    pngs = list((tmp_path / "nc").glob("*_clahe_percentile_comparison.png"))
    assert len(pngs) == 1
    assert (tmp_path / "nc" / "clahe_percentile_metrics.csv").exists()
    assert (tmp_path / "nc" /
            "CLAHE_PERCENTILE_COMPARISON_SUMMARY.md").exists()


def test_apply_norm_method_oracles(rng):
    """Percentile + z-score methods match the reference numpy formulas
    (compare_clahe_percentile.py:41-46, compare_requested_methods.py:40-43)."""
    from adipose_tpu.data.analysis import apply_norm_method

    img = (rng.rand(64, 64) * 255).astype(np.float32)
    got = apply_norm_method(img, None, (0.5, 99.5))
    lo, hi = np.percentile(img, (0.5, 99.5))
    want = np.clip((img - lo) / max(hi - lo, 1e-3), 0, 1)
    assert np.abs(got - want).max() < 1e-4
    z = apply_norm_method(img, "zscore", None)
    assert np.abs(z - (img - 200.99) / (25.26 + 1e-10)).max() < 1e-4
    orig = apply_norm_method(img, None, None)
    assert np.abs(orig - img / 255.0).max() < 1e-6


def test_comprehensive_normalization_analysis(tmp_path, rng):
    from adipose_tpu.data.analysis import (
        comprehensive_metrics,
        comprehensive_normalization_analysis,
    )

    # metrics oracle vs the reference formulas (comprehensive_normalization_
    # analysis.py:27-76) on a [0,1] image
    img = rng.rand(48, 48).astype(np.float32)
    m = comprehensive_metrics(img, "x")
    assert m["mean_intensity"] == np.float32(img.mean())
    u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    assert m["laplacian_variance"] == cv2.Laplacian(u8, cv2.CV_64F).var()
    edges = cv2.Canny(u8, 50, 150)
    assert m["edge_density"] == (edges > 0).sum() / edges.size
    hist, _ = np.histogram(img, bins=256, range=(0, 1))
    p = hist / (hist.sum() + 1e-10)
    assert abs(m["entropy"] - -(p * np.log2(p + 1e-10)).sum()) < 1e-3

    d = _make_tiles(tmp_path, rng, n=3)
    adip = tmp_path / "adip"
    adip.mkdir()
    for i in range(2):
        cv2.imwrite(str(adip / f"a{i}.jpg"),
                    (rng.rand(48, 48) * 200).astype(np.uint8))
    out = comprehensive_normalization_analysis(
        d, tmp_path / "comp", n_per_split=2, adipocyte_dir=adip)
    assert (tmp_path / "comp" / "dataset_normalization_metrics.csv").exists()
    assert (tmp_path / "comp" / "adipocyte_reference_metrics.csv").exists()
    assert (tmp_path / "comp" / "similarity_to_adipocytes.csv").exists()
    assert (tmp_path / "comp" /
            "comprehensive_normalization_analysis.png").exists()
    assert (tmp_path / "comp" /
            "COMPREHENSIVE_NORMALIZATION_REPORT.md").exists()
    import pandas as pd
    df = pd.read_csv(tmp_path / "comp" / "dataset_normalization_metrics.csv")
    assert set(df["method"]) == {"current_zscore", "clahe_percentile",
                                 "mild_clahe_percentile", "percentile_only"}
