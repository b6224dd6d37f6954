"""Native tileops bindings, stain-reference selection, eval visualizations."""

import json

import cv2
import numpy as np
import pytest

from adipose_tpu.core import native
from adipose_tpu.data import stain_select
from adipose_tpu.eval import visualize


class TestNative:
    def test_library_loads(self):
        # g++ is in this image; the lib builds on demand
        assert native.available()

    def test_polygon_fill_close_to_cv2(self):
        poly = np.array([[10, 10], [50, 12], [48, 52], [12, 50]], np.int32)
        ours = native.fill_polygons([poly], 64, 64)
        ref = np.zeros((64, 64), np.uint8)
        cv2.fillPoly(ref, [poly.reshape(-1, 1, 2)], 1)
        # interiors identical; only boundary-pixel conventions may differ
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.sum() < 0.05 * ref.sum()
        interior = cv2.erode(ref, np.ones((3, 3), np.uint8))
        assert np.all(ours[interior > 0] == 1)

    def test_u16_conversion_exact(self, rng):
        img = (rng.rand(64, 64) * 65535).astype(np.uint16)
        a = native.convert_u16_to_u8(img)
        lo, hi = int(img.min()), int(img.max())
        b = ((img.astype(np.float32) - lo) / (hi - lo) * 255).astype(np.uint8)
        assert np.array_equal(a, b)

    @pytest.mark.parametrize("span", [7, 14, 28, 41, 56])
    def test_u16_conversion_adversarial_ranges(self, span):
        # Ranges where a precomputed 255/(hi-lo) scale rounds the max pixel
        # to 254 instead of 255 (r3 advisor finding); the LUT form must match
        # numpy's exact operation order including the hi pixel.
        img = np.arange(0, span + 1, dtype=np.uint16).reshape(1, -1)
        a = native.convert_u16_to_u8(img)
        b = ((img.astype(np.float32) - 0) / span * 255).astype(np.uint8)
        assert np.array_equal(a, b)
        assert a.max() == 255

    def test_u16_conversion_sweep_many_ranges(self, rng):
        for _ in range(200):
            lo = int(rng.randint(0, 60000))
            span = int(rng.randint(1, 5536))
            x = rng.randint(lo, lo + span + 1, size=97).astype(np.uint16)
            x[0], x[1] = lo, lo + span  # pin the extremes
            got = native.convert_u16_to_u8(x)
            exp = ((x.astype(np.float32) - lo) / span * 255).astype(np.uint8)
            assert np.array_equal(got, exp), (lo, span)

    def test_extract_tiles(self, rng):
        img = (rng.rand(256, 256) * 255).astype(np.uint8)
        pos = np.array([[0, 0], [64, 128], [192, 192]], np.int32)
        tiles = native.extract_tiles(img, pos, 64)
        for i, (y, x) in enumerate(pos):
            assert np.array_equal(tiles[i], img[y : y + 64, x : x + 64])

    def test_blend_accumulate_matches_numpy(self, rng):
        acc = np.zeros((96, 96), np.float32)
        wsum = np.zeros_like(acc)
        tiles = rng.rand(3, 32, 32).astype(np.float32)
        w = rng.rand(32, 32).astype(np.float32)
        pos = np.array([[0, 0], [16, 48], [64, 64]], np.int32)
        native.blend_accumulate(acc, wsum, tiles, w, pos)
        acc2 = np.zeros_like(acc)
        ws2 = np.zeros_like(acc)
        for tile, (y, x) in zip(tiles, pos):
            acc2[y : y + 32, x : x + 32] += tile * w
            ws2[y : y + 32, x : x + 32] += w
        assert np.abs(acc - acc2).max() < 1e-5
        assert np.abs(wsum - ws2).max() < 1e-5

    def test_tile_stats(self, rng):
        tiles = (rng.rand(4, 32, 32) * 255).astype(np.uint8)
        wr, mean, var = native.tile_stats(tiles)
        f = tiles.astype(np.float64).reshape(4, -1)
        assert np.abs(wr - (f >= 235).mean(1)).max() < 1e-6
        assert np.abs(mean - f.mean(1)).max() < 1e-3
        assert np.abs(var - f.var(1)).max() < 1e-2


class TestStainSelect:
    @pytest.fixture
    def candidates(self, tmp_path, rng):
        d = tmp_path / "cands"
        d.mkdir()
        for i in range(4):
            # pinkish tissue with golden blobs and texture
            img = np.zeros((128, 128, 3), np.uint8)
            img[..., 0] = 220
            img[..., 1] = 170 + rng.randint(-20, 20, (128, 128))
            img[..., 2] = 190
            cv2.circle(img, (40 + 10 * i, 60), 25, (230, 200, 60), -1)
            cv2.imwrite(str(d / f"cand{i}.jpg"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        return d

    def test_selector_writes_metadata(self, candidates, tmp_path):
        meta = stain_select.select_stain_reference(candidates, tmp_path / "out")
        assert (tmp_path / "out" / "stain_reference_metadata.json").exists()
        assert (tmp_path / "out" / "stain_reference_selection_report.md").exists()
        assert 0.0 <= meta["selected_reference"]["composite_score"] <= 1.0
        assert set(meta["lab_statistics"]) == {"L", "A", "B"}
        # metadata is loadable by the stain module
        from adipose_tpu.ops.stain import LabStats

        s = LabStats.from_metadata(tmp_path / "out" / "stain_reference_metadata.json")
        assert len(s.mean) == 3

    def test_validator(self, candidates, tmp_path):
        meta = stain_select.select_stain_reference(candidates, tmp_path / "out")
        summary = stain_select.validate_stain_reference(
            tmp_path / "out" / "stain_reference_metadata.json",
            candidates, tmp_path / "val",
        )
        assert summary["n_samples"] == 4
        assert (tmp_path / "val" / "stain_validation_report.json").exists()

    def test_composite_score_monotone_in_quality(self):
        base = {
            "laplacian_variance": 0.1, "entropy": 6.0,
            "local_contrast_consistency": 0.5, "edge_density": 0.02,
            "lab_stats": {"L": {"std": 10}, "A": {"std": 10}, "B": {"std": 8.0}},
            "stain_separation": {"separation_score": 500.0},
            "color_balance": {"balance_score": 0.3},
            "adipocyte_coverage": 0.3, "structure_variety": 1.5,
            "background_quality": 0.8,
        }
        better = dict(base)
        better["entropy"] = 7.5
        s0 = stain_select.composite_score(base)["composite_score"]
        s1 = stain_select.composite_score(better)["composite_score"]
        assert s1 > s0


class TestVisualize:
    def test_dice_buckets(self):
        assert visualize.dice_bucket(0.3) == "poor"
        assert visualize.dice_bucket(0.6) == "fair"
        assert visualize.dice_bucket(0.7) == "good"
        assert visualize.dice_bucket(0.9) == "excellent"

    def test_4panel_written(self, tmp_path, rng):
        img = (rng.rand(64, 64) * 255).astype(np.uint8)
        gt = (rng.rand(64, 64) > 0.7).astype(np.float32)
        pred = rng.rand(64, 64).astype(np.float32)
        out = visualize.create_4panel_visualization(img, gt, pred, 0.42,
                                                    tmp_path / "v.png")
        panel = cv2.imread(str(out))
        assert panel.shape == (128, 128, 3)

    def test_discrepancy_colors(self):
        pred = np.array([[1, 1], [0, 0]], np.float32)
        true = np.array([[1, 0], [1, 0]], np.float32)
        d = visualize.discrepancy_map(pred, true)
        assert tuple(d[0, 0]) == (0, 200, 0)     # TP green
        assert tuple(d[0, 1]) == (220, 0, 0)     # FP red
        assert tuple(d[1, 0]) == (0, 0, 220)     # FN blue
        assert tuple(d[1, 1]) == (0, 0, 0)       # TN black

    def test_bucketed_dump(self, tmp_path, rng):
        imgs = [(rng.rand(32, 32) * 255).astype(np.uint8) for _ in range(3)]
        preds = [rng.rand(32, 32).astype(np.float32) for _ in range(3)]
        trues = [(rng.rand(32, 32) > 0.5).astype(np.float32) for _ in range(3)]
        counts = visualize.save_bucketed_visualizations(
            imgs, preds, trues, [0.2, 0.7, 0.9], ["a.jpg", "b.jpg", "c.jpg"],
            tmp_path,
        )
        assert counts == {"poor": 1, "good": 1, "excellent": 1}
        assert (tmp_path / "poor").exists()
