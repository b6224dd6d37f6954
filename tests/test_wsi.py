"""WSI-layer tests: chunkers, ECM preprocessing, reconstruction parsing,
overlays, modality comparison, dual-model pipeline."""

import json
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.core.config import ECMPreprocessConfig, WSIChunkConfig
from adipose_tpu.wsi import compare, ecm, overlay, reconstruct
from adipose_tpu.wsi.chunker import (
    chunk_wsi_adaptive,
    chunk_wsi_grid,
    convert_16_to_8bit,
    generate_axis_segments,
)


class TestChunker:
    def test_axis_segments_cover_length(self):
        for length in (6144, 10000, 7000, 500, 13000):
            segs = generate_axis_segments(length)
            assert segs[0][0] == 0
            assert max(s + z for s, z in segs) == length
            # primary tiles are 6144, fallbacks are 1024-multiples ≤ 6144
            for start, size in segs:
                assert size <= 6144
                assert size % 1024 == 0 or size == length

    def test_axis_segments_empty(self):
        assert generate_axis_segments(0) == []

    def test_convert_16_to_8bit(self):
        img = np.array([[0, 65535], [32768, 16384]], np.uint16)
        out = convert_16_to_8bit(img)
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[0, 1] == 255

    def test_adaptive_chunker(self, tmp_path, rng):
        img = (rng.rand(2500, 3000) * 255).astype(np.uint8)
        src = tmp_path / "wsi.png"
        cv2.imwrite(str(src), img)
        cfg = WSIChunkConfig(primary_tile=1024, edge_multiple=512)
        out = chunk_wsi_adaptive(src, tmp_path / "chunks", cfg)
        assert out
        # coordinate-encoded names
        assert all("_x" in p.stem and "_y" in p.stem and "_w" in p.stem for p in out)
        # chunks reassemble the full extent
        max_x = max(int(p.stem.split("_x")[1].split("_")[0]) +
                    int(p.stem.split("_w")[1].split("_")[0]) for p in out)
        assert max_x == 3000

    def test_grid_chunker(self, tmp_path, rng):
        img = (rng.rand(2048, 2048) * 255).astype(np.uint8)
        src = tmp_path / "wsi.png"
        cv2.imwrite(str(src), img)
        cfg = WSIChunkConfig(grid_tile=512, grid_overlap=64)
        out = chunk_wsi_grid(src, tmp_path / "grid", cfg)
        assert out
        assert all("_grid_" in p.stem and "_tile_" in p.stem for p in out)
        # dry_run plans the same names without writing
        planned = chunk_wsi_grid(src, tmp_path / "grid_dry", cfg, dry_run=True)
        assert [p.name for p in planned] == [p.name for p in out]
        assert not list((tmp_path / "grid_dry").glob("*.jpg"))

    def test_chunk_directory_gates(self, tmp_path, rng):
        """Directory driver (..._MS.py:748-756): header-only gate skips small
        images; skip-existing skips already-chunked; dry-run writes nothing."""
        from adipose_tpu.wsi.chunker import chunk_directory

        big = (rng.rand(600, 700) * 255).astype(np.uint8)
        small = (rng.rand(100, 100) * 255).astype(np.uint8)
        src = tmp_path / "in"
        src.mkdir()
        cv2.imwrite(str(src / "big.png"), big)
        cv2.imwrite(str(src / "small.png"), small)
        cfg = WSIChunkConfig(primary_tile=512, edge_multiple=128,
                             max_dimension_px=256)
        out_dir = tmp_path / "out"
        plan = chunk_directory(src, out_dir, cfg, dry_run=True)
        assert [p["file"] for p in plan["processed"]] == ["big.png"]
        assert plan["skipped"] == [{"file": "small.png", "reason": "small"}]
        assert not list(out_dir.glob("*.jpg"))

        rep = chunk_directory(src, out_dir, cfg)
        assert rep["outputs"] and all(Path(o).exists() for o in rep["outputs"])
        rep2 = chunk_directory(src, out_dir, cfg, skip_existing=True)
        assert any(s.get("reason") == "exists" for s in rep2["skipped"])
        assert not rep2["processed"]


class TestECM:
    def test_pipeline_runs_all_stages(self, rng):
        img = (rng.rand(128, 128) * 200).astype(np.uint8)
        cfg = ECMPreprocessConfig(deband_method="fft", illumination_method="gaussian",
                                  apply_clahe=True, sharpen=True)
        out = ecm.preprocess_ecm_image(img, cfg)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_directory_driver_with_log(self, tmp_path, rng):
        (tmp_path / "in").mkdir()
        for i in range(3):
            cv2.imwrite(str(tmp_path / "in" / f"c{i}.jpg"),
                        (rng.rand(64, 64) * 255).astype(np.uint8))
        log = ecm.process_directory(tmp_path / "in", tmp_path / "out",
                                    ECMPreprocessConfig(deband_method="column_norm"))
        assert len(log["processed"]) == 3
        assert (tmp_path / "out" / "processing_log.json").exists()


class TestReconstructParsing:
    def test_parse_tile_filename(self):
        sid, r, c = reconstruct.parse_tile_filename(
            "6 BEEF Shoulder -1_grid_5x5_r1_c2_r0_c1.jpg"
        )
        assert sid == "6 BEEF Shoulder -1_grid_5x5_r1_c2"
        assert (r, c) == (0, 1)
        with pytest.raises(ValueError):
            reconstruct.parse_tile_filename("no_position.jpg")

    def test_group_and_coverage(self, tmp_path, rng):
        for r in range(2):
            for c in range(2):
                if (r, c) == (1, 1):
                    continue  # missing tile
                cv2.imwrite(str(tmp_path / f"s_r{r}_c{c}.jpg"),
                            (rng.rand(32, 32) * 255).astype(np.uint8))
        slides = reconstruct.group_tiles_by_slide(tmp_path)
        info = slides["s"]
        cov = reconstruct.coverage(info["positions"], info["row_range"], info["col_range"])
        assert cov == pytest.approx(3 / 4)

    def test_infer_dimensions(self):
        h, w = reconstruct.infer_full_image_dimensions({(0, 0), (1, 2)}, 64, 64)
        assert (h, w) == (128, 192)

    def test_striped_blend_matches_full(self, rng):
        """Striped (memory-bounded) blending must equal single-canvas blending."""
        from adipose_tpu.wsi.reconstruct import SlideReconstructor

        tiles = rng.rand(6, 32, 32).astype(np.float32)
        positions = np.array([[0, 0], [0, 32], [32, 0], [32, 32], [64, 0], [64, 32]],
                             np.int32)
        rec_full = SlideReconstructor(lambda p, t: t, None, 32, 32)
        rec_striped = SlideReconstructor(lambda p, t: t, None, 32, 32, stripe_tiles=1)
        a = rec_full._blend(tiles, positions, (96, 64))
        b = rec_striped._blend(tiles, positions, (96, 64))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5


class TestOverlay:
    def test_parse_two_level_coords(self):
        x, y = overlay.parse_two_level_coords("wsi_x2048_y1024_w6144_h6144_r1_c2.jpg", 1024)
        assert (x, y) == (2048 + 2 * 1024, 1024 + 1 * 1024)
        x, y = overlay.parse_two_level_coords("plain_r0_c3.jpg", 1024)
        assert (x, y) == (3072, 0)
        with pytest.raises(ValueError):
            overlay.parse_two_level_coords("nope.jpg")

    def test_categorize_and_combine(self):
        assert overlay.categorize(1, 1) == "TP"
        assert overlay.categorize(0, 1) == "FP"
        assert overlay.categorize(1, 0) == "FN"
        assert overlay.categorize(0, 0) == "TN"
        cats = {(0, 0): "FN", (1, 0): "TP", (0, 1): "TN", (1, 1): "FP"}
        combined = overlay.combine_patches(cats, 2)
        assert combined == {(0, 0): "TP"}  # TP wins the 2×2 block

    def test_render_overlay(self, rng):
        img = (rng.rand(256, 256) * 255).astype(np.uint8)
        results = [("s_r0_c0.jpg", 1, 1), ("s_r0_c1.jpg", 0, 1), ("s_r1_c0.jpg", 1, 0)]
        out = overlay.create_overlay(img, results, tile_size=64, downsample=1)
        assert out.shape[:2] == (256, 256)


class TestCompare:
    def test_ssim_identical_is_one(self, rng):
        a = (rng.rand(64, 64) * 255).astype(np.float32)
        assert float(compare.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_decreases_with_noise(self, rng):
        a = (rng.rand(64, 64) * 255).astype(np.float32)
        b = a + rng.randn(64, 64).astype(np.float32) * 50
        assert float(compare.ssim(jnp.asarray(a), jnp.asarray(b))) < 0.9

    def test_histogram_correlation(self, rng):
        a = (rng.rand(64, 64) * 255).astype(np.float32)
        assert float(compare.histogram_correlation(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)

    def test_metrics_resample_mismatched(self, rng):
        a = (rng.rand(64, 64) * 255).astype(np.uint8)
        b = cv2.resize(a, (32, 32))
        m = compare.compute_metrics(a, b)
        assert set(m) == {"mse", "ssim", "histogram_correlation"}

    def test_stratified_sample(self):
        out = compare.stratified_sample(list(range(100)), 10)
        assert len(out) == 10 and out[0] == 0 and out[-1] == 99

    def test_convert_tif_to_jpg(self, tmp_path):
        img = (np.random.rand(32, 32) * 65535).astype(np.uint16)
        src = tmp_path / "a.tif"
        cv2.imwrite(str(src), img)
        assert compare.convert_tif_to_jpg(src, tmp_path / "a.jpg")
        out = cv2.imread(str(tmp_path / "a.jpg"))
        assert out is not None and out.shape == (32, 32, 3)


class TestDualModelPipeline:
    def test_read_image_returns_rgb(self, tmp_path):
        """cv2.imread hands back BGR(A); _read_image must deliver run()'s
        RGB contract (channel-swapped luma shifted every color slide's QC
        before the r5 fix) and not crash on 4-channel PNGs."""
        import cv2

        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[..., 0] = 200  # red in RGB terms
        cv2.imwrite(str(tmp_path / "t.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        got = DualModelWSIPipeline._read_image(tmp_path / "t.png")
        assert np.array_equal(got, rgb)

        bgra = np.dstack([cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
                          np.full((8, 8), 255, np.uint8)])
        cv2.imwrite(str(tmp_path / "t4.png"), bgra)
        got4 = DualModelWSIPipeline._read_image(tmp_path / "t4.png")
        assert got4.shape == (8, 8, 3) and np.array_equal(got4, rgb)

    def test_cascade_gates_segmentation(self, rng):
        """Only classifier-positive tiles reach the segmenter."""
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        seg_calls = []

        def classifier(v, tiles):  # positive iff mean > 128
            return jnp.mean(tiles, axis=(1, 2)) / 255.0

        def segmenter(p, tiles):
            seg_calls.append(int(tiles.shape[0]))
            return jnp.ones_like(tiles) * 0.9

        img = np.full((128, 128), 40, np.uint8)   # dark = negative
        img[:64, :64] = 200                        # one bright quadrant
        img += rng.randint(0, 20, img.shape).astype(np.uint8)
        pipe = DualModelWSIPipeline(
            classifier, None, segmenter, None,
            tile_size=64, overlap=0.0, batch_size=4,
            blur_threshold=0.0,  # synthetic tiles are flat; disable blur gate
        )
        result = pipe.run(img)
        assert result.n_tiles == 4
        assert result.n_positive == 1
        # segmented region localized to the bright quadrant
        assert result.probability_map[:64, :64].mean() > 0.5
        assert result.probability_map[64:, 64:].mean() < 0.1

    def test_device_tiling_matches_host_tiling(self, rng):
        """Device-resident gather tiling ≡ host np.stack tiling (same map)."""
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        img = (rng.rand(160, 160) * 255).astype(np.uint8)
        kw = dict(tile_size=64, overlap=0.25, batch_size=4, blur_threshold=0.0)

        def classifier(v, t):
            return jnp.mean(t, axis=(1, 2)) / 255.0

        def segmenter(p, t):
            return jax.nn.sigmoid((t - 100.0) / 50.0)

        dev = DualModelWSIPipeline(classifier, None, segmenter, None,
                                   device_tiling=True, **kw).run(img)
        host = DualModelWSIPipeline(classifier, None, segmenter, None,
                                    device_tiling=False, **kw).run(img)
        assert dev.n_tiles == host.n_tiles
        assert dev.n_positive == host.n_positive
        np.testing.assert_allclose(
            dev.probability_map, host.probability_map, atol=1e-6)

    def test_uint8_transfer_matches_quantized_float(self, rng):
        """transfer_dtype='uint8' returns the exact PNG payload: equal to the
        float32 path quantized with the artifact arithmetic."""
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        img = (rng.rand(128, 128) * 255).astype(np.uint8)
        kw = dict(tile_size=64, overlap=0.25, batch_size=4, blur_threshold=0.0)

        def classifier(v, t):
            return jnp.ones(t.shape[0])

        def segmenter(p, t):
            return jax.nn.sigmoid((t - 100.0) / 50.0)

        f32 = DualModelWSIPipeline(classifier, None, segmenter, None,
                                   transfer_dtype="float32", **kw).run(img)
        u8 = DualModelWSIPipeline(classifier, None, segmenter, None,
                                  transfer_dtype="uint8", **kw).run(img)
        assert f32.probability_u8 is None
        assert u8.probability_u8 is not None
        assert u8.probability_u8.dtype == np.uint8
        expected = (np.clip(f32.probability_map, 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(u8.probability_u8, expected)
        # the returned float map is the dequantized payload
        np.testing.assert_allclose(
            u8.probability_map, u8.probability_u8 / 255.0, atol=1e-7)

    def test_run_many_matches_sequential_runs(self, rng):
        """The 1-deep pipelined multi-chunk driver (run_many) produces
        exactly the per-chunk run() outputs — only timing attribution
        changes (pipelined=True, segment_s dispatch-only)."""
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        def classifier(v, t):
            return jnp.mean(t, axis=(1, 2)) / 255.0

        def segmenter(p, t):
            return jax.nn.sigmoid((t - 100.0) / 50.0)

        base = (rng.rand(160, 160) * 255).astype(np.uint8)
        base[96:, :] //= 4  # dark band -> some negative tiles
        chunks = [base, np.ascontiguousarray(base[::-1]),
                  np.ascontiguousarray(base[:, ::-1])]
        for dtype in ("uint8", "float32"):
            pipe = DualModelWSIPipeline(
                classifier, None, segmenter, None,
                tile_size=64, overlap=0.25, batch_size=4,
                blur_threshold=0.0, transfer_dtype=dtype)
            seq = [pipe.run(c) for c in chunks]
            piped = pipe.run_many(chunks)
            assert len(piped) == len(seq)
            for s, p in zip(seq, piped):
                assert (s.n_tiles, s.n_good, s.n_positive) == \
                    (p.n_tiles, p.n_good, p.n_positive)
                np.testing.assert_array_equal(
                    s.probability_map, p.probability_map)
                if dtype == "uint8":
                    np.testing.assert_array_equal(
                        s.probability_u8, p.probability_u8)
                assert p.timings["pipelined"] and not s.timings["pipelined"]
                assert "blend_s" in p.timings and "segment_s" in p.timings

    def test_wsum_cache_across_chunk_sizes(self, rng):
        """One pipeline instance caches the blend weight canvas per padded
        shape; mixed-size chunks through the same instance must still match
        fresh-instance runs (guards the cache keying)."""
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        def classifier(v, t):
            return jnp.ones(t.shape[0])

        def segmenter(p, t):
            return jax.nn.sigmoid((t - 100.0) / 50.0)

        kw = dict(tile_size=64, overlap=0.25, batch_size=4,
                  blur_threshold=0.0)
        imgs = [(rng.rand(160, 160) * 255).astype(np.uint8),
                (rng.rand(112, 112) * 255).astype(np.uint8),  # padded to 64²+
                (rng.rand(160, 160) * 255).astype(np.uint8)]
        shared = DualModelWSIPipeline(classifier, None, segmenter, None, **kw)
        got = [shared.run(i) for i in imgs] + shared.run_many(imgs)
        for r, img in zip(got, imgs + imgs):
            fresh = DualModelWSIPipeline(
                classifier, None, segmenter, None, **kw).run(img)
            np.testing.assert_allclose(
                r.probability_map, fresh.probability_map, atol=1e-6)

    def test_run_files_streams_chunk_directory(self, tmp_path, rng):
        """run_files writes per-chunk artifacts + a directory-level log via
        the pipelined driver, matching run_file outputs chunk-for-chunk."""
        import json

        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        def classifier(v, t):
            return jnp.ones(t.shape[0])

        def segmenter(p, t):
            return jax.nn.sigmoid((t - 100.0) / 50.0)

        chunk_dir = tmp_path / "chunks"
        chunk_dir.mkdir()
        paths = []
        for i in range(3):
            img = (rng.rand(128, 128) * 255).astype(np.uint8)
            p = chunk_dir / f"slide_x{i * 128}_y0_w128_h128.png"
            cv2.imwrite(str(p), img)
            paths.append(p)

        pipe = DualModelWSIPipeline(
            classifier, None, segmenter, None,
            tile_size=64, overlap=0.25, batch_size=4,
            blur_threshold=0.0, transfer_dtype="uint8")
        out_many = tmp_path / "out_many"
        summaries = pipe.run_files(paths, out_many, threshold=0.5)
        assert len(summaries) == 3
        log = json.loads((out_many / "pipeline_log.json").read_text())
        assert log["n_chunks"] == 3
        assert log["n_tiles"] == sum(s["n_tiles"] for s in summaries)
        out_single = tmp_path / "out_single"
        for p in paths:
            pipe.run_file(p, out_single, threshold=0.5)
        for p in paths:
            for suffix in ("probability", "mask"):
                a = cv2.imread(str(out_many / f"{p.stem}_{suffix}.png"), 0)
                b = cv2.imread(str(out_single / f"{p.stem}_{suffix}.png"), 0)
                np.testing.assert_array_equal(a, b)

    def test_striped_finalize_matches_oracle(self, rng):
        """The stripe-pipelined finalize+download (multi-chunk, mid-loop
        stripe flushes, mixed gating, clamped last row/col) reproduces the
        full-canvas blend computed directly in numpy."""
        from adipose_tpu.ops import blend as B
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        img = (rng.rand(200, 136) * 255).astype(np.uint8)
        img[120:, :] //= 4  # dark bottom band -> negative tiles there
        t, ov, th = 64, 0.25, 0.4

        def classifier(v, tiles):
            return jnp.mean(tiles, axis=(1, 2)) / 255.0

        def segmenter(p, tiles):
            return jax.nn.sigmoid((tiles - 100.0) / 30.0)

        pipe = DualModelWSIPipeline(
            classifier, None, segmenter, None,
            tile_size=t, overlap=ov, batch_size=3, classifier_threshold=th,
            white_threshold=256.0, blur_threshold=0.0,  # QC passes all
            transfer_dtype="uint8")
        res = pipe.run(img)

        positions = B.sliding_window_positions(img.shape, t, ov)
        wm = np.asarray(B.gaussian_weight_map(t, 0.25), np.float32)
        acc = np.zeros(img.shape, np.float32)
        ws = np.zeros(img.shape, np.float32)
        n_pos = 0
        for y, x in positions:
            tile = img[y:y + t, x:x + t].astype(np.float32)
            ws[y:y + t, x:x + t] += wm
            if tile.mean() / 255.0 >= th:
                n_pos += 1
                pred = 1.0 / (1.0 + np.exp(-(tile - 100.0) / 30.0))
                acc[y:y + t, x:x + t] += pred * wm
        expected = acc / np.maximum(ws, 1e-8)
        exp_u8 = (np.clip(expected, 0, 1) * 255.0).astype(np.uint8)

        assert res.n_positive == n_pos and 0 < n_pos < res.n_tiles
        # +-1 u8 step: the truncating *255 cast can flip at integer
        # boundaries between np.exp and the device sigmoid
        diff = res.probability_u8.astype(int) - exp_u8.astype(int)
        assert np.abs(diff).max() <= 1 and (diff == 0).mean() > 0.99
        np.testing.assert_allclose(res.probability_map,
                                   res.probability_u8 / 255.0, atol=1e-7)

    def test_run_file_uint8_writes_payload_verbatim(self, tmp_path, rng):
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        img = (rng.rand(128, 128) * 255).astype(np.uint8)
        src = tmp_path / "slide.png"
        cv2.imwrite(str(src), img)
        pipe = DualModelWSIPipeline(
            lambda v, t: jnp.ones(t.shape[0]), None,
            lambda p, t: jax.nn.sigmoid((t - 100.0) / 50.0), None,
            tile_size=64, batch_size=4, blur_threshold=0.0,
            transfer_dtype="uint8",
        )
        result = pipe.run_file(src, tmp_path / "out")
        png = cv2.imread(str(tmp_path / "out" / "slide_probability.png"),
                         cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(png, result.probability_u8)

    def test_run_file_outputs(self, tmp_path, rng):
        from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

        img = (rng.rand(128, 128) * 255).astype(np.uint8)
        src = tmp_path / "slide.png"
        cv2.imwrite(str(src), img)
        pipe = DualModelWSIPipeline(
            lambda v, t: jnp.ones(t.shape[0]),
            None,
            lambda p, t: jnp.ones_like(t) * 0.7,
            None,
            tile_size=64, batch_size=4, blur_threshold=0.0,
        )
        result = pipe.run_file(src, tmp_path / "out")
        assert (tmp_path / "out" / "slide_probability.png").exists()
        assert (tmp_path / "out" / "slide_mask.png").exists()
        log = json.loads((tmp_path / "out" / "slide_pipeline_log.json").read_text())
        assert log["n_tiles"] == 4


def test_reconstruct_all_slides_output_knobs(tmp_path, rng):
    """reconstruct_all_slides honors the reference's output controls
    (reconstruct_full_images.py:894-928): blend mode, max-tiles dir naming
    + grid limiting, overlay/comparison artifacts, save-masks gate."""
    import jax

    from adipose_tpu.wsi.reconstruct import reconstruct_all_slides

    img_dir = tmp_path / "imgs"
    msk_dir = tmp_path / "msks"
    img_dir.mkdir()
    msk_dir.mkdir()
    for r in range(2):
        for c in range(2):
            img = (rng.rand(32, 32) * 200).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"sl_r{r}_c{c}.jpg"), img)
            cv2.imwrite(str(msk_dir / f"sl_r{r}_c{c}.tif"),
                        ((rng.rand(32, 32) > 0.6) * 255).astype(np.uint8))

    def predict(p, tiles):
        return jax.nn.sigmoid((tiles - 100.0) / 50.0)

    log = reconstruct_all_slides(
        img_dir, msk_dir, tmp_path / "out", predict, None,
        tile_size=32, stride=32, blend_mode="linear", max_tiles=1,
        save_overlays=True, save_comparisons=True, save_masks=False,
        batch_size=2,
    )
    out = tmp_path / "out_1x1"  # max-tiles encoded in the dir name (:603-605)
    assert out.exists() and "sl" in log["slides"]
    slide = out / "sl"
    assert (slide / "prediction.png").exists()
    assert (slide / "overlay.png").exists()
    assert (slide / "comparison_4panel.png").exists()
    assert not (slide / "binary_mask.png").exists()  # --no-save-masks
    # max_tiles=1 limits to the top-left tile
    pred = cv2.imread(str(slide / "prediction.png"), cv2.IMREAD_UNCHANGED)
    assert pred.shape == (32, 32)


def test_reconstruct_fused_blend_matches_legacy(rng):
    """Device-fused predict+blend must be bit-identical to the two-pass path."""
    import jax

    from adipose_tpu.wsi.reconstruct import SlideReconstructor

    def predict(p, tiles):
        return jax.nn.sigmoid((tiles - 100.0) / 50.0)

    rec = SlideReconstructor(predict, None, tile_size=32, stride=16, batch_size=4)
    tiles = (rng.rand(11, 32, 32) * 200).astype(np.float32)
    positions = np.asarray(
        [(r * 16, c * 16) for r in range(3) for c in range(4)][:11], np.int32)
    fused = rec._predict_and_blend(tiles, positions, (64, 80))
    legacy = rec._blend(rec._predict_batch(tiles), positions, (64, 80))
    assert np.abs(fused - legacy).max() == 0.0
