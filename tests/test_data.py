"""Data-layer tests: on-device augmentation, rasterization, tile planning,
dataset builder end-to-end on synthetic slides."""

import json

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.core.config import DataBuildConfig
from adipose_tpu.data import augment, rasterize, stats
from adipose_tpu.data.loader import ClassificationDataset, TileDataset
from adipose_tpu.data.tiling import (
    SegmentationDatasetBuilder,
    SlideSource,
    discover_slides,
    find_most_recent_build_dir,
    tile_coords,
)


class TestAugment:
    @pytest.fixture
    def pair(self, rng):
        img = jnp.asarray((rng.rand(64, 64) * 255).astype(np.float32))
        mask = jnp.asarray((rng.rand(64, 64) > 0.7).astype(np.float32))
        return img, mask

    def test_all_tiers_preserve_shapes_and_ranges(self, pair):
        img, mask = pair
        for tier, fn in augment.TIERS.items():
            ai, am = fn(jax.random.PRNGKey(1), img, mask)
            assert ai.shape == img.shape, tier
            assert am.shape == mask.shape, tier
            ai, am = np.asarray(ai), np.asarray(am)
            assert ai.min() >= 0 and ai.max() <= 255, tier
            assert set(np.round(np.unique(am), 3)) <= {0.0, 1.0}, tier

    def test_deterministic_given_key(self, pair):
        img, mask = pair
        a1 = augment.augment_pair_moderate(jax.random.PRNGKey(5), img, mask)
        a2 = augment.augment_pair_moderate(jax.random.PRNGKey(5), img, mask)
        assert np.array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    def test_different_keys_differ(self, pair):
        img, mask = pair
        a1 = augment.augment_pair_heavy(jax.random.PRNGKey(1), img, mask)
        a2 = augment.augment_pair_heavy(jax.random.PRNGKey(2), img, mask)
        assert not np.array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    def test_geometry_applied_jointly(self, rng):
        """Rotations/flips must keep image and mask aligned."""
        img = jnp.asarray(np.arange(64 * 64, dtype=np.float32).reshape(64, 64) % 251)
        mask = (img > 125).astype(jnp.float32)
        for key in range(6):
            ai, am = augment.augment_pair_light(jax.random.PRNGKey(key), img, mask)
            # light tier: only rot/flip/brightness; thresholding the augmented
            # image must reproduce the augmented mask wherever brightness
            # didn't cross the threshold — use correlation instead of equality
            corr = np.corrcoef(
                (np.asarray(ai) > np.median(np.asarray(ai))).ravel(),
                np.asarray(am).ravel(),
            )[0, 1]
            assert corr > 0.9

    def test_batch_augment(self, rng):
        imgs = jnp.asarray((rng.rand(4, 32, 32) * 255).astype(np.float32))
        masks = jnp.asarray((rng.rand(4, 32, 32) > 0.5).astype(np.float32))
        ai, am = augment.augment_batch(jax.random.PRNGKey(0), imgs, masks, "moderate")
        assert ai.shape == (4, 32, 32)
        # per-sample keys: members differ from each other
        assert not np.array_equal(np.asarray(ai[0]), np.asarray(ai[1]))

    def test_classification_augment(self, rng):
        img = jnp.asarray((rng.rand(64, 64) * 255).astype(np.float32))
        out = augment.augment_grayscale_classification(jax.random.PRNGKey(3), img)
        assert out.shape == img.shape

    def test_batched_tier_bit_identical_to_per_sample(self, rng):
        """The batch path (batch-level D4 + vmapped rest) must replay the
        per-sample tier functions' key tree exactly — bit-identical outputs,
        so the TPU layout fix cannot silently change training data."""
        imgs = jnp.asarray((rng.rand(4, 32, 32) * 255).astype(np.float32))
        masks = jnp.asarray((rng.rand(4, 32, 32) > 0.5).astype(np.float32))
        key = jax.random.PRNGKey(11)
        for tier in ["none", "light", "moderate", "heavy", "tta_style"]:
            keys = jax.random.split(key, 4)
            want = jax.vmap(augment.TIERS[tier])(keys, imgs, masks)
            got = augment.batched_tier(key, imgs, masks, tier)
            for w, g in zip(want, got):
                assert np.array_equal(np.asarray(w), np.asarray(g)), tier

    def test_batched_classification_bit_identical(self, rng):
        imgs = jnp.asarray((rng.rand(4, 32, 32) * 255).astype(np.float32))
        key = jax.random.PRNGKey(12)
        keys = jax.random.split(key, 4)
        want = jax.vmap(augment.augment_grayscale_classification)(keys, imgs)
        got = augment.batched_classification(key, imgs)
        assert np.array_equal(np.asarray(want), np.asarray(got))

    def test_batched_classification_grouped_bit_identical(self, rng):
        """Megabatched prep (K stacked train-batches, one aug stage) must
        replay exactly the per-batch draws — the classifier trainer's
        megabatching changes dispatch granularity, never values."""
        K, B = 3, 4
        imgs = jnp.asarray((rng.rand(K * B, 32, 32) * 255).astype(np.float32))
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(100, 100 + K))
        want = jnp.concatenate([
            augment.batched_classification(keys[k], imgs[k * B:(k + 1) * B])
            for k in range(K)
        ])
        got = augment.batched_classification_grouped(keys, imgs)
        assert np.array_equal(np.asarray(want), np.asarray(got))

    def test_keys_for_batch_range_replays_key_for(self):
        """The one-program epoch key schedule must equal the per-iteration
        key_for + split draws it replaced (trainer_classifier epoch loop)."""
        from adipose_tpu.core.seeding import key_for, keys_for_batch_range

        idxs = 7 * 100003 + np.arange(5)
        pairs = keys_for_batch_range("cls.p1", 865, idxs)
        for i, b in enumerate(idxs):
            want = np.asarray(jax.random.split(key_for("cls.p1", 865, int(b))))
            assert np.array_equal(pairs[i], want), b

    def test_random_d4_uniform_over_group(self):
        """random_d4 replaces the reference's rot90+flip composition; the 16
        (k, lr, ud) combos hit each D4 element exactly twice, so a uniform
        id ∈ [0, 8) is the same distribution (PARITY.md)."""
        marker = jnp.asarray(
            np.arange(16, dtype=np.float32).reshape(4, 4))
        seen = set()
        for i in range(256):
            img, _ = augment.random_d4(
                jax.random.PRNGKey(i), marker, marker)
            seen.add(tuple(np.asarray(img).ravel().tolist()))
        assert len(seen) == 8  # all 8 distinct D4 images occur

    def test_elastic_preserves_mean(self, pair):
        img, mask = pair
        di, dm = augment.elastic_transform(jax.random.PRNGKey(0), img, mask)
        assert abs(float(jnp.mean(di)) - float(jnp.mean(img))) < 10.0

    def test_warp_axis_matches_gather_oracle(self, rng):
        """The static-shift warp must equal a take_along_axis bilinear warp."""
        img = jnp.asarray(rng.rand(32, 32).astype(np.float32))
        delta = jnp.asarray((rng.rand(32, 32) * 6 - 3).astype(np.float32))
        got = augment._warp_axis(img, delta, 0, 1, 4)
        # oracle: bilinear with EDGE-mode coordinates (sample positions clamp
        # at the border, the standard 'nearest'/edge warp convention)
        base = np.arange(32, dtype=np.float32)[:, None]
        coords = np.asarray(delta) + base
        c0 = np.floor(coords)
        f = coords - c0
        i0 = np.clip(c0.astype(int), -1, 32)
        im_pad = np.pad(np.asarray(img), ((1, 1), (0, 0)), mode="edge")
        cols = np.arange(32)
        a = im_pad[np.clip(i0 + 1, 0, 33), cols]
        b = im_pad[np.clip(i0 + 2, 0, 33), cols]
        want = a * (1 - f) + b * f
        assert np.abs(np.asarray(got) - want).max() < 1e-5

    def test_warp_axis_nearest(self, rng):
        img = jnp.asarray(rng.rand(16, 16).astype(np.float32))
        delta = jnp.asarray(np.full((16, 16), 2.0, np.float32))
        got = np.asarray(augment._warp_axis(img, delta, 1, 0, 3))
        want = np.asarray(img)[:, np.clip(np.arange(16) + 2, 0, 15)]
        assert np.array_equal(got, want)

    def test_scale_mxu_matches_interp_oracle(self, rng):
        """The MXU separable resample must equal direct bilinear sampling of
        the zoom coordinates (in-range region)."""
        img = jnp.asarray(rng.rand(32, 32).astype(np.float32))
        mask = jnp.asarray((rng.rand(32, 32) > 0.5).astype(np.float32))
        # force apply with a key whose uniform < prob
        for key in range(20):
            k = jax.random.PRNGKey(key)
            k1, k2 = jax.random.split(k)
            if float(jax.random.uniform(k1)) <= 1.0:
                break
        got_img, got_mask = augment.random_scale(k, img, mask, (1.1, 1.1), prob=1.0)
        # oracle via scipy
        from scipy.ndimage import map_coordinates as mc

        c = (32 - 1) / 2.0
        src = (np.arange(32) - c) / 1.1 + c
        yy, xx = np.meshgrid(src, src, indexing="ij")
        want = mc(np.asarray(img), [yy, xx], order=1, mode="nearest")
        assert np.abs(np.asarray(got_img) - want).max() < 1e-3
        assert set(np.unique(np.asarray(got_mask))) <= {0.0, 1.0}

    def test_select_tier(self):
        assert augment.select_tier(100) == "heavy"
        assert augment.select_tier(300) == "moderate"
        assert augment.select_tier(1000) == "light"


class TestRasterize:
    def make_annotation(self, tmp_path, polys_conf):
        """polys_conf: list of (points, confidence|None)."""
        records = []
        for pts, conf in polys_conf:
            rec = {"annotation": {"elements": [
                {"type": "polyline", "points": [[float(x), float(y)] for x, y in pts]}
            ]}}
            if conf is not None:
                rec["confidenceScore"] = conf
            records.append(rec)
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(records))
        return p

    def test_confidence_filtering(self, tmp_path):
        square = [(10, 10), (30, 10), (30, 30), (10, 30)]
        p = self.make_annotation(tmp_path, [(square, 1), (square, 3)])
        polys, missing = rasterize.load_json_annotations(p, min_confidence=2)
        assert len(polys) == 1
        assert not missing
        polys, _ = rasterize.load_json_annotations(p, min_confidence=1)
        assert len(polys) == 2

    def test_missing_confidence_included_and_flagged(self, tmp_path):
        square = [(0, 0), (5, 0), (5, 5)]
        p = self.make_annotation(tmp_path, [(square, None)])
        polys, missing = rasterize.load_json_annotations(p, min_confidence=3)
        assert len(polys) == 1 and missing

    def test_binary_mask_matches_cv2(self, tmp_path):
        square = np.array([(10, 10), (30, 10), (30, 30), (10, 30)])
        mask = rasterize.create_binary_mask([square], 64, 64)
        assert mask[20, 20] == 1 and mask[5, 5] == 0
        assert mask.sum() == pytest.approx(21 * 21, rel=0.05)

    def test_tile_annotations_local_coords(self, tmp_path):
        square = [(100, 100), (120, 100), (120, 120), (100, 120)]
        p = self.make_annotation(tmp_path, [(square, 2)])
        polys, low_only = rasterize.get_tile_annotations(p, (96, 96, 160, 160), 1)
        assert len(polys) == 1 and not low_only
        assert polys[0].min() >= 0 and polys[0].max() <= 64

    def test_low_confidence_only_flag(self, tmp_path):
        square = [(10, 10), (20, 10), (20, 20)]
        p = self.make_annotation(tmp_path, [(square, 1)])
        _, low_only = rasterize.get_tile_annotations(p, (0, 0, 64, 64), 3)
        assert low_only

    def test_prepare_target_mask_subtracts_bubbles(self):
        fat = np.zeros((64, 64), np.uint8)
        fat[10:40, 10:40] = 1
        bubbles = np.zeros_like(fat)
        bubbles[20:30, 20:30] = 1
        out = rasterize.prepare_target_mask(fat, bubbles, close_kernel=1,
                                            min_component_area=0)
        assert out[15, 15] == 1 and out[25, 25] == 0

    def test_remove_small_components(self):
        m = np.zeros((64, 64), np.uint8)
        m[5:8, 5:8] = 1      # 9 px
        m[20:40, 20:40] = 1  # 400 px
        out = rasterize.remove_small_components(m, 50)
        assert out[6, 6] == 0 and out[30, 30] == 1


class TestTiling:
    def test_tile_coords_cover_edges(self):
        coords = tile_coords(100, 150, 64, 64)
        ys = {c[2] for c in coords}
        xs = {c[3] for c in coords}
        assert max(ys) + 64 == 100  # bottom edge covered (clamped)
        assert max(xs) + 64 == 150
        assert tile_coords(50, 50, 64, 64) == []  # too small

    @pytest.fixture
    def synthetic_slides(self, tmp_path, rng):
        """Two synthetic 192² slides with polygon annotations."""
        pseudo = tmp_path / "Pseudocolored"
        fat_dir = tmp_path / "Masks" / "fat"
        pseudo.mkdir(parents=True)
        fat_dir.mkdir(parents=True)
        for s in range(2):
            img = (rng.rand(192, 192) * 80 + 100).astype(np.uint8)
            # fat blob region drawn brighter
            cv2.circle(img, (96, 96), 40, 255, -1)
            cv2.imwrite(str(pseudo / f"slide{s}.jpg"), img)
            square = [[60.0, 60.0], [130.0, 60.0], [130.0, 130.0], [60.0, 130.0]]
            (fat_dir / f"slide{s}.json").write_text(json.dumps([
                {"confidenceScore": 3,
                 "annotation": {"elements": [{"type": "polyline", "points": square}]}}
            ]))
        return tmp_path

    def test_discover_slides(self, synthetic_slides):
        slides = discover_slides(synthetic_slides)
        assert len(slides) == 2
        assert all(s.fat_json is not None for s in slides)

    def test_builder_end_to_end(self, synthetic_slides):
        cfg = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.5,
                              test_fraction=0.0, negative_fraction=0.4)
        builder = SegmentationDatasetBuilder(cfg, out_parent=synthetic_slides)
        build_root = builder.build(synthetic_slides)
        assert (build_root / "build_log.json").exists()
        assert (build_root / "build_summary.txt").exists()
        counts = builder.stats.split_counts
        total = sum(counts.values())
        assert total > 0
        # tile naming contract {base}_r{ri}_c{ci}
        some = next((build_root / "dataset" / "train" / "images").glob("*.jpg"), None) or \
               next((build_root / "dataset" / "val" / "images").glob("*.jpg"))
        assert "_r" in some.stem and "_c" in some.stem
        # images pair with masks by stem
        for split, n in counts.items():
            imgs = list((build_root / "dataset" / split / "images").glob("*.jpg"))
            masks = {p.stem for p in (build_root / "dataset" / split / "masks").glob("*.tif")}
            assert len(imgs) == n
            assert all(p.stem in masks for p in imgs)
        # a loadable dataset results
        tds = TileDataset(build_root / "dataset" / "train" / "images",
                          build_root / "dataset" / "train" / "masks", 2)
        imgs, masks = next(tds.epoch_batches(0))
        assert imgs.shape == (2, 64, 64)

    def test_fused_rgb_qc_matches_host_flow(self, rng):
        """The single-upload fused Reinhard→QC→grayscale device program
        (r5, tunnel-bandwidth fix) must reproduce the prior unfused flow
        bit-exactly: Reinhard → astype(u8) truncation → QC on the truncated
        tile → cv2.cvtColor grayscale."""
        import jax.numpy as jnp

        from adipose_tpu.data.tiling import _device_rgb_qc_jit
        from adipose_tpu.ops.qc import classify_tiles_batch
        from adipose_tpu.ops.stain import DEFAULT_REFERENCE, reinhard_normalize_batch

        tiles = (rng.rand(3, 64, 64, 3) * 255).astype(np.uint8)
        tiles[0, :16] = 255  # white patch
        ref_mean, ref_std = DEFAULT_REFERENCE.as_arrays()
        for stain in (False, True):
            gray, v = _device_rgb_qc_jit(
                jnp.asarray(tiles), jnp.asarray(ref_mean),
                jnp.asarray(ref_std), 235.0, 0.70, 7.5, stain=stain)
            # old flow: host round-trip then separate QC + cv2 grayscale
            if stain:
                out = reinhard_normalize_batch(
                    jnp.asarray(tiles.astype(np.float32) / 255.0),
                    ref_mean, ref_std)
                host_tiles = np.asarray(out * 255.0).astype(np.uint8)
            else:
                host_tiles = tiles
            want_v = classify_tiles_batch(
                jnp.asarray(host_tiles.astype(np.float32)), 235.0, 0.70, 7.5)
            for k in ("white_ratio", "laplacian_var"):
                np.testing.assert_allclose(
                    np.asarray(v[k]), np.asarray(want_v[k]), rtol=1e-6)
            for k in ("is_empty", "is_blurry", "is_good"):
                assert np.array_equal(np.asarray(v[k]), np.asarray(want_v[k]))
            want_gray = np.stack([
                cv2.cvtColor(t, cv2.COLOR_RGB2GRAY) for t in host_tiles])
            assert np.array_equal(np.asarray(gray), want_gray), f"stain={stain}"

    def test_negative_fraction(self, synthetic_slides):
        cfg = DataBuildConfig(tile_size=64, stride=64, negative_fraction=0.4,
                              val_fraction=0.0, test_fraction=0.0)
        builder = SegmentationDatasetBuilder(cfg, out_parent=synthetic_slides)
        builder.build(synthetic_slides)
        s = builder.stats
        if s.tiles_kept_neg > 0:
            frac = s.tiles_kept_neg / (s.tiles_kept_pos + s.tiles_kept_neg)
            assert frac <= 0.45

    def test_builder_reference_artifacts_and_knobs(self, synthetic_slides):
        """Mask/QA artifact layout + reuse (build_dataset.py:966-1194):
        masks/<target>/<base>.tif written, overlays/ with --make-overlays,
        --no-make-masks reuses an edited mask file."""
        cfg = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.5,
                              test_fraction=0.0, make_overlays=True)
        builder = SegmentationDatasetBuilder(cfg, out_parent=synthetic_slides)
        root = builder.build(synthetic_slides)
        assert (root / "masks" / "fat" / "slide0.tif").exists()
        assert (root / "overlays" / "slide0_overlay.jpg").exists()

        # edit slide0's mask to all-zero; --no-make-masks must reuse it
        z = np.zeros((192, 192), np.uint8)
        cv2.imwrite(str(root / "masks" / "fat" / "slide0.tif"), z)
        cfg2 = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.5,
                               test_fraction=0.0, make_masks=False)
        b2 = SegmentationDatasetBuilder(cfg2, build_root=root)
        m = b2.build_slide_mask(discover_slides(synthetic_slides)[0])
        assert m.sum() == 0

    def test_builder_white_routing_and_subtract(self, tmp_path, rng):
        """White tiles leave the dataset but land in tiles/empty QA with
        keep_white (build_dataset.py:1401-1546); --drop-white discards them;
        --no-subtract keeps the subtract-class area in the target mask."""
        pseudo = tmp_path / "Pseudocolored"
        fat_dir = tmp_path / "Masks" / "fat"
        bub_dir = tmp_path / "Masks" / "bubbles"
        for d in (pseudo, fat_dir, bub_dir):
            d.mkdir(parents=True)
        img = np.full((128, 128), 250, np.uint8)  # mostly white slide
        img[64:, :] = (rng.rand(64, 128) * 60 + 80).astype(np.uint8)
        cv2.imwrite(str(pseudo / "s.jpg"), img)
        sq = lambda x1, y1, x2, y2: [[float(x1), float(y1)], [float(x2), float(y1)],
                                     [float(x2), float(y2)], [float(x1), float(y2)]]
        ann = lambda pts: json.dumps([{"confidenceScore": 3, "annotation":
                                       {"elements": [{"type": "polyline",
                                                      "points": pts}]}}])
        (fat_dir / "s.json").write_text(ann(sq(10, 70, 120, 120)))
        (bub_dir / "s.json").write_text(ann(sq(10, 70, 60, 120)))

        cfg = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.0,
                              test_fraction=0.0)
        b = SegmentationDatasetBuilder(cfg, out_parent=tmp_path)
        root = b.build(tmp_path)
        empties = list((root / "tiles" / "empty").glob("*.jpg"))
        assert empties, "white tiles should be QA-routed"
        # dataset only contains tissue tiles
        assert all("_r1_" in p.stem for p in
                   (root / "dataset" / "train" / "images").glob("*.jpg"))

        cfg_drop = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.0,
                                   test_fraction=0.0, keep_white=False)
        b2 = SegmentationDatasetBuilder(cfg_drop,
                                        build_root=tmp_path / "_build_drop")
        root2 = b2.build(tmp_path)
        assert not (root2 / "tiles" / "empty").exists()

        # subtraction halves the fat mask; --no-subtract restores it
        m_sub = b.build_slide_mask(discover_slides(tmp_path)[0])
        cfg_ns = DataBuildConfig(subtract=False)
        b3 = SegmentationDatasetBuilder(cfg_ns, out_parent=tmp_path)
        m_full = b3.build_slide_mask(discover_slides(tmp_path)[0])
        assert m_full.sum() > m_sub.sum()

    def test_builder_test_split_knobs(self, tmp_path, rng):
        """External test slides: test_neg_pct keeps all negatives,
        include_ambiguous keeps sub-threshold tiles as zero-mask negatives,
        exclude_test_duplicates drops main-folder copies
        (build_dataset.py:1591-1630, :1941-1944)."""
        pseudo = tmp_path / "Pseudocolored"
        test_dir = pseudo / "test"
        fat_dir = tmp_path / "Masks" / "fat"
        for d in (pseudo, test_dir, fat_dir):
            d.mkdir(parents=True, exist_ok=True)
        img = (rng.rand(128, 128) * 60 + 80).astype(np.uint8)
        cv2.imwrite(str(test_dir / "t1.jpg"), img)
        cv2.imwrite(str(pseudo / "t1.jpg"), img)  # duplicate of a test slide
        cv2.imwrite(str(pseudo / "m1.jpg"), img)
        # tiny annotation: ~1.5% coverage in tile (0,0) -> ambiguous
        pts = [[5.0, 5.0], [13.0, 5.0], [13.0, 13.0], [5.0, 13.0]]
        payload = json.dumps([{"confidenceScore": 3, "annotation":
                               {"elements": [{"type": "polyline", "points": pts}]}}])
        (fat_dir / "t1.json").write_text(payload)
        (fat_dir / "m1.json").write_text(payload)

        cfg = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.0,
                              test_fraction=0.0, include_test_set=True,
                              include_ambiguous=True,
                              test_min_mask_ratio=0.05)
        b = SegmentationDatasetBuilder(cfg, out_parent=tmp_path)
        root = b.build(tmp_path)
        slides = discover_slides(tmp_path, include_test_set=True)
        bases = [(s.base, s.is_test) for s in slides]
        assert ("t1", True) in bases and ("t1", False) not in bases
        test_masks = list((root / "dataset" / "test" / "masks").glob("t1_*.tif"))
        assert test_masks, "test tiles present"
        # ambiguous test tile kept as zero-mask negative
        r0c0 = root / "dataset" / "test" / "masks" / "t1_r0_c0.tif"
        assert r0c0.exists()
        assert cv2.imread(str(r0c0), cv2.IMREAD_UNCHANGED).sum() == 0
        # train split ambiguous tile excluded (same geometry, ambiguous_high)
        assert not (root / "dataset" / "train" / "masks" / "m1_r0_c0.tif").exists()

    def test_builder_tile_level_split(self, tmp_path, rng):
        """--no-split-by-slide: one slide's tiles straddle train/val —
        impossible under slide grouping (build_dataset.py:179, :1710-1745)."""
        pseudo = tmp_path / "Pseudocolored"
        fat_dir = tmp_path / "Masks" / "fat"
        pseudo.mkdir(parents=True)
        fat_dir.mkdir(parents=True)
        img = (rng.rand(192, 192) * 60 + 80).astype(np.uint8)
        cv2.imwrite(str(pseudo / "only.jpg"), img)
        sq = [[10.0, 10.0], [180.0, 10.0], [180.0, 180.0], [10.0, 180.0]]
        (fat_dir / "only.json").write_text(json.dumps([
            {"confidenceScore": 3,
             "annotation": {"elements": [{"type": "polyline", "points": sq}]}}
        ]))
        cfg = DataBuildConfig(tile_size=64, stride=64, val_fraction=0.5,
                              test_fraction=0.0, split_by_slide=False,
                              negative_fraction=0.0)
        b = SegmentationDatasetBuilder(cfg, out_parent=tmp_path)
        b.build(tmp_path)
        assert b.stats.split_counts["train"] > 0
        assert b.stats.split_counts["val"] > 0

    def test_build_test_dataset_cli(self, tmp_path, rng):
        """Isolated test-set builder (build_test_dataset.py): everything
        routes to dataset/test with the test gates; build_summary.json."""
        from adipose_tpu.cli.main import COMMANDS, build_parser

        img_dir = tmp_path / "imgs"
        fat_dir = tmp_path / "anns" / "fat"
        img_dir.mkdir()
        fat_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.rand(128, 128) * 60 + 80).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"t{i}.jpg"), img)
            sq = [[10.0, 10.0], [120.0, 10.0], [120.0, 120.0], [10.0, 120.0]]
            (fat_dir / f"t{i}.json").write_text(json.dumps([
                {"confidenceScore": 3,
                 "annotation": {"elements": [{"type": "polyline", "points": sq}]}}
            ]))
        parser = build_parser()
        args = parser.parse_args([
            "build-test-dataset", "--images-dir", str(img_dir),
            "--masks-dir", str(tmp_path / "anns"),
            "--output-dir", str(tmp_path / "out"),
            "--tile-size", "64", "--stride", "64", "--no-stain-normalize",
        ])
        COMMANDS[args.command](args)
        build = next((tmp_path / "out").iterdir())
        assert (build / "build_summary.json").exists()
        tiles = list((build / "dataset" / "test" / "images").glob("*.jpg"))
        assert tiles, "all tiles must land in test"
        assert not list((build / "dataset" / "train" / "images").glob("*.jpg"))

        # classification variant: test split folders, no balancing
        args = parser.parse_args([
            "build-test-class-dataset", "--images-dir", str(img_dir),
            "--masks-dir", str(tmp_path / "anns"),
            "--output-dir", str(tmp_path / "out_cls"),
            "--tile-size", "64", "--stride", "64",
            "--stain-normalize", "false",  # required, as in the reference
        ])
        COMMANDS[args.command](args)
        build = next((tmp_path / "out_cls").iterdir())
        n_pos = len(list((build / "dataset" / "test" / "adipose").glob("*.jpg")))
        assert n_pos > 0
        assert (build / "dataset" / "test_manifest.csv").exists()

    def test_find_most_recent_build_dir(self, tmp_path):
        (tmp_path / "_build_20240101_000000").mkdir()
        (tmp_path / "_build_20250101_000000").mkdir()
        assert find_most_recent_build_dir(tmp_path).name == "_build_20250101_000000"
        with pytest.raises(FileNotFoundError):
            find_most_recent_build_dir(tmp_path / "nope")


class TestLoaders:
    def test_tile_dataset_epoch_determinism(self, tmp_path, rng):
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(5):
            cv2.imwrite(str(tmp_path / "images" / f"t_r{i}_c0.jpg"),
                        (rng.rand(16, 16) * 255).astype(np.uint8))
            cv2.imwrite(str(tmp_path / "masks" / f"t_r{i}_c0.tif"),
                        (rng.rand(16, 16) > 0.5).astype(np.uint8) * 255)
        ds = TileDataset(tmp_path / "images", tmp_path / "masks", 2, seed=1)
        b1 = [i.sum() for i, _ in ds.epoch_batches(0)]
        b2 = [i.sum() for i, _ in ds.epoch_batches(0)]
        assert b1 == b2  # same epoch ⇒ same order
        b3 = [i.sum() for i, _ in ds.epoch_batches(1)]
        assert b1 != b3 or len(b1) == 1

    def test_classification_dataset(self, tmp_path, rng):
        for cls in ("adipose", "not_adipose"):
            (tmp_path / "train" / cls).mkdir(parents=True)
            for i in range(3):
                cv2.imwrite(str(tmp_path / "train" / cls / f"s_r{i}_c0.jpg"),
                            (rng.rand(16, 16) * 255).astype(np.uint8))
        ds = ClassificationDataset(tmp_path / "train", 4)
        assert len(ds) == 6
        assert ds.class_counts() == (3, 3)
        imgs, labels = next(ds.epoch_batches(0))
        assert imgs.shape == (4, 16, 16)
        assert set(labels) <= {0.0, 1.0}


class TestStats:
    def test_streaming_mean_std(self, tmp_path, rng):
        paths = []
        pixels = []
        for i in range(3):
            a = (rng.rand(32, 32) * 255).astype(np.uint8)
            p = tmp_path / f"{i}.png"
            cv2.imwrite(str(p), a)
            paths.append(p)
            pixels.append(cv2.imread(str(p), cv2.IMREAD_GRAYSCALE).ravel())
        allpix = np.concatenate(pixels).astype(np.float64)
        mean, std = stats.compute_mean_std(paths)
        assert mean == pytest.approx(allpix.mean(), abs=1e-6)
        assert std == pytest.approx(allpix.std(), abs=1e-6)

    def test_empty_fallback(self):
        assert stats.compute_mean_std([]) == (127.5, 50.0)


class TestMontage:
    def test_matches_reference_loop_oracle(self, rng):
        """Vectorized montage == the reference's per-cell placement loop
        (isbi_utils.py:20-26) with the same RNG shuffle."""
        from adipose_tpu.data.montage import montage_pairs

        n, h, w, rows, cols = 7, 8, 6, 2, 3
        imgs = (rng.rand(n, h, w) * 255).astype(np.uint8)
        msks = (rng.rand(n, h, w) > 0.5).astype(np.uint8) * 255

        got_i, got_m = montage_pairs(imgs, msks, rows, cols,
                                     np.random.RandomState(865))

        idxs = np.arange(n)
        np.random.RandomState(865).shuffle(idxs)
        it = iter(idxs)
        want_i = np.empty((rows * h, cols * w), np.float32)
        want_m = np.empty((rows * h, cols * w), np.int8)
        for y0 in range(0, rows * h, h):
            for x0 in range(0, cols * w, w):
                k = next(it)
                want_i[y0:y0 + h, x0:x0 + w] = imgs[k]
                want_m[y0:y0 + h, x0:x0 + w] = msks[k] / 255
        assert got_i.dtype == np.float32 and got_m.dtype == np.int8
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_array_equal(got_m, want_m)

    def test_file_roundtrip_multipage_tiff(self, tmp_path, rng):
        from PIL import Image

        from adipose_tpu.data.montage import isbi_get_data_montage

        imgs = (rng.rand(4, 8, 8) * 255).astype(np.uint8)
        msks = (rng.rand(4, 8, 8) > 0.5).astype(np.uint8) * 255
        ip, mp = tmp_path / "imgs.tif", tmp_path / "msks.tif"
        for path, stack in ((ip, imgs), (mp, msks)):
            frames = [Image.fromarray(s) for s in stack]
            frames[0].save(path, save_all=True, append_images=frames[1:])

        mi, mm = isbi_get_data_montage(ip, mp, 2, 2,
                                       np.random.RandomState(0))
        assert mi.shape == (16, 16) and mm.shape == (16, 16)
        assert set(np.unique(mm)) <= {0, 1}

    def test_too_few_pages_raises(self, rng):
        from adipose_tpu.data.montage import montage_pairs

        with pytest.raises(ValueError):
            montage_pairs(np.zeros((3, 4, 4)), np.zeros((3, 4, 4)), 2, 2,
                          np.random.RandomState(0))


class TestPrefetch:
    def test_prefetch_yields_same_batches(self):
        from adipose_tpu.data.loader import prefetch_batches

        batches = [(np.full((2, 4, 4), i, np.uint8), np.zeros((2, 4, 4)))
                   for i in range(7)]
        got = list(prefetch_batches(iter(batches), depth=2))
        assert len(got) == 7
        for (gi, _), (wi, _) in zip(got, batches):
            assert np.array_equal(gi, wi)

    def test_prefetch_propagates_errors(self):
        from adipose_tpu.data.loader import prefetch_batches

        def gen():
            yield 1
            raise RuntimeError("decode failed")

        it = prefetch_batches(gen(), depth=2)
        assert next(it) == 1
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="decode failed"):
            next(it)

    def test_prefetch_early_break_stops_worker(self):
        import threading

        from adipose_tpu.data.loader import prefetch_batches

        produced = []

        def gen():
            for i in range(1000):
                produced.append(i)
                yield i

        before = threading.active_count()
        for x in prefetch_batches(gen(), depth=2):
            if x >= 3:
                break
        # bounded queue: the worker can't have run far ahead
        assert len(produced) < 20
        import time
        for _ in range(50):  # worker drains and exits
            if threading.active_count() <= before:
                break
            time.sleep(0.05)

    def test_tile_dataset_parallel_decode_deterministic(self, tmp_path, rng):
        import cv2

        img_dir = tmp_path / "images"; img_dir.mkdir()
        mask_dir = tmp_path / "masks"; mask_dir.mkdir()
        for i in range(9):
            cv2.imwrite(str(img_dir / f"t{i}.png"),
                        (rng.rand(16, 16) * 255).astype(np.uint8))
            cv2.imwrite(str(mask_dir / f"t{i}.tif"),
                        (rng.rand(16, 16) > 0.5).astype(np.uint8) * 255)
        ds = TileDataset(img_dir, mask_dir, batch_size=4, seed=7)
        a = [b for b in ds.epoch_batches(0)]
        ds2 = TileDataset(img_dir, mask_dir, batch_size=4, seed=7, cache=False)
        b = [bb for bb in ds2.epoch_batches(0)]
        assert len(a) == len(b) == 3  # 9 tiles -> 3 padded batches
        for (ia, ma), (ib, mb) in zip(a, b):
            assert np.array_equal(ia, ib) and np.array_equal(ma, mb)

    def test_tile_cache_byte_bounded(self, tmp_path, rng):
        """Cache admission stops at the byte budget (reference caps at
        cache_size pairs, train_adipose_unet_v3.py:560-561 — same
        insert-if-room policy, budgeted in bytes); results stay correct
        for uncached tiles."""
        import cv2

        img_dir = tmp_path / "images"; img_dir.mkdir()
        mask_dir = tmp_path / "masks"; mask_dir.mkdir()
        for i in range(8):
            cv2.imwrite(str(img_dir / f"t{i}.png"),
                        (rng.rand(32, 32) * 255).astype(np.uint8))
            cv2.imwrite(str(mask_dir / f"t{i}.tif"),
                        (rng.rand(32, 32) > 0.5).astype(np.uint8) * 255)
        # one pair = 32*32 img + 32*32 mask = 2048 B; budget 3 pairs
        from adipose_tpu.data.loader import _BoundedCache

        ds = TileDataset(img_dir, mask_dir, batch_size=4, seed=7)
        ds._cache = _BoundedCache(3 * 2048)
        full = [b for b in ds.epoch_batches(0)]
        assert len(ds._cache) == 3  # admission stopped at the budget
        again = [b for b in ds.epoch_batches(0)]  # mixed cached/uncached
        for (ia, ma), (ib, mb) in zip(full, again):
            assert np.array_equal(ia, ib) and np.array_equal(ma, mb)
        # cache_limit_mb=0 disables caching entirely
        ds0 = TileDataset(img_dir, mask_dir, batch_size=4, seed=7,
                          cache_limit_mb=0)
        assert ds0._cache is None


class TestShardedAugment:
    """The mesh-aware batch paths (shard_map per 'data' shard — the
    multi-chip form, since the D4 layout pin is a Pallas custom call GSPMD
    cannot partition) must be bit-identical to the unsharded paths."""

    def test_batched_tier_sharded_matches_unsharded(self, rng):
        from adipose_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        imgs = jnp.asarray((rng.rand(8, 32, 32) * 255).astype(np.float32))
        masks = jnp.asarray((rng.rand(8, 32, 32) > 0.5).astype(np.float32))
        key = jax.random.PRNGKey(21)
        for tier in ["moderate", "heavy", "tta_style"]:
            want = augment.batched_tier(key, imgs, masks, tier)
            got = augment.batched_tier(key, imgs, masks, tier, mesh=mesh)
            for w, g in zip(want, got):
                assert np.array_equal(np.asarray(w), np.asarray(g)), tier

    def test_batched_classification_sharded_matches_unsharded(self, rng):
        from adipose_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        imgs = jnp.asarray((rng.rand(8, 32, 32) * 255).astype(np.float32))
        key = jax.random.PRNGKey(22)
        want = augment.batched_classification(key, imgs)
        got = augment.batched_classification(key, imgs, mesh=mesh)
        assert np.array_equal(np.asarray(want), np.asarray(got))

    def test_indivisible_batch_falls_back(self, rng):
        from adipose_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        imgs = jnp.asarray((rng.rand(3, 32, 32) * 255).astype(np.float32))
        masks = jnp.asarray((rng.rand(3, 32, 32) > 0.5).astype(np.float32))
        key = jax.random.PRNGKey(23)
        want = augment.batched_tier(key, imgs, masks, "moderate")
        got = augment.batched_tier(key, imgs, masks, "moderate", mesh=mesh)
        for w, g in zip(want, got):
            assert np.array_equal(np.asarray(w), np.asarray(g))

    def test_model_axis_mesh_also_goes_pershard(self, rng):
        """A spatial mesh with data=1, model>1 still spans >1 device — the
        Pallas layout pin must go per shard there too (GSPMD cannot
        partition custom calls regardless of which axis is sharded)."""
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()).reshape(1, 8)
        mesh = Mesh(devs, ("data", "model"))
        from adipose_tpu.ops.normalize import mesh_needs_pershard

        assert mesh_needs_pershard(mesh, 4)
        imgs = jnp.asarray((rng.rand(4, 32, 32) * 255).astype(np.float32))
        masks = jnp.asarray((rng.rand(4, 32, 32) > 0.5).astype(np.float32))
        key = jax.random.PRNGKey(31)
        want = augment.batched_tier(key, imgs, masks, "moderate")
        got = augment.batched_tier(key, imgs, masks, "moderate", mesh=mesh)
        for w, g in zip(want, got):
            assert np.array_equal(np.asarray(w), np.asarray(g))

    def test_unknown_tier_raises(self):
        with pytest.raises(KeyError):
            augment.batched_tier(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8)),
                                 jnp.zeros((2, 8, 8)), "modrate")
