"""D4 group involution tests + blender conservation tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops import blend, d4


class TestD4:
    def test_matches_reference_transform_ids(self, rng):
        """Ids must match src/utils/data.py:299-317 exactly."""
        x = rng.rand(8, 8).astype(np.float32)

        def ref(tid, a):
            if tid == 0:
                return a
            if tid in (1, 2, 3):
                return np.rot90(a, tid)
            a = np.fliplr(a)
            if tid == 4:
                return a
            return np.rot90(a, tid - 4)

        for tid in range(8):
            got = np.asarray(d4.apply_transform(jnp.asarray(x), tid))
            assert np.array_equal(got, ref(tid, x)), f"transform {tid}"

    def test_batched_transform_matches_per_sample(self, rng):
        """apply_transform_batch's flip/transpose factorization must equal the
        lax.switch form for every id (mixed ids within one batch)."""
        import jax

        x = jnp.asarray(rng.rand(8, 16, 16).astype(np.float32))
        for tid in range(8):
            want = np.stack([np.asarray(d4.apply_transform(im, tid)) for im in x])
            got = np.asarray(d4.apply_transform_batch(x, jnp.full((8,), tid)))
            assert np.array_equal(got, want), f"transform {tid}"
        tids = jnp.asarray(rng.randint(0, 8, 8))
        want = np.stack([
            np.asarray(d4.apply_transform(im, int(t))) for im, t in zip(x, tids)])
        assert np.array_equal(np.asarray(d4.apply_transform_batch(x, tids)), want)
        # batched inverse roundtrip
        y = d4.apply_transform_batch(x, tids)
        back = d4.invert_transform_batch(y, tids)
        assert np.array_equal(np.asarray(back), np.asarray(x))
        # non-square batches are rejected (the factorization needs H == W)
        with pytest.raises(ValueError):
            d4.apply_transform_batch(jnp.zeros((2, 8, 16)), jnp.zeros((2,), jnp.int32))

    def test_involution(self, rng):
        x = jnp.asarray(rng.rand(16, 16).astype(np.float32))
        for tid in range(8):
            back = d4.invert_transform(d4.apply_transform(x, tid), tid)
            assert np.array_equal(np.asarray(back), np.asarray(x)), f"transform {tid}"

    def test_expand_collapse_identity(self, rng):
        x = jnp.asarray(rng.rand(16, 16).astype(np.float32))
        views = d4.expand_tta(x)
        assert views.shape == (8, 16, 16)
        merged = d4.collapse_tta(views)
        assert np.abs(np.asarray(merged) - np.asarray(x)).max() < 1e-6

    def test_mode_ids_match_reference_sets(self, rng):
        """'basic' must contain identity, fliplr, flipud, rot90
        (full_evaluation_enhanced.py:556-561)."""
        x = rng.rand(6, 6).astype(np.float32)
        expected = {
            0: x,
            4: np.fliplr(x),
            6: np.flipud(x),
            1: np.rot90(x, 1),
        }
        for tid, want in expected.items():
            got = np.asarray(d4.apply_transform(jnp.asarray(x), tid))
            assert np.array_equal(got, want), f"id {tid}"
        assert set(d4.MODE_IDS["basic"]) == {0, 4, 6, 1}
        assert d4.MODE_IDS["minimal"] == (0, 4)

    def test_channels_preserved(self, rng):
        x = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
        out = d4.apply_transform(x, 5)
        assert out.shape == (8, 8, 3)


class TestBlend:
    def test_gaussian_weight_map_properties(self):
        wm = np.asarray(blend.gaussian_weight_map(64))
        assert wm.max() == pytest.approx(1.0)
        assert wm[32, 32] > wm[0, 0]  # center-peaked
        # matches reference formula (full_evaluation_enhanced.py:133-148)
        sigma = 64 * 0.25
        y, x = np.ogrid[0:64, 0:64]
        d2 = (x - 32.0) ** 2 + (y - 32.0) ** 2
        want = np.exp(-d2 / (2 * sigma**2))
        want /= want.max()
        assert np.abs(wm - want).max() < 1e-5

    def test_constant_tiles_blend_to_constant(self):
        """Conservation: blending constant tiles must return that constant."""
        t = 32
        tiles = np.full((4, t, t), 0.7, np.float32)
        positions = np.array([[0, 0], [0, 16], [16, 0], [16, 16]], np.int32)
        out = np.asarray(blend.blend_tiles_gaussian(tiles, positions, (48, 48)))
        assert np.abs(out - 0.7).max() < 1e-5

    def test_linear_blend_is_average(self):
        t = 16
        tiles = np.stack([np.zeros((t, t)), np.ones((t, t))]).astype(np.float32)
        positions = np.array([[0, 0], [0, 0]], np.int32)
        out = np.asarray(blend.blend_tiles_linear(tiles, positions, (t, t)))
        assert np.abs(out - 0.5).max() < 1e-6

    def test_matches_reference_accumulator(self, rng):
        """Oracle: the reference's explicit accumulate/normalize loop."""
        t = 16
        tiles = rng.rand(3, t, t).astype(np.float32)
        positions = np.array([[0, 0], [4, 8], [10, 2]], np.int32)
        h = w = 32
        wm = np.asarray(blend.gaussian_weight_map(t))
        acc = np.zeros((h, w), np.float32)
        wsum = np.zeros((h, w), np.float32)
        for tile, (y, x) in zip(tiles, positions):
            acc[y:y+t, x:x+t] += tile * wm
            wsum[y:y+t, x:x+t] += wm
        want = acc / np.maximum(wsum, 1e-8)
        got = np.asarray(blend.blend_tiles_gaussian(tiles, positions, (h, w)))
        assert np.abs(got - want).max() < 1e-5

    def test_sliding_positions_match_reference(self):
        """Oracle re-implementation of extract_tile_positions
        (full_evaluation_enhanced.py:240-273)."""
        import math
        for (h, w, tile, overlap) in [(100, 100, 64, 0.5), (64, 64, 64, 0.5),
                                      (200, 150, 64, 0.25), (300, 300, 128, 0.75)]:
            got = blend.sliding_window_positions((h, w), tile, overlap)
            ov = max(0.0, min(overlap, 0.75))
            stride = int(tile * (1 - ov))
            ys = max(1, math.ceil((h - tile) / stride) + 1)
            xs = max(1, math.ceil((w - tile) / stride) + 1)
            want = []
            for yi in range(ys):
                for xi in range(xs):
                    y = min(yi * stride, h - tile)
                    x = min(xi * stride, w - tile)
                    if y >= 0 and x >= 0 and y + tile <= h and x + tile <= w:
                        want.append((y, x))
            assert got.tolist() == [list(p) for p in want]

    def test_extract_tiles(self, rng):
        img = jnp.asarray(rng.rand(64, 64).astype(np.float32))
        pos = jnp.asarray([[0, 0], [32, 32]], jnp.int32)
        tiles = np.asarray(blend.extract_tiles(img, pos, 32))
        assert np.array_equal(tiles[0], np.asarray(img)[:32, :32])
        assert np.array_equal(tiles[1], np.asarray(img)[32:, 32:])

    def test_blend_roundtrip_extract(self, rng):
        """Extract overlapping tiles from an image then blend ⇒ original."""
        img = rng.rand(96, 96).astype(np.float32)
        positions = blend.sliding_window_positions((96, 96), 32, 0.5)
        tiles = blend.extract_tiles(jnp.asarray(img), jnp.asarray(positions), 32)
        out = np.asarray(blend.blend_tiles_gaussian(np.asarray(tiles), positions, (96, 96)))
        assert np.abs(out - img).max() < 1e-4
