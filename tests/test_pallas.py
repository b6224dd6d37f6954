"""Pallas kernel tests (interpret mode on CPU) vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops.pallas.preprocess import (
    fused_zscore_normalize,
    histogram_u8,
    percentile_normalize_u8,
)


@pytest.fixture
def tiles(rng):
    return (rng.rand(3, 64, 64) * 255).astype(np.uint8)


def test_fused_zscore(tiles):
    out, stats = fused_zscore_normalize(jnp.asarray(tiles), 127.0, 50.0)
    out, stats = np.asarray(out), np.asarray(stats)
    f = tiles.astype(np.float64)
    want = (f - 127.0) / (50.0 + 1e-10)
    assert np.abs(out - want).max() < 1e-3
    for i in range(3):
        assert stats[i, 0] == pytest.approx(f[i].mean(), abs=1e-2)
        assert stats[i, 1] == pytest.approx(f[i].std(), abs=1e-2)
        assert stats[i, 2] == pytest.approx((f[i] >= 235).mean(), abs=1e-6)


def test_histogram_exact(tiles):
    hist = np.asarray(histogram_u8(jnp.asarray(tiles)))
    for i in range(3):
        want = np.bincount(tiles[i].ravel(), minlength=256)
        assert np.array_equal(hist[i].astype(int), want)


def test_percentile_normalize_matches_numpy(tiles):
    got = np.asarray(percentile_normalize_u8(jnp.asarray(tiles), 1.0, 99.0))
    for i in range(3):
        f = tiles[i].astype(np.float64)
        plow, phigh = np.percentile(f, (1.0, 99.0))
        want = np.clip((f - plow) / max(phigh - plow, 1e-3), 0, 1)
        assert np.abs(got[i] - want).max() < 1e-5


def test_percentile_fractional_input_rounds_to_bins(rng):
    """PARITY §Known deviations: fractional inputs (16-bit-TIFF-origin floats)
    round to the nearest u8 bin; the result equals the exact path on the
    rounded data and stays within the quantization bound of the float path."""
    frac = (rng.rand(2, 64, 64) * 255).astype(np.float32)
    got = np.asarray(percentile_normalize_u8(jnp.round(jnp.asarray(frac)),
                                             1.0, 99.0))
    for i in range(2):
        r = np.round(frac[i]).astype(np.float64)
        plow, phigh = np.percentile(r, (1.0, 99.0))
        want = np.clip((r - plow) / max(phigh - plow, 1e-3), 0, 1)
        assert np.abs(got[i] - want).max() < 1e-5
        # vs the exact float percentile path: within the u8 quantization bound
        f = frac[i].astype(np.float64)
        pl, ph = np.percentile(f, (1.0, 99.0))
        exact = np.clip((f - pl) / max(ph - pl, 1e-3), 0, 1)
        assert np.abs(got[i] - exact).max() < 2.0 / 255.0


def test_percentile_constant_tile():
    flat = np.full((1, 32, 32), 100, np.uint8)
    got = np.asarray(percentile_normalize_u8(jnp.asarray(flat)))
    assert np.isfinite(got).all()
    assert np.all(got == 0.0)  # zero range ⇒ (x - low)/1e-3 = 0


def test_diff_sigmoid_head_matches_einsum():
    from adipose_tpu.ops.pallas.unet_kernels import (
        diff_sigmoid_head, diff_sigmoid_head_vjp)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 96, 64).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(64).astype(np.float32))
    b = jnp.float32(0.3)
    import jax

    ref = jax.nn.sigmoid(
        jnp.einsum("bhwc,c->bhw", x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32) + b)
    got = diff_sigmoid_head(x, w, b)
    assert got.shape == (2, 64, 96)
    assert got.dtype == jnp.float32
    # f32-upcast VPU products match the einsum's exact bf16 multiplies; only
    # the f32 accumulation order differs.
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6

    def loss_pallas(x, w, b):
        return jnp.sum(diff_sigmoid_head_vjp(x, w, b) ** 2)

    def loss_ref(x, w, b):
        l = jnp.einsum("bhwc,c->bhw", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32) + b
        return jnp.sum(jax.nn.sigmoid(l) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    assert float(jnp.max(jnp.abs(
        g1[0].astype(jnp.float32) - g2[0].astype(jnp.float32)))) < 5e-3
    assert float(jnp.max(jnp.abs(g1[1] - g2[1]) / (jnp.abs(g2[1]) + 1e-3))) < 1e-2
    assert float(g1[2]) == pytest.approx(float(g2[2]), rel=1e-5)


def test_diff_sigmoid_head_odd_height():
    from adipose_tpu.ops.pallas.unet_kernels import diff_sigmoid_head

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 48, 64, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16).astype(np.float32))
    got = diff_sigmoid_head(x, w, jnp.float32(-0.1))
    import jax

    ref = jax.nn.sigmoid(
        jnp.einsum("bhwc,c->bhw", x, w, preferred_element_type=jnp.float32)
        - 0.1)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_pershard_percentile_matches_direct(rng):
    """shard_map-per-shard kernel dispatch (the multi-chip path: custom calls
    are not GSPMD-partitionable) must be bit-identical to the direct call —
    exercised on the 8-virtual-device CPU mesh with the interpret kernel."""
    import jax
    from adipose_tpu.ops.normalize import pershard_percentile_u8
    from adipose_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    tiles = jnp.asarray(rng.randint(0, 256, (8, 64, 128)).astype(np.float32))
    want = percentile_normalize_u8(tiles, 1.0, 99.0, interpret=True)
    got = pershard_percentile_u8(tiles, 1.0, 99.0, mesh, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # and under jit (how the trainers trace it)
    got_j = jax.jit(
        lambda x: pershard_percentile_u8(x, 1.0, 99.0, mesh, interpret=True)
    )(tiles)
    assert np.array_equal(np.asarray(got_j), np.asarray(want))


def test_pin_default_layout_noop_off_tpu(rng):
    from adipose_tpu.ops.pallas.layout import pin_default_layout

    x = jnp.asarray(rng.rand(4, 16, 16).astype(np.float32))
    assert pin_default_layout(x) is x
