"""Spatial halo-exchange sharding vs global ops (8-virtual-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.parallel.mesh import make_mesh
from adipose_tpu.parallel.spatial import sharded_conv_fn, spatial_max_pool2


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # (data=8, model=1)


def _global_conv(x, k, dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("dilation", [(1, 1), (2, 2), (4, 4)])
def test_sharded_conv_matches_global(mesh, rng, dilation):
    x = jnp.asarray(rng.randn(2, 64, 48, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    want = _global_conv(x, k, dilation)
    got = sharded_conv_fn(mesh)(x, k, dilation)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5


def test_sharded_conv_stack_matches_global(mesh, rng):
    """conv -> relu -> conv(dilated): halos compose across layers."""
    x = jnp.asarray(rng.randn(1, 64, 32, 4).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    conv = sharded_conv_fn(mesh)
    got = conv(jax.nn.relu(conv(x, k1)), k2, (4, 4))
    want = _global_conv(jax.nn.relu(_global_conv(x, k1)), k2, (4, 4))
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5


def test_spatial_max_pool_matches_global(mesh, rng):
    from functools import partial

    from jax.sharding import PartitionSpec as P

    x = jnp.asarray(rng.randn(1, 64, 32, 4).astype(np.float32))
    f = jax.shard_map(spatial_max_pool2, mesh=mesh,
                      in_specs=P(None, "data", None, None),
                      out_specs=P(None, "data", None, None))
    got = f(x)
    want = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    assert np.abs(np.asarray(got) - np.asarray(want)).max() == 0.0


class TestSpatialUNet:
    """Full-model context parallelism == single-device model.apply."""

    def _params_and_input(self, rng, dtype):
        from adipose_tpu.core.seeding import key_for
        from adipose_tpu.models.unet import DilatedUNet

        model = DilatedUNet(init_nb=4, compute_dtype=dtype)
        x = jnp.asarray(rng.rand(2, 128, 64).astype(np.float32))
        params = model.init(key_for("spatial.test"), x)
        return model, params, x

    def test_matches_model_apply_f32(self, mesh, rng):
        from adipose_tpu.parallel.spatial_unet import spatial_unet_predict

        model, params, x = self._params_and_input(rng, jnp.float32)
        want = model.apply(params, x, train=False)
        got = spatial_unet_predict(params, x, mesh, compute_dtype=jnp.float32)
        assert got.shape == want.shape
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5

    def test_matches_model_apply_bf16(self, mesh, rng):
        from adipose_tpu.parallel.spatial_unet import spatial_unet_predict

        model, params, x = self._params_and_input(rng, jnp.bfloat16)
        want = model.apply(params, x, train=False)
        got = spatial_unet_predict(params, x, mesh)
        # bf16 rounding differs only through reduction-order changes at the
        # gather/slice boundaries; outputs are probabilities in [0,1]
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-3

    def test_rejects_deep_supervision_checkpoint(self, mesh, rng):
        """Aux-head params must raise, not be silently ignored."""
        from adipose_tpu.core.seeding import key_for
        from adipose_tpu.models.unet import DilatedUNet
        from adipose_tpu.parallel.spatial_unet import spatial_unet_predict

        model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32,
                            use_deep_supervision=True)
        x = jnp.asarray(rng.rand(1, 128, 64).astype(np.float32))
        params = model.init(key_for("spatial.ds"), x)
        with pytest.raises(ValueError, match="deep-supervision"):
            spatial_unet_predict(params, x, mesh, compute_dtype=jnp.float32)
