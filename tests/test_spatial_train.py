"""GSPMD spatial-sharded TRAINING: batch-2 over 8 devices via H sharding.

SURVEY.md §7 'batch-2 training on 8 chips': the reference batch (2) cannot
shard over 8 devices along batch alone; `make_mesh_spatial` puts the leftover
devices on the 'model' axis and shards each image's rows across them. XLA
inserts the conv halo exchanges in forward AND backward. These tests pin that
a spatially-sharded train step is numerically the SAME step as the
single-device one (same loss/metrics/updated params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.core.config import TrainConfig
from adipose_tpu.core.seeding import key_for
from adipose_tpu.models.unet import DilatedUNet
from adipose_tpu.parallel.mesh import (
    make_mesh_spatial,
    replicate,
    shard_batch_spatial,
    spatial_sharding,
)
from adipose_tpu.train.state import TrainState, make_optimizer, unet_loss_from_config
from adipose_tpu.train.trainer_unet import _make_fused_train_step


class TestMeshSpatial:
    def test_batch2_uses_all_8_devices(self):
        mesh = make_mesh_spatial(2, 8, image_h=64)
        assert dict(mesh.shape) == {"data": 2, "model": 4}

    def test_batch3_model_axis_power_of_two(self):
        # 8 // 3 = 2 leftover-axis candidates; 2 is a power of two dividing 64
        mesh = make_mesh_spatial(3, 8, image_h=64)
        assert dict(mesh.shape) == {"data": 3, "model": 2}

    def test_full_batch_degenerates_to_data_parallel(self):
        mesh = make_mesh_spatial(8, 8, image_h=64)
        assert dict(mesh.shape) == {"data": 8, "model": 1}

    def test_indivisible_h_drops_model_axis(self):
        # image_h=63 shares no power-of-two factor > 1
        mesh = make_mesh_spatial(2, 8, image_h=63)
        assert dict(mesh.shape) == {"data": 2, "model": 1}


class TestSpatialTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = TrainConfig()
        model = DilatedUNet(init_nb=8, compute_dtype=jnp.float32)
        tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
        loss_fn = unet_loss_from_config(cfg)
        step = _make_fused_train_step(
            model, loss_fn, cfg.augment_level, cfg.normalization_method,
            cfg.percentile_low, cfg.percentile_high,
        )
        rng = np.random.RandomState(865)
        imgs = (rng.rand(2, 64, 64) * 255).astype(np.uint8)
        masks = (rng.rand(2, 64, 64) > 0.6).astype(np.uint8)
        params = model.init(key_for("sp.train"), jnp.zeros((1, 64, 64)))
        return model, tx, step, params, imgs, masks

    def _run(self, step, state, imgs, masks):
        new_state, m = step(
            state, imgs, masks, key_for("sp.train.step"),
            jnp.float32(127.0), jnp.float32(50.0),
        )
        return new_state, {k: float(v) for k, v in m.items()}

    def test_spatial_step_equals_single_device(self, setup):
        model, tx, step, params, imgs, masks = setup

        # single device (copy params — the step donates its input state)
        state1 = TrainState.create(jax.tree.map(jnp.array, params), tx)
        s1, m1 = self._run(step, state1, jnp.asarray(imgs), jnp.asarray(masks))

        # batch 2 spatially sharded over all 8 devices
        mesh = make_mesh_spatial(2, 8, image_h=64)
        state8 = TrainState.create(
            replicate(mesh, jax.tree.map(jnp.array, params)), tx)
        sh_imgs, sh_masks = shard_batch_spatial(mesh, (imgs, masks))
        assert sh_imgs.sharding.spec == spatial_sharding(mesh, 3).spec
        s8, m8 = self._run(step, state8, sh_imgs, sh_masks)

        assert m8["loss"] == pytest.approx(m1["loss"], abs=1e-5)
        assert m8["dice_coef"] == pytest.approx(m1["dice_coef"], abs=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    def test_augment_step_matches_on_spatial_sharding(self, setup):
        """The separate augmentation program (trainer's other device program)
        is sharding-transparent: same keys → same warps, sharded or not."""
        from adipose_tpu.train.trainer_unet import make_augment_step

        _, _, _, _, imgs, masks = setup
        aug = make_augment_step("moderate")
        key = key_for("sp.train.aug")
        want_i, want_m = aug(key, jnp.asarray(imgs), jnp.asarray(masks))

        mesh = make_mesh_spatial(2, 8, image_h=64)
        sh_imgs, sh_masks = shard_batch_spatial(mesh, (imgs, masks))
        got_i, got_m = aug(key, sh_imgs, sh_masks)
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))

    def test_two_spatial_steps_stay_consistent(self, setup):
        """Second step consumes the (still-sharded) donated state cleanly."""
        model, tx, step, params, imgs, masks = setup
        mesh = make_mesh_spatial(2, 8, image_h=64)
        state = TrainState.create(
            replicate(mesh, jax.tree.map(jnp.array, params)), tx)
        batch = shard_batch_spatial(mesh, (imgs, masks))
        losses = []
        for _ in range(2):
            state, m = self._run(step, state, *batch)
            losses.append(m["loss"])
        assert all(np.isfinite(v) for v in losses)
        assert int(state.step) == 2
