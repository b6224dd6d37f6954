"""Multi-device eval: mesh-sharded sliding-window inference + resume flow."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.eval.sliding_window import SlidingWindowInference
from adipose_tpu.parallel.mesh import make_mesh


def test_sharded_sliding_window_matches_unsharded(rng):
    mesh = make_mesh()

    def predict(params, tiles):  # smoothing model
        k = jnp.ones((3, 3)) / 9.0
        pad = jnp.pad(tiles, ((0, 0), (1, 1), (1, 1)), mode="edge")
        return jax.lax.conv_general_dilated(
            pad[:, None], k[None, None], (1, 1), "VALID"
        )[:, 0]

    img = rng.rand(96, 128).astype(np.float32)
    plain = SlidingWindowInference(tile_size=32, overlap=0.5, batch_size=8)
    sharded = SlidingWindowInference(tile_size=32, overlap=0.5, batch_size=8,
                                     mesh=mesh)
    a = plain.predict(predict, None, img)
    b = sharded.predict(predict, None, img)
    assert np.abs(a - b).max() < 1e-6


def test_sharded_batch_rounds_to_axis(rng):
    mesh = make_mesh()
    sw = SlidingWindowInference(tile_size=32, batch_size=5, mesh=mesh)
    assert sw.batch_size % mesh.shape["data"] == 0


def test_resume_skips_phase1(tmp_path, rng):
    from adipose_tpu.core.config import TrainConfig, UNetConfig
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train import checkpoint as ckpt
    from adipose_tpu.train.trainer_unet import UNetTrainer

    for split, n in (("train", 4), ("val", 2)):
        (tmp_path / "dataset" / split / "images").mkdir(parents=True)
        (tmp_path / "dataset" / split / "masks").mkdir(parents=True)
        for i in range(n):
            img = (rng.rand(32, 32) * 255).astype(np.uint8)
            mask = (rng.rand(32, 32) > 0.5).astype(np.uint8) * 255
            cv2.imwrite(str(tmp_path / "dataset" / split / "images" / f"s_r{i}_c0.jpg"), img)
            cv2.imwrite(str(tmp_path / "dataset" / split / "masks" / f"s_r{i}_c0.tif"), mask)

    # prior checkpoint to resume from
    model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32)))
    prior = tmp_path / "prior"
    prior.mkdir()
    ckpt.save_params(prior, "weights_best_overall", params)

    cfg = TrainConfig(batch_size=4, augment_level="light")
    mcfg = UNetConfig(tile_size=32, init_nb=4, compute_dtype="float32")
    tr = UNetTrainer(tmp_path, cfg, mcfg, checkpoint_root=tmp_path / "ckpts")
    result = tr.train(epochs_phase1=5, epochs_phase2=1, resume_from=prior)
    # phase 1 skipped: no phase1_best artifact, phase2 present
    run = next((tmp_path / "ckpts").iterdir())
    assert not (run / "phase1_best").exists()
    assert (run / "phase2_best").exists()
    assert np.isnan(result["phase1_best_dice"])


def test_sharded_wsi_pipeline_matches_unsharded(rng):
    from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

    mesh = make_mesh()

    def cls_predict(v, tiles):
        return jnp.where(jnp.mean(tiles, axis=(1, 2)) > 0, 0.9, 0.1)

    def seg_predict(p, tiles):
        return jax.nn.sigmoid((tiles - 120.0) / 40.0)

    slide = (rng.rand(96, 160) * 120 + 60).astype(np.uint8)
    kw = dict(tile_size=32, overlap=0.5, batch_size=8)
    plain = DualModelWSIPipeline(cls_predict, None, seg_predict, None, **kw)
    sharded = DualModelWSIPipeline(cls_predict, None, seg_predict, None,
                                   mesh=mesh, **kw)
    a = plain.run(slide)
    b = sharded.run(slide)
    assert b.n_tiles == a.n_tiles and b.n_positive == a.n_positive
    assert np.abs(a.probability_map - b.probability_map).max() < 1e-6
    assert sharded.batch_size % mesh.shape["data"] == 0
