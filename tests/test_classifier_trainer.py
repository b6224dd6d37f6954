"""End-to-end two-phase classifier training smoke test (tiny data, CPU mesh)."""

import cv2
import numpy as np
import pytest

from adipose_tpu.core.config import ClassifierConfig, TrainConfig


@pytest.fixture
def class_dataset(tmp_path, rng):
    """Separable tiny dataset: adipose tiles bright, negatives dark."""
    for split, n in (("train", 8), ("val", 4)):
        for cls, base in (("adipose", 200), ("not_adipose", 60)):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(n // 2):
                img = np.full((64, 64), base, np.uint8)
                img = np.clip(
                    img.astype(int) + rng.randint(-20, 20, (64, 64)), 0, 255
                ).astype(np.uint8)
                cv2.imwrite(str(d / f"s{i % 2}_r{i}_c0.jpg"), img)
    return tmp_path


def test_two_phase_classifier_training(class_dataset):
    from adipose_tpu.train.trainer_classifier import ClassifierTrainer

    # classifier LRs (train_adipose_classifier_v0.py:479-503) — the trainer
    # honors cfg.lr_phase1/2, so set them; bare TrainConfig carries U-Net LRs
    cfg = TrainConfig(batch_size=4, lr_phase1=1e-3, lr_phase2=1e-4)
    trainer = ClassifierTrainer(
        class_dataset, cfg, ClassifierConfig(compute_dtype="float32"),
        percentile_norm=False,  # brightness IS the signal; keep it
        use_class_weights=True,
        checkpoint_root=class_dataset / "runs",
    )
    result = trainer.train(warmup_epochs=4, finetune_epochs=2)
    run_dir = next((class_dataset / "runs").iterdir())
    assert (run_dir / "config.json").exists()
    assert (run_dir / "training.log").exists()
    assert (run_dir / "weights_best").is_dir()
    assert (run_dir / "weights_final").is_dir()
    # with 8 train tiles / 4 val tiles the AUC is too coarse to bound tightly;
    # assert the mechanics: finite AUC recorded, and train loss decreased
    assert 0.0 <= result["phase2_val_auc"] <= 1.0
    import pandas as pd

    log = pd.read_csv(run_dir / "training.log")
    assert log["loss"].iloc[-1] < log["loss"].iloc[0]
    # class weights were computed at slide level
    assert set(trainer.class_weights) == {0, 1}


def test_sharded_classifier_train_step_matches_single_device(rng):
    """One InceptionV3 train step on an 8-way data-sharded batch must equal
    the unsharded step — grads AND train-mode BN batch statistics psum
    across shards under GSPMD (mirrors the U-Net's sharded≡single test;
    replaces the reference's `multi_gpu.py:7-58` DP wrapper check it never
    had)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adipose_tpu.models.inception import InceptionV3Classifier
    from adipose_tpu.parallel.mesh import data_sharding, make_mesh, replicate
    from adipose_tpu.train.state import TrainState, make_optimizer
    from adipose_tpu.train.trainer_classifier import _make_train_step

    model = InceptionV3Classifier(dropout_rate=0.0, dtype=jnp.float32)
    x = jnp.asarray(rng.rand(8, 96, 96, 3).astype(np.float32) * 2 - 1)
    labels = jnp.asarray((rng.rand(8) > 0.5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    class_w = jnp.asarray([1.0, 1.5], jnp.float32)
    drop_key = jax.random.PRNGKey(3)

    def run(variables, xs, ys):
        # the train step donates its state — copy so both runs get live buffers
        variables = jax.tree.map(jnp.copy, variables)
        tx = make_optimizer("adam", 1e-3)
        state = TrainState.create(variables["params"], tx,
                                  variables["batch_stats"])
        step = _make_train_step(model, label_smoothing=0.1, stats_mask=None)
        return step(state, xs, ys, class_w, drop_key)

    ref_state, ref_m = run(variables, x, labels)

    mesh = make_mesh()
    sh_state, sh_m = run(
        replicate(mesh, variables),
        jax.device_put(x, data_sharding(mesh, 4)),
        jax.device_put(labels, data_sharding(mesh, 1)),
    )
    # tolerances: unlike the (BN-free) U-Net, InceptionV3 normalizes with
    # batch statistics whose sharded psum reduces in a different order than
    # the single-device sum — f32 rounding compounds through ~94 BN layers
    # (measured loss drift ~8e-5 relative on CPU)
    assert float(sh_m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-3)
    assert float(sh_m["acc"]) == pytest.approx(float(ref_m["acc"]), abs=1e-6)
    # params: one ADAM step bounds every update by ~lr (bias-corrected
    # m/sqrt(v) ≈ ±1 on step 1), so a near-zero gradient whose sign flips
    # under the sharded reduction order moves a weight by up to 2·lr=2e-3 —
    # bound by that mechanism, and require the flips to be rare (mean diff
    # orders below the bound)
    d = jax.tree.leaves(jax.tree.map(
        lambda a, b: jnp.abs(a - b).ravel(), ref_state.params, sh_state.params))
    d = jnp.concatenate(d)
    assert float(jnp.max(d)) < 2.5e-3
    assert float(jnp.mean(d)) < 2e-5
    sd = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                      ref_state.batch_stats, sh_state.batch_stats)
    assert max(jax.tree.leaves(sd)) < 1e-4


def test_preprocess_step_low_res_augment(rng):
    """--augment-low-res prep: same output contract as the default path
    (B, 299, 299, 3) in [-1, 1], identity-aug inputs agree across paths."""
    import jax
    import jax.numpy as jnp

    from adipose_tpu.train.trainer_classifier import _make_preprocess_step

    imgs = (rng.rand(2, 128, 128) * 255).astype(np.uint8)
    key = jax.random.PRNGKey(3)
    full = _make_preprocess_step(True, 1.0, 99.0)(jnp.asarray(imgs), key)
    low = _make_preprocess_step(True, 1.0, 99.0, augment_low_res=True)(
        jnp.asarray(imgs), key)
    for out in (full, low):
        assert out.shape == (2, 299, 299, 3)
        assert float(jnp.min(out)) >= -1.0 - 1e-5
        assert float(jnp.max(out)) <= 1.0 + 1e-5
        # grayscale tiled to 3 identical channels
        np.testing.assert_array_equal(np.asarray(out[..., 0]),
                                      np.asarray(out[..., 1]))
    # both paths draw the same D4/zoom/photometric decisions from `key`;
    # outputs differ only through the aug-resolution interaction, which is
    # bounded for these smooth random tiles
    assert float(jnp.mean(jnp.abs(full - low))) < 0.5
