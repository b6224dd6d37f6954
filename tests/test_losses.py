"""Golden tests for losses against numpy oracles of the reference formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from adipose_tpu.ops import losses


def np_dice_coef(y_true, y_pred, smooth=1.0):
    yt, yp = y_true.ravel(), y_pred.ravel()
    inter = np.sum(yt * yp)
    return (2.0 * inter + smooth) / (yt.sum() + yp.sum() + smooth)


def np_bce(y_true, y_pred, eps=1e-7):
    yp = np.clip(y_pred, eps, 1 - eps)
    return -(y_true * np.log(yp) + (1 - y_true) * np.log(1 - yp))


@pytest.fixture
def pair(rng):
    y_true = (rng.rand(2, 64, 64) > 0.6).astype(np.float32)
    y_pred = rng.rand(2, 64, 64).astype(np.float32)
    return y_true, y_pred


def test_dice_coef_matches_oracle(pair):
    y_true, y_pred = pair
    got = float(losses.dice_coef(jnp.asarray(y_true), jnp.asarray(y_pred)))
    want = np_dice_coef(y_true, y_pred)
    assert abs(got - want) < 1e-5


def test_dice_coef_perfect_and_empty():
    ones = jnp.ones((1, 8, 8))
    zeros = jnp.zeros((1, 8, 8))
    assert float(losses.dice_coef(ones, ones)) == pytest.approx(1.0, abs=1e-5)
    # both empty: smooth term gives exactly 1.0 (reference convention)
    assert float(losses.dice_coef(zeros, zeros)) == pytest.approx(1.0)


def test_dice_loss_clips_and_complements(pair):
    y_true, y_pred = pair
    got = float(losses.dice_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    yp = np.clip(y_pred, 1e-7, 1 - 1e-7)
    want = 1.0 - np_dice_coef(y_true, yp)
    assert abs(got - want) < 1e-5


def test_combined_loss_standard(pair):
    y_true, y_pred = pair
    got = float(losses.combined_loss_standard(jnp.asarray(y_true), jnp.asarray(y_pred)))
    want = np_bce(y_true, y_pred).mean() + (
        1.0 - np_dice_coef(y_true, np.clip(y_pred, 1e-7, 1 - 1e-7))
    )
    assert abs(got - want) < 1e-4


def test_smooth_labels_asymmetric():
    # Reference formula (train_adipose_unet_v3.py:273-275):
    # y*(1-εp-εn)+εn ⇒ 1 → 0.97, 0 → 0.07. (The reference docstring claims
    # 0.90 for positives but its code produces 0.97 — we match the code.)
    y = jnp.array([0.0, 1.0])
    out = np.asarray(losses.smooth_labels(y, 0.03, 0.07))
    assert out[0] == pytest.approx(0.07)
    assert out[1] == pytest.approx(0.97, abs=1e-6)


def test_ohem_row_granularity_matches_reference_semantics(pair):
    """Reference OHEM ranks per-row BCE means (Keras last-axis reduction)."""
    y_true, y_pred = pair
    keep = 0.7
    got = float(losses.ohem_loss(jnp.asarray(y_true), jnp.asarray(y_pred), keep_ratio=keep))
    per_row = np_bce(y_true, y_pred).mean(axis=-1).reshape(2, -1)  # (B, H)
    k = int(per_row.shape[1] * keep)
    topk = np.sort(per_row, axis=1)[:, -k:]
    want = topk.mean() + 1.0 - np_dice_coef(y_true, np.clip(y_pred, 1e-7, 1 - 1e-7))
    assert abs(got - want) < 1e-4


def test_ohem_pixel_harder_than_row(pair):
    y_true, y_pred = pair
    row = float(losses.ohem_loss(jnp.asarray(y_true), jnp.asarray(y_pred), granularity="row"))
    pix = float(losses.ohem_loss(jnp.asarray(y_true), jnp.asarray(y_pred), granularity="pixel"))
    assert pix >= row  # top-k pixels upper-bounds top-k row means


def test_ohem_keep_all_equals_standard(pair):
    y_true, y_pred = pair
    all_kept = float(
        losses.ohem_loss(jnp.asarray(y_true), jnp.asarray(y_pred), keep_ratio=1.0, granularity="pixel")
    )
    std = float(losses.combined_loss_standard(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert abs(all_kept - std) < 1e-4


def test_jaccard_coef(pair):
    y_true, y_pred = pair
    got = float(losses.jaccard_coef(jnp.asarray(y_true), jnp.asarray(y_pred)))
    inter = np.sum(y_true * y_pred)
    s = np.sum(y_true + y_pred)
    want = (inter + 1e-7) / (s - inter + 1e-7)
    assert abs(got - want) < 1e-5


def test_border_weight_mean_preserved(rng):
    # Square must be >21 px so its center survives the 21×21 avg-pool as
    # fully-interior (avg > 0.995 ⇒ non-border).
    mask = np.zeros((1, 64, 64), np.float32)
    mask[0, 10:54, 10:54] = 1.0
    w = np.asarray(losses._border_weight(jnp.asarray(mask)))
    # rescaling preserves the total weight (src/utils/model.py:112-116)
    assert w.sum() == pytest.approx(mask.size, rel=1e-5)
    # border pixels upweighted relative to interior
    assert w[0, 10, 10] > w[0, 32, 32]


def test_weighted_bce_dice_runs(pair):
    y_true, y_pred = pair
    val = float(losses.weighted_bce_dice_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert np.isfinite(val) and val > 0


def test_bce_with_label_smoothing():
    y = jnp.array([1.0, 0.0])
    p = jnp.array([0.9, 0.1])
    got = float(losses.bce_with_label_smoothing(y, p, 0.1))
    ys = np.array([0.95, 0.05])
    want = np_bce(ys, np.array([0.9, 0.1])).mean()
    assert abs(got - want) < 1e-5


def test_deep_supervision_weighting(pair):
    y_true, y_pred = pair
    outs = {
        "main_out": jnp.asarray(y_pred),
        "aux_out1": jnp.asarray(y_pred),
        "aux_out2": jnp.asarray(y_pred),
    }
    total = float(
        losses.deep_supervision_loss(
            jnp.asarray(y_true), outs,
            losses.combined_loss_standard, losses.combined_loss_standard,
        )
    )
    single = float(losses.combined_loss_standard(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert total == pytest.approx((1.0 + 0.4 + 0.3) * single, rel=1e-5)


def test_onehot_precision_recall():
    # 4 pixels, 2-class one-hot; 2 predicted positive of which 1 correct
    y_true = jnp.asarray(np.array([[1, 0], [0, 1], [0, 1], [1, 0]], np.float32))
    y_pred = jnp.asarray(np.array([[0.2, 0.8], [0.6, 0.4], [0.1, 0.9], [0.9, 0.1]], np.float32))
    p = float(losses.precision_onehot(y_true, y_pred))
    r = float(losses.recall_onehot(y_true, y_pred))
    assert p == pytest.approx(0.5, abs=1e-4)  # 1 TP of 2 predicted positives
    assert r == pytest.approx(0.5, abs=1e-4)  # 1 TP of 2 actual positives
