"""Metrics tests: confusion math, both-empty convention, AUC vs sklearn."""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from adipose_tpu.ops import metrics


def test_pixel_metrics_against_counts(rng):
    pred = rng.rand(64, 64).astype(np.float32)
    true = (rng.rand(64, 64) > 0.5).astype(np.float32)
    m = {k: float(v) for k, v in metrics.pixel_metrics(jnp.asarray(pred), jnp.asarray(true)).items()}
    pb, tb = pred > 0.5, true > 0.5
    tp = np.sum(pb & tb); fp = np.sum(pb & ~tb); fn = np.sum(~pb & tb); tn = np.sum(~pb & ~tb)
    assert m["tp"] == tp and m["fp"] == fp and m["fn"] == fn and m["tn"] == tn
    assert m["dice_score"] == pytest.approx(2 * tp / (2 * tp + fp + fn + 1e-10), rel=1e-5)
    assert m["jaccard_index"] == pytest.approx(tp / (tp + fp + fn + 1e-10), rel=1e-5)
    assert m["sensitivity"] == pytest.approx(tp / (tp + fn + 1e-10), rel=1e-5)
    assert m["specificity"] == pytest.approx(tn / (tn + fp + 1e-10), rel=1e-5)


def test_both_empty_is_perfect():
    z = jnp.zeros((32, 32))
    m = metrics.pixel_metrics(z, z)
    for key in ("dice_score", "jaccard_index", "sensitivity", "specificity",
                "precision", "f1_score", "accuracy"):
        assert float(m[key]) == 1.0


def test_empty_gt_nonempty_pred_is_zero_dice():
    pred = jnp.ones((8, 8))
    true = jnp.zeros((8, 8))
    m = metrics.pixel_metrics(pred, true)
    assert float(m["dice_score"]) == pytest.approx(0.0, abs=1e-6)


def test_batched_metrics(rng):
    pred = rng.rand(4, 16, 16).astype(np.float32)
    true = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)
    m = metrics.batched_pixel_metrics(jnp.asarray(pred), jnp.asarray(true), 0.5)
    assert m["dice_score"].shape == (4,)


def test_roc_auc_matches_sklearn(rng):
    pred = rng.rand(5000).astype(np.float32)
    true = (rng.rand(5000) > 0.7).astype(np.float32)
    got = float(metrics.roc_auc(jnp.asarray(pred), jnp.asarray(true)))
    want = roc_auc_score(true.astype(int), pred)
    assert got == pytest.approx(want, abs=1e-5)


def test_roc_auc_with_ties(rng):
    pred = np.round(rng.rand(2000) * 10) / 10  # heavy ties
    true = (rng.rand(2000) > 0.5).astype(np.float32)
    got = float(metrics.roc_auc(jnp.asarray(pred.astype(np.float32)), jnp.asarray(true)))
    want = roc_auc_score(true.astype(int), pred)
    assert got == pytest.approx(want, abs=1e-5)


def test_pr_auc_matches_sklearn(rng):
    pred = rng.rand(3000).astype(np.float32)
    true = (rng.rand(3000) > 0.8).astype(np.float32)
    got = float(metrics.pr_auc(jnp.asarray(pred), jnp.asarray(true)))
    want = average_precision_score(true.astype(int), pred)
    assert got == pytest.approx(want, abs=1e-4)


def test_pr_auc_with_ties(rng):
    pred = np.round(rng.rand(1000) * 20) / 20
    true = (rng.rand(1000) > 0.6).astype(np.float32)
    got = float(metrics.pr_auc(jnp.asarray(pred.astype(np.float32)), jnp.asarray(true)))
    want = average_precision_score(true.astype(int), pred)
    assert got == pytest.approx(want, abs=1e-4)


def test_auc_single_class_nan():
    pred = jnp.asarray(np.random.rand(100).astype(np.float32))
    ones = jnp.ones(100)
    assert np.isnan(float(metrics.roc_auc(pred, ones)))
    assert np.isnan(float(metrics.pr_auc(pred, ones)))


def test_f1_threshold_sweep(rng):
    pred = rng.rand(64, 64).astype(np.float32)
    true = (rng.rand(64, 64) > 0.5).astype(np.float32)
    sweep = np.asarray(metrics.f1_threshold_sweep(jnp.asarray(pred), jnp.asarray(true)))
    assert sweep.shape == (17,)
    thresholds = np.arange(17) * 0.05 + 0.1
    for i in (0, 8, 16):
        m = metrics.pixel_metrics(jnp.asarray(pred), jnp.asarray(true), float(thresholds[i]))
        assert sweep[i] == pytest.approx(float(m["f1_score"]), abs=1e-5)


def test_classifier_metrics(rng):
    probs = rng.rand(200).astype(np.float32)
    labels = (rng.rand(200) > 0.5).astype(np.float32)
    m = metrics.classifier_metrics(jnp.asarray(labels), jnp.asarray(probs))
    pb = probs > 0.5
    assert float(m["acc"]) == pytest.approx(np.mean(pb == labels.astype(bool)), abs=1e-5)
    assert float(m["auc"]) == pytest.approx(roc_auc_score(labels.astype(int), probs), abs=1e-5)


def test_batched_auc_matches_per_tile(rng):
    """Chunked vmapped AUC == per-tile auc_metrics, incl. the padded last
    chunk and NaN single-class tiles."""
    n = 7  # not divisible by chunk -> exercises padding
    preds = rng.rand(n, 24, 24).astype(np.float32)
    trues = (rng.rand(n, 24, 24) > 0.6).astype(np.float32)
    trues[3] = 0.0  # single-class tile -> NaN AUCs
    got = metrics.batched_auc_metrics(jnp.asarray(preds), jnp.asarray(trues), chunk=4)
    for i in range(n):
        want = metrics.auc_metrics(jnp.asarray(preds[i]), jnp.asarray(trues[i]))
        for k in ("roc_auc", "pr_auc"):
            w = float(want[k])
            if np.isnan(w):
                assert np.isnan(got[k][i])
            else:
                assert got[k][i] == pytest.approx(w, abs=1e-6)
