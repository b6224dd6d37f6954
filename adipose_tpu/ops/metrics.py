"""Evaluation metrics — device-friendly confusion math + AUC.

Behavioral spec from ``Segmentation/full_evaluation_enhanced.py``:
  * ``calculate_pixel_metrics`` (:720-785): thresholded confusion counts with the
    both-empty ⇒ all-metrics-perfect convention for background tiles.
  * ``calculate_auc_metrics`` (:847-888): pixel-level ROC AUC / PR AUC, NaN when
    only one class is present.
  * ``calculate_boundary_metrics`` (:788-844): Hausdorff95 / ASSD via distance
    transforms — host-side (scipy EDT), see :mod:`adipose_tpu.eval.boundary`.

TPU-first design: pixel metrics are computed from four scalar confusion counts,
so a batch of tiles reduces on device (one pass over HBM) and only 4·B scalars
cross to the host. AUC uses an exact O(N log N) sort-based formulation under
jit, vmappable over tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-10


@jax.jit
def confusion_counts(pred: jax.Array, true: jax.Array, threshold: float = 0.5):
    """TP/FP/FN/TN pixel counts at a threshold.

    ``pred`` is a probability map, ``true`` a {0,1} mask; binarization follows
    ``full_evaluation_enhanced.py:733-734`` (pred > thr, true > 0.5).
    """
    pred_bin = pred > threshold
    true_bin = true > 0.5
    tp = jnp.sum(pred_bin & true_bin)
    fp = jnp.sum(pred_bin & ~true_bin)
    fn = jnp.sum(~pred_bin & true_bin)
    tn = jnp.sum(~pred_bin & ~true_bin)
    return tp, fp, fn, tn


def metrics_from_counts(tp, fp, fn, tn) -> dict:
    """Derived metrics with the both-empty=perfect convention
    (``full_evaluation_enhanced.py:736-785``)."""
    tp = jnp.asarray(tp, jnp.float32)
    fp = jnp.asarray(fp, jnp.float32)
    fn = jnp.asarray(fn, jnp.float32)
    tn = jnp.asarray(tn, jnp.float32)
    both_empty = (tp + fp + fn) == 0

    precision = tp / (tp + fp + _EPS)
    sensitivity = tp / (tp + fn + _EPS)
    specificity = tn / (tn + fp + _EPS)
    accuracy = (tp + tn) / (tp + fp + fn + tn + _EPS)
    f1 = 2.0 * tp / (2.0 * tp + fp + fn + _EPS)
    jaccard = tp / (tp + fp + fn + _EPS)

    def _pe(x):  # both-empty ⇒ perfect
        return jnp.where(both_empty, 1.0, x)

    return {
        "dice_score": _pe(f1),
        "jaccard_index": _pe(jaccard),
        "sensitivity": _pe(sensitivity),
        "specificity": _pe(specificity),
        "precision": _pe(precision),
        "f1_score": _pe(f1),
        "accuracy": _pe(accuracy),
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
    }


@jax.jit
def pixel_metrics(pred: jax.Array, true: jax.Array, threshold: float = 0.5) -> dict:
    """Full pixel-metric dict for one tile (jit; vmap over a batch for free)."""
    tp, fp, fn, tn = confusion_counts(pred, true, threshold)
    return metrics_from_counts(tp, fp, fn, tn)


batched_pixel_metrics = jax.jit(jax.vmap(pixel_metrics, in_axes=(0, 0, None)))


# ---- Threshold sweep (device-side) -----------------------------------------


@partial(jax.jit, static_argnames=("num_thresholds",))
def f1_threshold_sweep(
    pred: jax.Array,
    true: jax.Array,
    thresholds: jax.Array | None = None,
    num_thresholds: int = 17,
) -> jax.Array:
    """Per-tile F1 at each threshold in one fused pass.

    Returns ``(num_thresholds,)`` F1 values for a single (pred, true) pair; the
    evaluator vmaps this over tiles and optimizes the slide-macro mean on host
    (``full_evaluation_enhanced.py:891-983``: grid 0.1..0.9 step 0.05).
    """
    if thresholds is None:
        thresholds = jnp.arange(num_thresholds, dtype=jnp.float32) * 0.05 + 0.1
    true_bin = (true > 0.5).reshape(-1)

    def one(thr):
        pred_bin = (pred > thr).reshape(-1)
        tp = jnp.sum(pred_bin & true_bin).astype(jnp.float32)
        fp = jnp.sum(pred_bin & ~true_bin).astype(jnp.float32)
        fn = jnp.sum(~pred_bin & true_bin).astype(jnp.float32)
        both_empty = (tp + fp + fn) == 0
        f1 = 2.0 * tp / (2.0 * tp + fp + fn + _EPS)
        return jnp.where(both_empty, 1.0, f1)

    return jax.vmap(one)(thresholds)


# ---- AUC (exact, sort-based, device-side) ----------------------------------


@jax.jit
def roc_auc(pred: jax.Array, true: jax.Array) -> jax.Array:
    """Exact ROC AUC via the rank statistic (Mann–Whitney U), with tie handling.

    Equivalent to sklearn.roc_auc_score on flattened pixels
    (``full_evaluation_enhanced.py:869``); returns NaN when only one class is
    present (:857-863).
    """
    scores = pred.reshape(-1).astype(jnp.float32)
    labels = (true.reshape(-1) > 0.5).astype(jnp.float32)
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    sorted_labels = labels[order]
    # average ranks for ties: rank = mean of 1-based positions of equal scores
    idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    # Segment boundaries where the score changes
    new_group = jnp.concatenate(
        [jnp.array([True]), sorted_scores[1:] != sorted_scores[:-1]]
    )
    group_id = jnp.cumsum(new_group) - 1
    group_sum = jax.ops.segment_sum(idx, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(idx), group_id, num_segments=n)
    avg_rank = (group_sum / jnp.maximum(group_cnt, 1.0))[group_id]
    n_pos = jnp.sum(sorted_labels)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(avg_rank * sorted_labels)
    auc = (rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0) / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos == 0) | (n_neg == 0), jnp.nan, auc)


@jax.jit
def pr_auc(pred: jax.Array, true: jax.Array) -> jax.Array:
    """Average precision (sklearn.average_precision_score semantics):
    AP = Σ (R_i − R_{i−1}) · P_i over descending-score thresholds."""
    scores = pred.reshape(-1).astype(jnp.float32)
    labels = (true.reshape(-1) > 0.5).astype(jnp.float32)
    n_pos = jnp.sum(labels)
    order = jnp.argsort(-scores)
    sorted_scores = scores[order]
    sorted_labels = labels[order]
    tp_cum = jnp.cumsum(sorted_labels)
    fp_cum = jnp.cumsum(1.0 - sorted_labels)
    precision = tp_cum / jnp.maximum(tp_cum + fp_cum, 1.0)
    recall = tp_cum / jnp.maximum(n_pos, 1.0)
    # Only threshold at distinct-score boundaries (last index of each tie block).
    n = scores.shape[0]
    is_boundary = jnp.concatenate(
        [sorted_scores[:-1] != sorted_scores[1:], jnp.array([True])]
    )
    recall_prev = jnp.concatenate([jnp.array([0.0]), recall[:-1]])
    # For tie blocks, ΔR must span the whole block: accumulate from the previous
    # boundary. Build boundary-recall pairs by zeroing non-boundary deltas.
    boundary_recall = jnp.where(is_boundary, recall, 0.0)
    # recall at previous boundary for each boundary position:
    idxs = jnp.arange(n)
    boundary_idx = jnp.where(is_boundary, idxs, -1)
    # running max of boundary positions strictly before i
    prev_boundary = jax.lax.associative_scan(jnp.maximum, boundary_idx)
    prev_boundary_shifted = jnp.concatenate([jnp.array([-1]), prev_boundary[:-1]])
    r_prev = jnp.where(prev_boundary_shifted >= 0, recall[prev_boundary_shifted], 0.0)
    delta_r = jnp.where(is_boundary, recall - r_prev, 0.0)
    ap = jnp.sum(delta_r * precision)
    n_neg = n - n_pos
    return jnp.where((n_pos == 0) | (n_neg == 0), jnp.nan, ap)


def auc_metrics(pred, true) -> dict:
    """ROC + PR AUC dict (``full_evaluation_enhanced.py:847-888``)."""
    return {"roc_auc": roc_auc(pred, true), "pr_auc": pr_auc(pred, true)}


_auc_pair_vmapped = jax.jit(
    jax.vmap(lambda p, t: (roc_auc(p, t), pr_auc(p, t)))
)


def batched_auc_metrics(pred: jax.Array, true: jax.Array, chunk: int = 16) -> dict:
    """Per-tile ROC/PR AUC over an (N, H, W) stack, vmapped in fixed-size
    chunks (padded so only ONE program compiles) — replaces the evaluator's
    per-tile dispatch loop (~1.5 ms/call on the tunneled v5e ×2 programs/tile).
    Returns ``{"roc_auc": (N,), "pr_auc": (N,)}`` numpy arrays, values
    identical to per-tile :func:`auc_metrics`."""
    import numpy as np

    n = pred.shape[0]
    rocs, prs = [], []
    for s in range(0, n, chunk):
        p, t = pred[s : s + chunk], true[s : s + chunk]
        k = p.shape[0]
        if k < chunk:  # pad to the compiled batch shape
            p = jnp.concatenate([p, jnp.repeat(p[-1:], chunk - k, axis=0)])
            t = jnp.concatenate([t, jnp.repeat(t[-1:], chunk - k, axis=0)])
        r, a = _auc_pair_vmapped(p, t)
        rocs.append(np.asarray(r)[:k])
        prs.append(np.asarray(a)[:k])
    return {"roc_auc": np.concatenate(rocs), "pr_auc": np.concatenate(prs)}


# ---- Classifier metrics -----------------------------------------------------


@jax.jit
def activation_stats(y_pred: jax.Array) -> dict:
    """Prediction activation statistics — the reference's act_mean/min/max/std
    training metrics (``src/utils/model.py:24-35``)."""
    p = y_pred.astype(jnp.float32)
    return {
        "act_mean": jnp.mean(p),
        "act_min": jnp.min(p),
        "act_max": jnp.max(p),
        "act_std": jnp.std(p),
    }


@jax.jit
def binary_accuracy(y_true: jax.Array, y_pred: jax.Array, threshold: float = 0.5):
    return jnp.mean(((y_pred > threshold).astype(jnp.float32) == y_true).astype(jnp.float32))


def classifier_metrics(y_true: jax.Array, y_prob: jax.Array, threshold: float = 0.5) -> dict:
    """acc / auc / precision / recall, the classifier's compiled metric set
    (``Classification/train_adipose_classifier_v0.py:372-378``)."""
    tp, fp, fn, tn = confusion_counts(y_prob, y_true, threshold)
    tp, fp, fn, tn = (x.astype(jnp.float32) for x in (tp, fp, fn, tn))
    return {
        "acc": (tp + tn) / jnp.maximum(tp + fp + fn + tn, 1.0),
        "auc": roc_auc(y_prob, y_true),
        "precision": tp / jnp.maximum(tp + fp, 1.0),
        "recall": tp / jnp.maximum(tp + fn, 1.0),
    }
