"""Classifier evaluation: TTA, snapshot ensembling, calibration, threshold
sweeps, class statistics, plots, example dumps.

Behavioral spec: ``Classification/eval_adipose_classifier.py``:
  * deterministic 8-way geometric TTA by transform id (:98-102, :311-322);
  * snapshot ensembling in logit space (:324-336);
  * probability calibration — temperature / Platt / isotonic fit on a held-out
    val split (:339-370);
  * ROC/PR AUC, per-threshold sweep 0.05..0.95 step 0.05 with best-F1 pick,
    confusion matrices at 0.5 and best (:373-416);
  * per-class probability statistics (:419-442);
  * plots (ROC/PR/calibration/histograms/confusion) and TP/FP/FN/TN example
    image dumps (:582);
  * optional slide-level aggregation via the slide-base grouping (:554);
  * structured ``evaluation/<testdir>_<suffixes>/`` outputs (:726-752).

TPU-native: all 8 TTA views × batch go through ONE jitted forward per batch
(:mod:`adipose_tpu.eval.tta`); calibration fits on host (sklearn, tiny data).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from adipose_tpu.eval.tta import make_classifier_tta_predict
from adipose_tpu.train.trainer_classifier import extract_slide_base


def predict_with_tta(predict_fn, variables, dataset, mode: str = "full",
                     batch_size: int = 16) -> tuple:
    """Predict a ClassificationDataset with geometric TTA; returns
    (probs, labels)."""
    tta = make_classifier_tta_predict(predict_fn, mode)
    probs, labels = [], []
    for imgs, labs in dataset.epoch_batches(0, shuffle=False):
        # native-dtype upload (u8 tiles, 4× fewer tunnel bytes); the predict
        # path casts on device (make_inception_preprocess takes images_u8)
        out = np.asarray(tta(variables, jnp.asarray(imgs)))
        probs.append(out)
        labels.append(labs)
    n = len(dataset)
    return np.concatenate(probs)[:n], np.concatenate(labels)[:n]


def ensemble_snapshots(prob_list) -> np.ndarray:
    """Logit-space snapshot averaging (``eval_adipose_classifier.py:324-336``)."""
    logits = [
        np.log(np.clip(p, 1e-7, 1) / np.clip(1 - p, 1e-7, 1)) for p in prob_list
    ]
    return 1.0 / (1.0 + np.exp(-np.mean(logits, axis=0)))


def _to_logit(p: np.ndarray) -> np.ndarray:
    """Stable prob→logit with the reference's 1e-7 odds clip (:334,344)."""
    return np.log(p / np.clip(1.0 - p, 1e-7, 1.0))


class Calibrator:
    """Fitted probability calibrator.

    The reference exposes three methods (``eval_adipose_classifier.py:339-370``):
    a sigmoid refit on logits ("temperature"), a sigmoid refit on raw
    probabilities ("platt"), and isotonic regression. Fitting is
    schema-constrained host glue — the calibration set is tiny and the fitted
    family (1-D sigmoid / monotone step function) is fixed by the method name —
    so sklearn does the solve; everything around it is ours.
    """

    #: method → feature map applied to probabilities before the 1-D fit.
    _FEATURES = {"temperature": _to_logit, "platt": lambda p: p}

    def __init__(self, method: str, probs: np.ndarray, labels: np.ndarray):
        self.method = method
        if method in self._FEATURES:
            from sklearn.linear_model import LogisticRegression

            self._model = LogisticRegression()
            self._model.fit(self._FEATURES[method](probs)[:, None], labels)
            self.info = {"coef": self._model.coef_.tolist(),
                         "intercept": self._model.intercept_.tolist()}
        elif method == "isotonic":
            from sklearn.isotonic import IsotonicRegression

            self._model = IsotonicRegression(out_of_bounds="clip")
            self._model.fit(probs, labels)
            fitted = self(probs)
            self.info = {"y_min": float(fitted.min()), "y_max": float(fitted.max())}
        else:
            raise ValueError(f"unknown calibration method {method!r}")

    def __call__(self, probs: np.ndarray) -> np.ndarray:
        if self.method in self._FEATURES:
            feat = self._FEATURES[self.method](probs)[:, None]
            return self._model.predict_proba(feat)[:, 1]
        return self._model.transform(probs)


def fit_calibrator(probs: np.ndarray, labels: np.ndarray, method: str) -> Calibrator:
    """Fit a :class:`Calibrator` (behavior of :339-370)."""
    return Calibrator(method, probs, labels)


def apply_calibrator(probs: np.ndarray, calibrator: Calibrator | None):
    """Identity when ``calibrator`` is None (:360-362)."""
    return probs if calibrator is None else calibrator(probs)


def _confusion_sweep(labels: np.ndarray, probs: np.ndarray,
                     thresholds: np.ndarray) -> dict:
    """Confusion counts + P/R/F1 for ALL thresholds in one vectorized pass.

    Returns arrays keyed tn/fp/fn/tp/precision/recall/f1, each shaped like
    ``thresholds``. sklearn ``zero_division=0`` semantics: an empty
    denominator yields 0.
    """
    pos = labels.astype(bool)
    pred = probs[None, :] >= np.asarray(thresholds).reshape(-1, 1)  # (T, N)
    tp = (pred & pos).sum(axis=1).astype(float)
    fp = (pred & ~pos).sum(axis=1).astype(float)
    fn = (~pred & pos).sum(axis=1).astype(float)
    tn = (~pred & ~pos).sum(axis=1).astype(float)
    with np.errstate(invalid="ignore", divide="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        recall = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        f1 = np.where(2 * tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn), 0.0)
    return {"tn": tn, "fp": fp, "fn": fn, "tp": tp,
            "precision": precision, "recall": recall, "f1": f1}


def evaluate_predictions(labels: np.ndarray, probs: np.ndarray) -> dict:
    """AUCs + 0.05..0.95 threshold sweep + confusion summaries.

    Output schema matches the reference's metrics.json contract
    (``eval_adipose_classifier.py:373-416``): ``roc_auc``/``pr_auc``,
    ``threshold_metrics.{default_0.5,best_f1,per_threshold}``,
    ``best_threshold``; first-maximum F1 tie-break; specificity uses the
    reference's ``+1e-7`` denominator guard. The sweep itself is one
    vectorized (T×N) pass rather than per-threshold metric calls.
    """
    from sklearn import metrics as skm

    grid = np.linspace(0.05, 0.95, 19)
    sweep = _confusion_sweep(labels, probs, grid)
    best_idx = int(np.argmax(sweep["f1"]))  # first maximum, like the reference

    def summarize(s, i, thresh) -> dict:
        tn, fp = s["tn"][i], s["fp"][i]
        return {
            "threshold": float(thresh),
            "confusion_matrix": {k: int(s[k][i]) for k in ("tn", "fp", "fn", "tp")},
            "precision": float(s["precision"][i]),
            "recall": float(s["recall"][i]),
            "f1": float(s["f1"][i]),
            "specificity": float(tn / (tn + fp + 1e-7)),
        }

    # best_f1 reads its grid row straight from the sweep; default_0.5 needs
    # its own (1×N) pass because grid[9] is 0.4999…94, not exactly 0.5 (the
    # reference also thresholds the default summary at the literal 0.5)
    half = _confusion_sweep(labels, probs, np.array([0.5]))
    return {
        "roc_auc": float(skm.roc_auc_score(labels, probs)),
        "pr_auc": float(skm.average_precision_score(labels, probs)),
        "threshold_metrics": {
            "default_0.5": summarize(half, 0, 0.5),
            "best_f1": summarize(sweep, best_idx, grid[best_idx]),
            "per_threshold": [
                {"threshold": float(t),
                 "precision": float(sweep["precision"][i]),
                 "recall": float(sweep["recall"][i]),
                 "f1": float(sweep["f1"][i])}
                for i, t in enumerate(grid)
            ],
        },
        "best_threshold": float(grid[best_idx]),
    }


def compute_class_statistics(labels: np.ndarray, probs: np.ndarray) -> dict:
    """(:419-442)."""
    out = {}
    for name, mask in (("adipose", labels == 1), ("not_adipose", labels == 0)):
        p = probs[mask]
        out[name] = {
            "count": int(mask.sum()),
            "mean_prob": float(p.mean()) if mask.any() else 0.0,
            "std_prob": float(p.std()) if mask.any() else 0.0,
            "median_prob": float(np.median(p)) if mask.any() else 0.0,
            "min_prob": float(p.min()) if mask.any() else 0.0,
            "max_prob": float(p.max()) if mask.any() else 0.0,
        }
    return out


def aggregate_by_slide(files, labels: np.ndarray, probs: np.ndarray,
                       slide_map: dict | None = None) -> dict:
    """Slide-level probability summary (:554-585).

    ``slide_map``: optional tile-stem → slide-id mapping (the ``--slide-map``
    CSV, columns ``tile,slide_id``); tiles absent from the map are skipped,
    matching the reference. Without a map, slide ids are inferred from the
    filename.
    """
    groups: dict = {}
    for f, lab, p in zip(files, labels, probs):
        if slide_map is not None:
            slide = slide_map.get(Path(str(f)).stem)
            if slide is None:
                continue
        else:
            slide = extract_slide_base(str(f))
        groups.setdefault(slide, []).append((lab, p))
    out = {}
    for slide, items in groups.items():
        labs = np.array([l for l, _ in items])
        ps = np.array([p for _, p in items])
        out[slide] = {
            "n_tiles": len(items),
            "mean_prob": float(ps.mean()),
            "median_prob": float(np.median(ps)),
            "frac_positive_tiles": float(labs.mean()),
        }
    return out


def dump_examples(files, labels, probs, threshold: float, output_dir: Path,
                  max_per_category: int = 20, percentile_norm: bool = False,
                  p_low: float = 1.0, p_high: float = 99.0):
    """TP/FP/FN/TN example-image dumps (:582). ``percentile_norm`` renders
    the 1-99 percentile-normalized view instead of copying the raw tile
    (``--percentile-norm-examples``, eval_adipose_classifier.py:151)."""
    import cv2

    output_dir = Path(output_dir)
    preds = (probs >= threshold).astype(int)
    counts = {"TP": 0, "FP": 0, "FN": 0, "TN": 0}
    for f, lab, pr in zip(files, labels.astype(int), preds):
        cat = ("TP" if lab and pr else "FP" if pr else "FN" if lab else "TN")
        if counts[cat] >= max_per_category:
            continue
        d = output_dir / "examples" / cat
        d.mkdir(parents=True, exist_ok=True)
        if percentile_norm:
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            lo, hi = np.percentile(img, p_low), np.percentile(img, p_high)
            normed = np.clip((img - lo) / max(hi - lo, 1e-3), 0, 1) * 255
            cv2.imwrite(str(d / Path(f).name), normed.astype(np.uint8))
        else:
            shutil.copy2(f, d / Path(f).name)
        counts[cat] += 1
    return counts


def save_plots(labels: np.ndarray, probs: np.ndarray, output_dir: Path):
    """ROC / PR / calibration / probability-histogram plots."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn import metrics as skm

    output_dir = Path(output_dir)
    fpr, tpr, _ = skm.roc_curve(labels, probs)
    plt.figure(); plt.plot(fpr, tpr); plt.plot([0, 1], [0, 1], "--")
    plt.xlabel("FPR"); plt.ylabel("TPR"); plt.title("ROC")
    plt.savefig(output_dir / "roc_curve.png", dpi=120); plt.close()

    prec, rec, _ = skm.precision_recall_curve(labels, probs)
    plt.figure(); plt.plot(rec, prec)
    plt.xlabel("Recall"); plt.ylabel("Precision"); plt.title("PR")
    plt.savefig(output_dir / "pr_curve.png", dpi=120); plt.close()

    bins = np.linspace(0, 1, 11)
    centers = (bins[:-1] + bins[1:]) / 2
    frac = [labels[(probs >= lo) & (probs < hi)].mean() if ((probs >= lo) & (probs < hi)).any() else np.nan
            for lo, hi in zip(bins[:-1], bins[1:])]
    plt.figure(); plt.plot(centers, frac, "o-"); plt.plot([0, 1], [0, 1], "--")
    plt.xlabel("Predicted prob"); plt.ylabel("Observed freq"); plt.title("Calibration")
    plt.savefig(output_dir / "calibration.png", dpi=120); plt.close()

    plt.figure()
    plt.hist(probs[labels == 1], bins=30, alpha=0.6, label="adipose")
    plt.hist(probs[labels == 0], bins=30, alpha=0.6, label="not_adipose")
    plt.legend(); plt.xlabel("Probability")
    plt.savefig(output_dir / "probability_histogram.png", dpi=120); plt.close()


def run_classifier_evaluation(
    predict_fn,
    variables_list,
    dataset,
    output_dir: str | Path,
    tta_mode: str = "full",
    use_tta: bool = True,
    calibration: str | None = None,
    calibration_split: float = 0.3,
    calibration_dataset=None,
    save_examples: bool = True,
    num_examples: int = 20,
    slide_aggregate: bool = True,
    slide_map: dict | None = None,
    plots: bool = True,
    percentile_norm_examples: bool = False,
    example_p_low: float = 1.0,
    example_p_high: float = 99.0,
    seed: int = 865,
) -> dict:
    """Full evaluation driver. ``variables_list``: one or more model snapshots
    (>1 ⇒ logit-space ensembling).

    Calibration: with ``calibration_dataset`` (the reference flow,
    ``eval_adipose_classifier.py:790-814``), the calibrator is fit on that
    held-out set with the identical TTA+ensemble pipeline and the FULL test
    set is evaluated calibrated. Without one, falls back to an internal
    ``calibration_split`` of the test set (our extension — the reference
    errors out instead).
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    def collect(ds):
        prob_list = []
        labels = None
        for variables in variables_list:
            if use_tta:
                probs, labels = predict_with_tta(predict_fn, variables, ds, tta_mode)
            else:
                ps, ls = [], []
                for imgs, labs in ds.epoch_batches(0, shuffle=False):
                    ps.append(np.asarray(predict_fn(variables, jnp.asarray(imgs))))
                    ls.append(labs)
                probs, labels = np.concatenate(ps)[: len(ds)], np.concatenate(ls)[: len(ds)]
            prob_list.append(probs)
        return (ensemble_snapshots(prob_list) if len(prob_list) > 1
                else prob_list[0]), labels

    probs, labels = collect(dataset)

    calibrator_info = None
    if calibration and calibration_dataset is not None:
        from sklearn import metrics as skm

        cal_probs, cal_labels = collect(calibration_dataset)
        calibrator = fit_calibrator(cal_probs, cal_labels, calibration)
        cal_applied = apply_calibrator(cal_probs, calibrator)
        calibrator_info = {
            "method": calibrator.method, "info": calibrator.info,
            "val_calibrated_auc": float(skm.roc_auc_score(cal_labels, cal_applied)),
            "val_calibrated_pr_auc": float(
                skm.average_precision_score(cal_labels, cal_applied)),
        }
        probs_eval = apply_calibrator(probs, calibrator)
        labels_eval, files_eval = labels, list(dataset.files)
    elif calibration:
        rng = np.random.RandomState(seed)
        idx = rng.permutation(len(probs))
        n_cal = int(len(probs) * calibration_split)
        cal_idx, eval_idx = idx[:n_cal], idx[n_cal:]
        calibrator = fit_calibrator(probs[cal_idx], labels[cal_idx], calibration)
        calibrator_info = {"method": calibrator.method, "info": calibrator.info}
        probs_eval = apply_calibrator(probs[eval_idx], calibrator)
        labels_eval = labels[eval_idx]
        files_eval = [dataset.files[i] for i in eval_idx]
    else:
        probs_eval, labels_eval, files_eval = probs, labels, list(dataset.files)

    results = evaluate_predictions(labels_eval, probs_eval)
    results["class_statistics"] = compute_class_statistics(labels_eval, probs_eval)
    results["calibration"] = calibrator_info
    if slide_aggregate:
        results["slide_level"] = aggregate_by_slide(
            files_eval, labels_eval, probs_eval, slide_map)

    if plots:
        save_plots(labels_eval, probs_eval, output_dir)
    if save_examples:
        results["example_counts"] = dump_examples(
            files_eval, labels_eval, probs_eval, results["best_threshold"],
            output_dir, max_per_category=num_examples,
            percentile_norm=percentile_norm_examples,
            p_low=example_p_low, p_high=example_p_high,
        )
    import pandas as pd

    pd.DataFrame({
        "file": [str(f) for f in files_eval],
        "label": labels_eval.astype(int),
        "probability": probs_eval,
    }).to_csv(output_dir / "predictions.csv", index=False)
    (output_dir / "metrics.json").write_text(json.dumps(results, indent=2, default=float))
    return results
