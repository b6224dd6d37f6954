"""Classifier evaluation machinery: TTA, ensembling, calibration, sweeps,
example dumps; seg-as-classifier eval; batch checkpoint evaluation."""

import json
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.eval.classifier_eval import (
    aggregate_by_slide,
    apply_calibrator,
    compute_class_statistics,
    dump_examples,
    ensemble_snapshots,
    evaluate_predictions,
    fit_calibrator,
    run_classifier_evaluation,
)
from adipose_tpu.eval.tile_classification import (
    calculate_fat_percentage,
    evaluate_tiles,
    multi_threshold_sweep,
    run_tile_classification_evaluation,
)


class TestClassifierEval:
    @pytest.fixture
    def labeled_probs(self, rng):
        labels = (rng.rand(200) > 0.5).astype(np.float32)
        probs = np.clip(labels * 0.6 + rng.rand(200) * 0.4, 0.01, 0.99)
        return labels, probs.astype(np.float64)

    def test_evaluate_predictions_structure(self, labeled_probs):
        labels, probs = labeled_probs
        m = evaluate_predictions(labels, probs)
        assert 0.5 < m["roc_auc"] <= 1.0
        assert len(m["threshold_metrics"]["per_threshold"]) == 19
        best = m["threshold_metrics"]["best_f1"]
        assert best["f1"] >= m["threshold_metrics"]["default_0.5"]["f1"] - 1e-9
        cm = best["confusion_matrix"]
        assert sum(cm.values()) == 200

    def test_ensemble_snapshots_logit_mean(self):
        p = ensemble_snapshots([np.array([0.8]), np.array([0.8])])
        assert p[0] == pytest.approx(0.8, abs=1e-6)
        p2 = ensemble_snapshots([np.array([0.9]), np.array([0.1])])
        assert p2[0] == pytest.approx(0.5, abs=1e-6)  # symmetric logits cancel

    @pytest.mark.parametrize("method", ["temperature", "platt", "isotonic"])
    def test_calibrators_improve_or_preserve(self, labeled_probs, method):
        labels, probs = labeled_probs
        cal = fit_calibrator(probs, labels, method)
        out = apply_calibrator(probs, cal)
        assert out.shape == probs.shape
        assert (out >= 0).all() and (out <= 1).all()

    def test_sweep_matches_sklearn_per_threshold(self, labeled_probs):
        """The vectorized (T×N) confusion sweep must reproduce sklearn's
        per-threshold P/R/F1 with zero_division=0 (the reference's loop,
        eval_adipose_classifier.py:378-390) exactly."""
        from sklearn import metrics as skm

        labels, probs = labeled_probs
        m = evaluate_predictions(labels, probs)
        for row in m["threshold_metrics"]["per_threshold"]:
            preds = (probs >= row["threshold"]).astype(int)
            assert row["precision"] == pytest.approx(
                skm.precision_score(labels, preds, zero_division=0), abs=1e-12)
            assert row["recall"] == pytest.approx(
                skm.recall_score(labels, preds, zero_division=0), abs=1e-12)
            assert row["f1"] == pytest.approx(
                skm.f1_score(labels, preds, zero_division=0), abs=1e-12)
        # all-negative predictions exercise the zero_division branches
        z = evaluate_predictions(np.array([0.0, 1.0] * 4), np.full(8, 0.01))
        rows = z["threshold_metrics"]["per_threshold"]
        assert all(r["precision"] == 0.0 and r["f1"] == 0.0 for r in rows)

    def test_class_statistics(self, labeled_probs):
        labels, probs = labeled_probs
        s = compute_class_statistics(labels, probs)
        assert s["adipose"]["count"] + s["not_adipose"]["count"] == 200
        assert s["adipose"]["mean_prob"] > s["not_adipose"]["mean_prob"]

    def test_aggregate_by_slide(self):
        files = ["s1_r0_c0.jpg", "s1_r0_c1.jpg", "s2_r0_c0.jpg"]
        out = aggregate_by_slide(files, np.array([1, 1, 0]), np.array([0.9, 0.7, 0.2]))
        assert out["s1"]["n_tiles"] == 2
        assert out["s1"]["mean_prob"] == pytest.approx(0.8)

    def test_dump_examples(self, tmp_path, rng):
        files = []
        for i in range(4):
            p = tmp_path / f"t{i}.jpg"
            cv2.imwrite(str(p), (rng.rand(8, 8) * 255).astype(np.uint8))
            files.append(p)
        counts = dump_examples(files, np.array([1, 0, 1, 0]),
                               np.array([0.9, 0.8, 0.1, 0.2]), 0.5, tmp_path)
        assert counts == {"TP": 1, "FP": 1, "FN": 1, "TN": 1}
        assert (tmp_path / "examples" / "TP").exists()

    def test_full_driver_with_stub_model(self, tmp_path, rng):
        # build a tiny class dataset
        for cls, base in (("adipose", 200), ("not_adipose", 60)):
            d = tmp_path / "test" / cls
            d.mkdir(parents=True)
            for i in range(6):
                img = np.full((32, 32), base, np.uint8)
                img += rng.randint(0, 30, (32, 32)).astype(np.uint8)
                cv2.imwrite(str(d / f"s{i % 2}_r{i}_c0.jpg"), img)
        from adipose_tpu.data.loader import ClassificationDataset

        ds = ClassificationDataset(tmp_path / "test", 4)

        def predict(variables, images):  # brightness-based stub classifier
            return jnp.clip(jnp.mean(images, axis=(1, 2)) / 255.0, 0.01, 0.99)

        results = run_classifier_evaluation(
            predict, [None], ds, tmp_path / "out",
            tta_mode="basic", calibration="platt", calibration_split=0.3,
        )
        assert results["roc_auc"] > 0.9  # separable by construction
        assert (tmp_path / "out" / "metrics.json").exists()
        assert (tmp_path / "out" / "predictions.csv").exists()
        assert (tmp_path / "out" / "roc_curve.png").exists()
        assert results["calibration"]["method"] == "platt"
        assert "slide_level" in results

    def test_driver_external_calibration_and_slide_map(self, tmp_path, rng):
        """Reference calibration flow (eval_adipose_classifier.py:790-814):
        fit on a held-out val set, evaluate the FULL test set; plus --slide-map
        aggregation and --no-plots/--num-examples knobs."""
        import pandas as pd

        for split in ("test", "val"):
            for cls, base in (("adipose", 200), ("not_adipose", 60)):
                d = tmp_path / split / cls
                d.mkdir(parents=True)
                for i in range(6):
                    img = np.full((32, 32), base, np.uint8)
                    img += rng.randint(0, 30, (32, 32)).astype(np.uint8)
                    cv2.imwrite(str(d / f"{split}s{i % 2}_r{i}_c0.jpg"), img)
        from adipose_tpu.data.loader import ClassificationDataset

        ds = ClassificationDataset(tmp_path / "test", 4)
        cal = ClassificationDataset(tmp_path / "val", 4)
        slide_map = {Path(f).stem: f"slide{i % 2}" for i, f in enumerate(ds.files)}

        def predict(variables, images):
            return jnp.clip(jnp.mean(images, axis=(1, 2)) / 255.0, 0.01, 0.99)

        results = run_classifier_evaluation(
            predict, [None], ds, tmp_path / "out2",
            tta_mode="basic", calibration="temperature", calibration_dataset=cal,
            slide_map=slide_map, plots=False, num_examples=2,
        )
        # full test set evaluated (no internal split)
        df = pd.read_csv(tmp_path / "out2" / "predictions.csv")
        assert len(df) == len(ds.files)
        assert "val_calibrated_auc" in results["calibration"]
        assert set(results["slide_level"]) == {"slide0", "slide1"}
        assert "median_prob" in results["slide_level"]["slide0"]
        assert not (tmp_path / "out2" / "roc_curve.png").exists()
        assert all(v <= 2 for v in results["example_counts"].values())


class TestTileClassification:
    def test_fat_percentage(self):
        pred = np.zeros((10, 10))
        pred[:5] = 0.9
        assert calculate_fat_percentage(pred) == pytest.approx(0.5)

    def test_evaluate_tiles(self):
        preds = [np.full((8, 8), 0.9), np.zeros((8, 8)), np.full((8, 8), 0.9)]
        trues = [np.ones((8, 8)), np.zeros((8, 8)), np.zeros((8, 8))]
        m = evaluate_tiles(preds, trues)
        cm = m["confusion_matrix"]
        assert cm == {"tp": 1, "fp": 1, "fn": 0, "tn": 1}
        assert m["recall"] == pytest.approx(1.0, abs=1e-6)

    def test_multi_threshold(self, tmp_path):
        preds = [np.full((8, 8), 0.9), np.zeros((8, 8))]
        trues = [np.ones((8, 8)), np.zeros((8, 8))]
        sweep = multi_threshold_sweep(preds, trues)
        assert len(sweep) == 5
        res = run_tile_classification_evaluation(preds, trues, tmp_path,
                                                 multi_threshold=True)
        assert "threshold_sweep" in res
        assert (tmp_path / "tile_classification_metrics.json").exists()


class TestBatchEval:
    def test_discover_and_config_string(self, tmp_path):
        from adipose_tpu.core.config import EvalConfig
        from adipose_tpu.eval.batch_eval import build_eval_config_string, discover_checkpoints

        run = tmp_path / "20260101_000000_adipose_x"
        run.mkdir()
        (run / "normalization_stats.json").write_text('{"mean": 1, "std": 2}')
        (tmp_path / "not_a_checkpoint").mkdir()
        found = discover_checkpoints(tmp_path)
        assert [d.name for d in found] == ["20260101_000000_adipose_x"]
        cfg = EvalConfig(use_tta=True, tta_mode="full", use_sliding_window=True,
                         sliding_overlap=0.25)
        assert build_eval_config_string(cfg) == "tta_full_sw_gaussian_o25"

    def test_batch_evaluator_records_failures(self, tmp_path):
        from adipose_tpu.core.config import EvalConfig
        from adipose_tpu.eval.batch_eval import CheckpointBatchEvaluator

        run = tmp_path / "ckpts" / "broken_adipose_run"
        run.mkdir(parents=True)
        (run / "normalization_stats.json").write_text('{"mean": 1, "std": 2}')
        be = CheckpointBatchEvaluator(tmp_path / "ckpts", tmp_path / "nodata",
                                      EvalConfig(n_bootstrap=10))
        records = be.run()
        assert records[0]["status"] == "failed"
        assert (tmp_path / "ckpts" / "batch_evaluation_summary.json").exists()

    def test_collect_metrics(self, tmp_path):
        import pandas as pd

        from adipose_tpu.core.config import EvalConfig
        from adipose_tpu.eval.batch_eval import collect_checkpoint_metrics, plot_checkpoint_comparison

        run = tmp_path / "20260101_000000_adipose_x"
        eval_dir = run / "evaluation" / "test_original"
        eval_dir.mkdir(parents=True)
        (run / "normalization_stats.json").write_text("{}")
        pd.DataFrame({
            "Metric": ["Dice Score"], "Mean": [0.7],
            "CI_Lower": [0.6], "CI_Upper": [0.8],
        }).to_csv(eval_dir / "test_comprehensive_results.csv", index=False)
        df = collect_checkpoint_metrics(tmp_path, EvalConfig())
        assert len(df) == 1
        out = plot_checkpoint_comparison(df, tmp_path / "cmp.png")
        assert out is not None and (tmp_path / "cmp.png").exists()
