"""End-to-end `adipose run-pipeline` on synthetic slides.

The reference's complete workflow is a bash orchestrator
(``Segmentation/run_complete_pipeline.sh:195-516``): dataset build → dataset
validation → two-phase training → val-set eval with threshold optimization →
test-set eval at the chosen threshold. This test runs the whole in-process
analog through the real CLI entry point on tiny synthetic data — the
integration test the reference never had (SURVEY.md §4).
"""

import json

import cv2
import numpy as np
import pytest


@pytest.fixture
def synthetic_slides(tmp_path, rng):
    """Four 192² slides with square fat annotations (slide-level split needs
    enough slides for non-empty train/val/test)."""
    pseudo = tmp_path / "Pseudocolored"
    fat_dir = tmp_path / "Masks" / "fat"
    pseudo.mkdir(parents=True)
    fat_dir.mkdir(parents=True)
    for s in range(4):
        img = (rng.rand(192, 192) * 80 + 100).astype(np.uint8)
        cv2.circle(img, (96, 96), 40, 255, -1)
        cv2.imwrite(str(pseudo / f"slide{s}.jpg"), img)
        square = [[60.0, 60.0], [130.0, 60.0], [130.0, 130.0], [60.0, 130.0]]
        (fat_dir / f"slide{s}.json").write_text(json.dumps([
            {"confidenceScore": 3,
             "annotation": {"elements": [{"type": "polyline",
                                          "points": square}]}}
        ]))
    return tmp_path


def test_run_pipeline_end_to_end(synthetic_slides, capsys, monkeypatch):
    from adipose_tpu.cli.main import main

    monkeypatch.chdir(synthetic_slides)  # checkpoints land under tmp
    rc = main([
        "run-pipeline",
        "--data-root", str(synthetic_slides),
        "--tile-size", "64",
        "--init-nb", "8",
        "--batch-size", "2",
        "--epochs-phase1", "1",
        "--epochs-phase2", "1",
        "--min-train-tiles", "1",
        "--val-ratio", "0.25",
        "--test-ratio", "0.25",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert set(summary) >= {"checkpoint_dir", "val_dice", "test_dice",
                            "optimal_threshold", "timings"}
    assert 0.0 <= summary["val_dice"] <= 1.0
    assert 0.0 <= summary["test_dice"] <= 1.0
    assert 0.0 < summary["optimal_threshold"] < 1.0
    assert set(summary["timings"]) >= {"build_s", "train_s", "val_eval_s",
                                       "test_eval_s"}

    # the reference artifact contract survives the full run
    from pathlib import Path

    ckpt = Path(summary["checkpoint_dir"])
    assert (ckpt / "normalization_stats.json").exists()
    assert (ckpt / "weights_best_overall").exists()
    evals = list(ckpt.glob("evaluation/*"))
    assert len(evals) >= 2  # val + test output dirs


def test_run_pipeline_validation_gate(synthetic_slides, monkeypatch):
    """Too-few tiles must abort before training (bash :111-167 analog)."""
    from adipose_tpu.cli.main import main

    monkeypatch.chdir(synthetic_slides)
    with pytest.raises(SystemExit, match="dataset validation failed"):
        main([
            "run-pipeline",
            "--data-root", str(synthetic_slides),
            "--tile-size", "64",
            "--min-train-tiles", "100000",
        ])
