"""Training-history plots + augmentation visualizer."""

import numpy as np
import pytest

from adipose_tpu.data.visualize_augment import visualize_augmentation
from adipose_tpu.train.plots import log_epoch_deltas, plot_training_history


def test_plot_training_history(tmp_path):
    (tmp_path / "phase1_training.log").write_text(
        "epoch,loss,dice_coef,val_loss,val_dice_coef,lr,epoch_time_s\n"
        "0,1.5,0.2,1.6,0.18,0.001,3.2\n1,1.2,0.3,1.3,0.28,0.001,3.1\n"
    )
    (tmp_path / "phase2_training.log").write_text(
        "epoch,loss,dice_coef,val_loss,val_dice_coef,lr,epoch_time_s\n"
        "0,1.0,0.4,1.1,0.35,0.0001,3.0\n"
    )
    out = plot_training_history(tmp_path)
    assert out.exists() and out.stat().st_size > 1000


def test_plot_missing_logs_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        plot_training_history(tmp_path)


def test_epoch_deltas():
    hist = [{"loss": 1.0, "dice": 0.2}, {"loss": 0.8, "dice": 0.3}]
    lines = log_epoch_deltas(hist)
    assert any("loss" in l for l in lines)
    assert any("-" in l for l in lines[2:])  # loss decreased


def test_visualize_augmentation(tmp_path, rng):
    img = (rng.rand(64, 64) * 255).astype(np.float32)
    mask = (rng.rand(64, 64) > 0.6).astype(np.float32)
    out = visualize_augmentation(img, mask, "light", num_examples=2,
                                 save_path=tmp_path / "aug.png")
    assert out.exists()
