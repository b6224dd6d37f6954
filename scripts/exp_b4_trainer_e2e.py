"""One-off: validate the auto-remat retry ladder END-TO-END on real TPU.

Builds a synthetic 1024² dataset, runs UNetTrainer at batch 4 (the size whose
train step fails to compile on v5e), and asserts training completes with the
fallback engaged.

Usage: python scripts/exp_b4_trainer_e2e.py   (TPU, serialized, ~15 min)
"""
import numpy as np


def main():
    import cv2
    from pathlib import Path

    from adipose_tpu.core.config import TrainConfig, UNetConfig
    from adipose_tpu.train.trainer_unet import UNetTrainer

    root = Path("/tmp/b4_e2e")
    rng = np.random.RandomState(0)
    for split, n in (("train", 8), ("val", 4)):
        (root / "dataset" / split / "images").mkdir(parents=True, exist_ok=True)
        (root / "dataset" / split / "masks").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            mask = np.zeros((1024, 1024), np.uint8)
            cv2.circle(mask, (512, 512), 200 + 10 * i, 255, -1)
            img = np.where(mask > 0, 210, 120).astype(np.uint8)
            img = np.clip(
                img + rng.randint(-20, 20, (1024, 1024)), 0, 255
            ).astype(np.uint8)
            cv2.imwrite(str(root / "dataset" / split / "images" / f"s0_r{i}_c0.jpg"), img)
            cv2.imwrite(str(root / "dataset" / split / "masks" / f"s0_r{i}_c0.tif"), mask)

    cfg = TrainConfig(batch_size=4, epochs_phase1=1, epochs_phase2=1,
                      early_stopping_patience=2, augment_level="light")
    mcfg = UNetConfig()  # full-size model: init_nb 44, tile 1024
    tr = UNetTrainer(root, cfg, mcfg, checkpoint_root="/tmp/b4_e2e/ckpt")
    assert not tr.model.remat
    tr.train()
    print("trained; model.remat =", tr.model.remat)
    arts = sorted(p.name for p in Path(tr.ckpt_dir).iterdir())
    print("artifacts:", arts)
    assert "weights_best_overall" in arts
    print("B4 E2E OK (fallback engaged)" if tr.model.remat
          else "B4 E2E OK (no fallback needed?)")


if __name__ == "__main__":
    main()
