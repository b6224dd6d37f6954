"""ECM fluorescence-channel preprocessing pipeline.

Behavioral spec: ``preprocess_small_MS_SIMs.py:462-760``
(``preprocess_ecm_image`` + ``process_directory``): composable stages —
debanding (fft | morphological | column_norm) → illumination correction
(rolling_ball | polynomial/gaussian | tophat | clahe) → contrast CLAHE →
unsharp sharpening — with a ``processing_log.json`` audit trail.

All stages are the device-side ops from :mod:`adipose_tpu.ops`; a directory of
chunks processes as a stream of device calls.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np

from adipose_tpu.core.config import ECMPreprocessConfig
from adipose_tpu.ops.clahe import clahe
from adipose_tpu.ops.fftops import (
    correct_illumination_polynomial,
    remove_banding_column_normalize,
    remove_banding_fft,
    sharpen_unsharp,
)
from adipose_tpu.ops.morphology import (
    correct_illumination_rolling_ball,
    correct_illumination_tophat,
    remove_banding_morphological,
)


def _clahe_padded(x: jnp.ndarray, clip: float, grid: int) -> jnp.ndarray:
    h, w = x.shape
    ph, pw = (-h) % grid, (-w) % grid
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    return clahe(x, clip, grid)[:h, :w]


def preprocess_ecm_image(img: np.ndarray, cfg: ECMPreprocessConfig | None = None) -> np.ndarray:
    """Run the configured stage stack on a grayscale uint8 image."""
    cfg = cfg or ECMPreprocessConfig()
    x = jnp.asarray(img.astype(np.float32))

    if cfg.deband_method == "fft":
        lo = cfg.fft_center_freq * 0.7
        hi = cfg.fft_center_freq * 1.3
        x = remove_banding_fft(x, (lo, hi), blend=cfg.fft_blend)
    elif cfg.deband_method == "morphological":
        x = remove_banding_morphological(x)
    elif cfg.deband_method == "column_norm":
        x = remove_banding_column_normalize(x)

    if cfg.illumination_method == "rolling_ball":
        x = correct_illumination_rolling_ball(x, 100)
    elif cfg.illumination_method in ("gaussian", "polynomial"):
        x = correct_illumination_polynomial(x, 150.0)
    elif cfg.illumination_method == "tophat":
        x = correct_illumination_tophat(x, 301)
    elif cfg.illumination_method == "clahe":
        x = _clahe_padded(x, 2.0, 16)

    if cfg.apply_clahe:
        x = _clahe_padded(x, cfg.clahe_clip, cfg.clahe_grid)

    if cfg.sharpen:
        x = sharpen_unsharp(x, 1.0, cfg.sharpen_amount)

    return np.clip(np.asarray(x), 0, 255).astype(np.uint8)


def process_directory(
    input_dir: str | Path,
    output_dir: str | Path,
    cfg: ECMPreprocessConfig | None = None,
    pattern: str = "*.jpg",
) -> dict:
    """Batch driver with ``processing_log.json``
    (``preprocess_small_MS_SIMs.py:601-760``)."""
    cfg = cfg or ECMPreprocessConfig()
    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(input_dir.glob(pattern)) + sorted(input_dir.glob("*.png")) + sorted(
        input_dir.glob("*.tif")
    )
    log = {
        "timestamp": datetime.now().isoformat(),
        "config": vars(cfg).copy(),
        "processed": [],
        "errors": [],
    }
    for f in files:
        try:
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise ValueError("unreadable")
            out = preprocess_ecm_image(img, cfg)
            out_path = output_dir / f.name
            cv2.imwrite(str(out_path), out, [cv2.IMWRITE_JPEG_QUALITY, 95])
            log["processed"].append(f.name)
        except Exception as e:  # per-item skip-and-continue (reference style)
            log["errors"].append({"file": f.name, "error": str(e)})
    (output_dir / "processing_log.json").write_text(json.dumps(log, indent=2, default=str))
    return log
