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
    if img.ndim == 3:
        img = cv2.cvtColor(img[..., :3], cv2.COLOR_RGB2GRAY)
    x = jnp.asarray(img).astype(jnp.float32)  # native-dtype upload, cast on device

    if cfg.deband_method == "fft":
        x = remove_banding_fft(x, (cfg.fft_freq_low, cfg.fft_freq_high),
                               vertical_width=cfg.fft_width,
                               smooth_sigma_scale=cfg.fft_sigma_scale,
                               blend=cfg.fft_blend)
    elif cfg.deband_method == "morphological":
        x = remove_banding_morphological(x, cfg.morph_width, cfg.morph_height)
    elif cfg.deband_method in ("column_norm", "column"):
        x = remove_banding_column_normalize(
            x, preserve_global=cfg.column_preserve_global)

    if cfg.normalization_method == "percentile":
        from adipose_tpu.ops.normalize import percentile_stretch_255

        x = percentile_stretch_255(x, cfg.percentile_low, cfg.percentile_high)
    elif cfg.normalization_method == "zscore":
        from adipose_tpu.ops.normalize import zscore_to_target

        x = zscore_to_target(x)

    if cfg.illumination_method == "rolling_ball":
        x = correct_illumination_rolling_ball(x, cfg.rolling_ball_radius)
    elif cfg.illumination_method in ("gaussian", "polynomial"):
        x = correct_illumination_polynomial(x, cfg.poly_sigma)
    elif cfg.illumination_method == "tophat":
        x = correct_illumination_tophat(x, cfg.tophat_kernel)
    elif cfg.illumination_method == "clahe":
        x = _clahe_padded(x, cfg.clahe_illum_clip, cfg.clahe_illum_tile)

    if cfg.apply_clahe:
        x = _clahe_padded(x, cfg.clahe_clip, cfg.clahe_grid)

    if cfg.sharpen:
        x = sharpen_unsharp(x, cfg.sharpen_sigma, cfg.sharpen_amount)

    return np.clip(np.asarray(x), 0, 255).astype(np.uint8)


def process_directory(
    input_dir: str | Path,
    output_dir: str | Path,
    cfg: ECMPreprocessConfig | None = None,
    pattern: str = "*.jpg",
    visualize: bool = False,
    max_visualizations: int = 10,
    test_mode: bool = False,
    test_samples: int = 5,
    seed: int = 865,
) -> dict:
    """Batch driver with ``processing_log.json``
    (``preprocess_small_MS_SIMs.py:601-760``). ``visualize`` writes
    before/after side-by-sides into ``visualizations/`` (up to
    ``max_visualizations``); ``test_mode`` randomly samples
    ``test_samples``+1 images instead of the whole directory (:936-945)."""
    cfg = cfg or ECMPreprocessConfig()
    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(input_dir.glob(pattern)) + sorted(input_dir.glob("*.png")) + sorted(
        input_dir.glob("*.tif")
    )
    if test_mode and len(files) > test_samples + 1:
        rng = np.random.RandomState(seed)
        idx = rng.choice(len(files) - 1, test_samples, replace=False)
        files = [files[0]] + [files[i + 1] for i in sorted(idx)]
    log = {
        "timestamp": datetime.now().isoformat(),
        "config": vars(cfg).copy(),
        "processed": [],
        "errors": [],
    }
    n_vis = 0
    for f in files:
        try:
            img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise ValueError("unreadable")
            out = preprocess_ecm_image(img, cfg)
            out_path = output_dir / f.name
            cv2.imwrite(str(out_path), out, [cv2.IMWRITE_JPEG_QUALITY, 95])
            if visualize and n_vis < max_visualizations:
                vis_dir = output_dir / "visualizations"
                vis_dir.mkdir(exist_ok=True)
                side = np.concatenate([img, out], axis=1)
                cv2.imwrite(str(vis_dir / f"{f.stem}_before_after.jpg"), side,
                            [cv2.IMWRITE_JPEG_QUALITY, 90])
                n_vis += 1
            log["processed"].append(f.name)
        except Exception as e:  # per-item skip-and-continue (reference style)
            log["errors"].append({"file": f.name, "error": str(e)})
    (output_dir / "processing_log.json").write_text(json.dumps(log, indent=2, default=str))
    return log
