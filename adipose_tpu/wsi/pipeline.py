"""End-to-end dual-model WSI pipeline: tile → QC → classify → segment → rebuild.

The reference runs this as four separate scripts glued by bash
(``Segmentation/run_complete_pipeline.sh``) and never fuses the two models.
Here the cascade is one driver with a fused device path:

  1. chunk/tile the WSI (host IO, :mod:`adipose_tpu.wsi.chunker` / tile grid);
  2. QC-filter tiles in device batches (:mod:`adipose_tpu.ops.qc`);
  3. classify tiles (InceptionV3) in device batches;
  4. segment only tiles classified adipose-positive (U-Net ± TTA) — negative
     tiles short-circuit to zero masks, saving the expensive 1024² U-Net pass;
  5. Gaussian-blend reconstruct the full-slide probability map.

This classify-then-segment gating is the TPU-native analog of the reference's
two-model workflow (classification finds candidate regions; segmentation
refines them — ``README.md`` workflow), expressed as one batched program chain.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np

from adipose_tpu.ops.blend import blend_tiles, gaussian_weight_map, sliding_window_positions
from adipose_tpu.ops.qc import classify_tiles_batch


@dataclass
class PipelineResult:
    probability_map: np.ndarray
    n_tiles: int
    n_good: int
    n_positive: int
    timings: dict


class DualModelWSIPipeline:
    def __init__(
        self,
        classifier_predict,  # (variables, gray_u8_batch (B,T,T)) -> (B,) probs
        classifier_variables,
        segmenter_predict,   # (params, gray_batch (B,T,T)) -> (B,T,T) probs
        segmenter_params,
        tile_size: int = 1024,
        overlap: float = 0.0,
        classifier_threshold: float = 0.5,
        batch_size: int = 16,  # U-Net 1024² throughput peaks at b16 on v5e (HBM-bound above)
        white_threshold: float = 235.0,
        white_ratio: float = 0.70,
        blur_threshold: float = 7.5,
        blend_sigma_factor: float = 0.25,
    ):
        self.classifier_predict = classifier_predict
        self.classifier_variables = classifier_variables
        self.segmenter_predict = segmenter_predict
        self.segmenter_params = segmenter_params
        self.tile_size = tile_size
        self.overlap = overlap
        self.classifier_threshold = classifier_threshold
        self.batch_size = batch_size
        self.qc_args = (white_threshold, white_ratio, blur_threshold)
        self.weight_map = gaussian_weight_map(tile_size, blend_sigma_factor)

    def _batched(self, fn, arrays: np.ndarray) -> np.ndarray:
        outs = []
        b = self.batch_size
        for i in range(0, len(arrays), b):
            chunk = arrays[i : i + b]
            n = chunk.shape[0]
            if n < b:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], b - n, axis=0)])
            outs.append(np.asarray(fn(jnp.asarray(chunk)))[:n])
        return np.concatenate(outs)

    def run(self, image: np.ndarray) -> PipelineResult:
        t = self.tile_size
        timings = {}
        t0 = time.time()
        h, w = image.shape[:2]
        gray = image if image.ndim == 2 else cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        pad_h, pad_w = max(0, t - h), max(0, t - w)
        if pad_h or pad_w:
            gray = np.pad(gray, ((0, pad_h), (0, pad_w)), mode="reflect")
        positions = sliding_window_positions(gray.shape, t, self.overlap)
        # Keep tiles in the source dtype (u8 for real slides): host->device
        # transfers are 4x smaller than f32, and every consumer casts on
        # device where the conversion is free.
        tiles = np.stack([gray[y : y + t, x : x + t] for (y, x) in positions])
        timings["tiling_s"] = time.time() - t0

        def as_f32(c):
            return c.astype(jnp.float32)

        # QC
        t0 = time.time()
        good = self._batched(
            lambda c: classify_tiles_batch(as_f32(c), *self.qc_args)["is_good"],
            tiles,
        ).astype(bool)
        timings["qc_s"] = time.time() - t0

        # Classification on good tiles
        t0 = time.time()
        probs = np.zeros(len(tiles), np.float32)
        if good.any():
            probs[good] = self._batched(
                lambda c: self.classifier_predict(
                    self.classifier_variables, as_f32(c)),
                tiles[good],
            )
        positive = good & (probs >= self.classifier_threshold)
        timings["classify_s"] = time.time() - t0

        # Segmentation on positive tiles only
        t0 = time.time()
        seg = np.zeros(tiles.shape, np.float32)
        if positive.any():
            seg[positive] = self._batched(
                lambda c: self.segmenter_predict(self.segmenter_params, as_f32(c)),
                tiles[positive],
            )
        timings["segment_s"] = time.time() - t0

        # Blend (padded size, crop back)
        t0 = time.time()
        full = np.asarray(blend_tiles(
            jnp.asarray(seg), jnp.asarray(positions, jnp.int32),
            self.weight_map, gray.shape[0], gray.shape[1],
        ))[:h, :w]
        timings["blend_s"] = time.time() - t0

        return PipelineResult(
            probability_map=full,
            n_tiles=len(tiles),
            n_good=int(good.sum()),
            n_positive=int(positive.sum()),
            timings=timings,
        )

    def run_file(self, image_path: str | Path, output_dir: str | Path,
                 threshold: float = 0.5) -> PipelineResult:
        image = cv2.imread(str(image_path), cv2.IMREAD_UNCHANGED)
        if image is None:
            raise ValueError(f"cannot read {image_path}")
        if image.dtype == np.uint16:
            image = (image / 257.0).astype(np.uint8)
        result = self.run(image)
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        stem = Path(image_path).stem
        cv2.imwrite(str(out / f"{stem}_probability.png"),
                    (np.clip(result.probability_map, 0, 1) * 255).astype(np.uint8))
        cv2.imwrite(str(out / f"{stem}_mask.png"),
                    ((result.probability_map > threshold) * 255).astype(np.uint8))
        (out / f"{stem}_pipeline_log.json").write_text(json.dumps({
            "n_tiles": result.n_tiles,
            "n_good": result.n_good,
            "n_positive": result.n_positive,
            "timings": result.timings,
        }, indent=2))
        return result
