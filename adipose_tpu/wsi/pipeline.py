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

from adipose_tpu.ops.blend import (
    accumulate_predictions,
    accumulate_weights,
    finalize_blend,
    gaussian_weight_map,
    sliding_window_positions,
)
from adipose_tpu.ops.qc import classify_tiles_batch
from adipose_tpu.parallel.mesh import pad_batch_to


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
        mesh=None,
        transfer_dtype: str = "float16",  # 'float16' | 'float32'
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — each QC/classify/segment
        chunk shards over the mesh 'data' axis, spreading one slide's tile
        stream across all chips (same spatial data parallelism as
        :class:`adipose_tpu.eval.sliding_window.SlidingWindowInference`)."""
        self.classifier_predict = classifier_predict
        self.classifier_variables = classifier_variables
        self.segmenter_predict = segmenter_predict
        self.segmenter_params = segmenter_params
        self.tile_size = tile_size
        self.overlap = overlap
        self.classifier_threshold = classifier_threshold
        self.mesh = mesh
        if mesh is not None:
            n = mesh.shape.get("data", 1)
            batch_size = -(-batch_size // n) * n  # round UP to the data axis
        self.batch_size = batch_size
        self.qc_args = (white_threshold, white_ratio, blur_threshold)
        self.weight_map = gaussian_weight_map(tile_size, blend_sigma_factor)
        # Final-map download precision. float16 halves the device->host
        # transfer (67 MB -> 33 MB for a 4096² slide — the dominant cost of
        # blend_s through the tunnel) at a quantization error <= 5e-4 on
        # [0,1] probabilities, inside the model-wide bf16 noise band
        # (DiffSigmoidHead docstring). 'float32' restores exact transfer.
        self.transfer_dtype = transfer_dtype

    def _put(self, chunk: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(chunk)
        import jax

        from adipose_tpu.parallel.mesh import data_sharding

        return jax.device_put(chunk, data_sharding(self.mesh, chunk.ndim))

    def _batched(self, fn, arrays: np.ndarray) -> np.ndarray:
        return self._batched_multi(lambda c: (fn(c),), arrays)[0]

    def _batched_multi(self, fn, arrays: np.ndarray) -> list:
        """Chunked device map for an ``fn`` returning a TUPLE of per-tile
        outputs — one upload serves several device computations. Results stay
        on device until ALL chunks are dispatched (no per-chunk host sync),
        so uploads and compute pipeline."""
        device_outs: list | None = None
        b = self.batch_size
        for i in range(0, len(arrays), b):
            (chunk,), n = pad_batch_to(b, arrays[i : i + b])
            res = [r[:n] for r in fn(self._put(chunk))]
            device_outs = [[r] for r in res] if device_outs is None else [
                o + [r] for o, r in zip(device_outs, res)]
        return [np.concatenate([np.asarray(r) for r in o]) for o in device_outs]

    def run(self, image: np.ndarray) -> PipelineResult:
        t = self.tile_size
        timings = {}
        t0 = time.time()
        h, w = image.shape[:2]
        gray = image if image.ndim == 2 else cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        pad_h, pad_w = max(0, t - h), max(0, t - w)
        if pad_h or pad_w:
            gray = np.pad(gray, ((0, pad_h), (0, pad_w)), mode="reflect")
        positions = np.asarray(
            sliding_window_positions(gray.shape, t, self.overlap), np.int32)
        # Keep tiles in the source dtype (u8 for real slides): host->device
        # transfers are 4x smaller than f32, and every consumer casts on
        # device where the conversion is free.
        tiles = np.stack([gray[y : y + t, x : x + t] for (y, x) in positions])
        timings["tiling_s"] = time.time() - t0

        def as_f32(c):
            return c.astype(jnp.float32)

        # QC + classification: ONE upload per chunk feeds both (the
        # classifier runs on every tile — at ~1k tiles/s that is cheaper
        # than a second host->device pass over the good subset).
        t0 = time.time()

        def qc_and_classify(c):
            cf = as_f32(c)
            return (classify_tiles_batch(cf, *self.qc_args)["is_good"],
                    self.classifier_predict(self.classifier_variables, cf))

        good_probs = self._batched_multi(qc_and_classify, tiles)
        good = good_probs[0].astype(bool)
        probs = np.where(good, good_probs[1], 0.0).astype(np.float32)
        positive = good & (probs >= self.classifier_threshold)
        timings["qc_classify_s"] = time.time() - t0

        # Segmentation on positive tiles only, blended INTO device-resident
        # canvases chunk by chunk — prediction maps never visit the host
        # (a 4096² slide round-trips 210 MB otherwise; the tunnel makes
        # that 3+ s of the old 8.5 s end-to-end).
        t0 = time.time()
        acc = jnp.zeros(gray.shape, jnp.float32)
        wsum = jnp.zeros(gray.shape, jnp.float32)
        b = self.batch_size
        for i in range(0, len(positions), b):
            (cpos,), n = pad_batch_to(b, positions[i : i + b])
            wsum = accumulate_weights(
                wsum, jnp.asarray(cpos, jnp.int32), self.weight_map,
                jnp.asarray(np.arange(b) < n, jnp.float32))
        timings["blend_weights_s"] = time.time() - t0

        t0 = time.time()
        if positive.any():
            pos_idx = np.flatnonzero(positive)
            pos_tiles = tiles[pos_idx]
            pos_yx = positions[pos_idx]
            for i in range(0, len(pos_idx), b):
                (chunk, cpos), n = pad_batch_to(
                    b, pos_tiles[i : i + b], pos_yx[i : i + b])
                seg_chunk = self.segmenter_predict(
                    self.segmenter_params, as_f32(self._put(chunk)))
                valid = jnp.asarray(np.arange(b) < n, jnp.float32)
                acc = accumulate_predictions(
                    acc, seg_chunk, jnp.asarray(cpos, jnp.int32),
                    self.weight_map, valid)
        # dispatch is async: block here so segment_s measures segmentation,
        # not the later finalize sync
        acc.block_until_ready()
        timings["segment_s"] = time.time() - t0

        t0 = time.time()
        out = finalize_blend(acc, wsum)
        if self.transfer_dtype == "float16":
            out = out.astype(jnp.float16)
        full = np.asarray(out)[:h, :w].astype(np.float32)
        timings["blend_s"] = time.time() - t0 + timings.pop("blend_weights_s")

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
