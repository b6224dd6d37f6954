"""Publication-quality evaluation driver.

Behavioral spec: ``run_publication_evaluation`` + ``main``
(``full_evaluation_enhanced.py:1446-2167``):
  * deterministic seeds (1337), training-stat normalization (no leakage),
    deep-supervision auto-detection from training_settings.log;
  * per-tile inference with optional TTA and/or sliding-window+blending and/or
    boundary refinement;
  * slide-level threshold optimization (grid or two-stage adaptive);
  * slide grouping → per-slide means of tile metrics → bootstrap CIs (10 000);
  * artifact contract: ``<ckpt>/evaluation/<dataset>_<source>_<enhancements>/``
    with ``{dataset}_comprehensive_results.csv``, ``metrics.json``,
    per-tile predictions CSV, optional 4-panel visualizations.

TPU-native: tiles are evaluated in fixed-size device batches (TTA folded into
the same program); confusion counts, AUC, and threshold sweeps reduce on
device; only boundary metrics (scipy EDT) stay on host.
"""

from __future__ import annotations

import json
from collections import defaultdict
from dataclasses import asdict
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np

from adipose_tpu.core.config import EvalConfig, UNetConfig
from adipose_tpu.core.hostio import thread_map
from adipose_tpu.eval.boundary import BoundaryRefiner, calculate_boundary_metrics
from adipose_tpu.eval.bootstrap import safe_bootstrap_ci
from adipose_tpu.eval.sliding_window import SlidingWindowInference
from adipose_tpu.eval.threshold import (
    extract_slide_id,
    optimize_threshold_adaptive,
    optimize_threshold_f1_slide_level,
)
from adipose_tpu.eval.tta import make_tta_predict
from adipose_tpu.models.unet import DilatedUNet
from adipose_tpu.ops.metrics import batched_auc_metrics, batched_pixel_metrics
from adipose_tpu.train import checkpoint as ckpt
from adipose_tpu.train.state import make_unet_predict

METRIC_KEYS = (
    "dice_score", "jaccard_index", "sensitivity", "specificity", "precision",
    "f1_score", "accuracy", "roc_auc", "pr_auc", "hausdorff95", "assd",
)


def load_validation_data(val_root: str | Path):
    """Flexible paired-file loader (``full_evaluation_enhanced.py:1386-1443``):
    recurses images/ + masks/, pairs by stem, tolerates a '_mask' suffix."""
    val_root = Path(val_root)
    images_dir, masks_dir = val_root / "images", val_root / "masks"
    if not images_dir.exists() or not masks_dir.exists():
        raise FileNotFoundError(f"Image/mask dirs not found under {val_root}")
    img_exts = {".jpg", ".jpeg", ".png", ".tif", ".tiff"}
    image_files = sorted(
        p for p in images_dir.rglob("*") if p.suffix.lower() in img_exts
    )
    masks_by_stem = {}
    # sorted: first-seen wins on stem collisions, so the chosen mask must
    # not depend on filesystem iteration order
    for m in sorted(masks_dir.rglob("*")):
        if m.suffix.lower() in img_exts:
            masks_by_stem.setdefault(m.stem, m)
            if m.stem.endswith("_mask"):
                masks_by_stem.setdefault(m.stem[: -len("_mask")], m)
    pairs = [
        (str(p), str(masks_by_stem[p.stem]))
        for p in image_files
        if p.stem in masks_by_stem
    ]
    if not pairs:
        raise FileNotFoundError(f"No paired tiles under {val_root}")
    return pairs


def read_image_gray(path: str) -> np.ndarray:
    """Grayscale load with 16-bit TIFF scaling
    (``full_evaluation_enhanced.py:1356-1384``)."""
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError(f"Failed to load {path}")
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    if img.dtype == np.uint16:
        img = (img / 257.0).astype(np.float32)
    return img.astype(np.float32)


def build_output_dir(
    checkpoint_dir: Path, test_dataset: Path, cfg: EvalConfig, output: str | None = None
) -> Path:
    """Enhancement-flag-encoded directory naming
    (``full_evaluation_enhanced.py:2053-2101``) — consumed by the checkpoint
    visualizer, so the encoding is part of the artifact contract."""
    if output:
        return Path(output)
    dataset_name = test_dataset.name
    parent = test_dataset.parent.name
    source = "stain" if "stain" in parent.lower() else "original"
    # one suffix encoder shared with the metrics visualizer — the dir-name
    # contract both sides must agree on (visualize_checkpoint_metrics.py:646)
    from adipose_tpu.eval.batch_eval import build_eval_config_string

    suffix = build_eval_config_string(cfg)
    name = f"{dataset_name}_{source}" + (f"_{suffix}" if suffix else "")
    return checkpoint_dir / "evaluation" / name


def _boundary_metrics_all(preds: list, trues: list, threshold: float) -> list:
    """Per-tile Hausdorff95/ASSD, thread-parallel for large tile sets.

    scipy.ndimage's EDT (the metric's hot op, eval/boundary.py) releases the
    GIL, so threads scale without the pickling cost of a process pool. Small
    sets run serially — identical values either way."""
    if len(preds) < 16:
        return [calculate_boundary_metrics(p, t, threshold)
                for p, t in zip(preds, trues)]
    import os
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
        return list(ex.map(
            lambda pt: calculate_boundary_metrics(pt[0], pt[1], threshold),
            zip(preds, trues),
        ))


class PublicationEvaluator:
    def __init__(
        self,
        weights: str | Path,
        cfg: EvalConfig | None = None,
        model_cfg: UNetConfig | None = None,
    ):
        self.cfg = cfg or EvalConfig()
        weights_path = ckpt.resolve_weights_path(weights, self.cfg.use_ema_weights)
        self.checkpoint_dir = weights_path.parent
        self.mean, self.std = ckpt.load_normalization_stats(self.checkpoint_dir)
        self.model_cfg = model_cfg or ckpt.detect_model_config(self.checkpoint_dir)
        self.model = DilatedUNet(
            init_nb=self.model_cfg.init_nb,
            dropout_rate=self.model_cfg.dropout_rate,
            use_deep_supervision=self.model_cfg.use_deep_supervision,
            dilation_rates=tuple(self.model_cfg.dilation_rates),
            compute_dtype=jnp.bfloat16
            if self.model_cfg.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        self.params = ckpt.load_params(weights_path)
        base_predict = make_unet_predict(self.model)

        mean, std = float(self.mean), float(self.std)

        def normalized_predict(params, tiles):
            return base_predict(params, (tiles - mean) / (std + 1e-10))

        self.predict_raw = normalized_predict
        self.predict = (
            make_tta_predict(normalized_predict, self.cfg.tta_mode)
            if self.cfg.use_tta
            else normalized_predict
        )
        if self.cfg.transfer_dtype == "float16":
            # cast on device so np.asarray downloads half the bytes; the
            # tiny separate cast op costs one ~1.5 ms dispatch per chunk.
            # Used only at the direct-download site — the sliding-window path
            # quantizes once, on its blended map (sliding_window.py), so maps
            # are never rounded twice.
            def predict_transfer(params, tiles, _base=self.predict):
                return _base(params, tiles).astype(jnp.float16)
        else:
            predict_transfer = self.predict
        self.predict_transfer = predict_transfer
        # TTA stacks its views into the model batch (eval/tta.py), so deflate
        # the tile chunk to keep the EFFECTIVE device batch at cfg.batch_size
        # — otherwise full TTA at 1024² pushes views×batch tiles through the
        # U-Net and overflows HBM (b24 already OOMs on v5e, ARCHITECTURE.md).
        from adipose_tpu.ops.d4 import MODE_IDS

        tta_mode = self.cfg.tta_mode if self.cfg.tta_mode in MODE_IDS else "basic"
        self.n_views = len(MODE_IDS[tta_mode]) if self.cfg.use_tta else 1
        self.tile_batch = max(1, self.cfg.batch_size // self.n_views)

    # -- inference ------------------------------------------------------------

    def predict_tiles(self, image_paths) -> list:
        """Predict every tile; same-shape tiles batch together on device."""
        cfg = self.cfg
        refiner = (BoundaryRefiner(kernel_size=cfg.refine_kernel)
                   if cfg.use_boundary_refinement else None)
        # thread-parallel decode (cv2 releases the GIL), order-preserving
        images = thread_map(read_image_gray, image_paths)
        preds: list = [None] * len(images)

        if cfg.use_sliding_window:
            sw = SlidingWindowInference(
                tile_size=self.model_cfg.tile_size,
                overlap=cfg.sliding_overlap,
                blend_mode=cfg.blend_mode,
                batch_size=self.tile_batch,
                transfer_dtype=cfg.transfer_dtype,
            )
            for i, img in enumerate(images):
                preds[i] = sw.predict(self.predict, self.params, img)
        else:
            by_shape = defaultdict(list)
            for i, img in enumerate(images):
                by_shape[img.shape].append(i)
            for shape, idxs in by_shape.items():
                b = self.tile_batch
                for s in range(0, len(idxs), b):
                    chunk_idx = idxs[s : s + b]
                    batch = np.stack([images[j] for j in chunk_idx])
                    n = batch.shape[0]
                    if n < b:
                        batch = np.concatenate(
                            [batch, np.repeat(batch[-1:], b - n, axis=0)]
                        )
                    out = np.asarray(
                        self.predict_transfer(self.params, jnp.asarray(batch))[:n],
                        dtype=np.float32,
                    )
                    for k, j in enumerate(chunk_idx):
                        preds[j] = out[k]
        if refiner is not None:
            preds = [refiner.refine(p) for p in preds]
        return images, preds

    # -- full evaluation ------------------------------------------------------

    def evaluate(
        self,
        data_root: str | Path,
        dataset_name: str = "test",
        output_dir: str | Path | None = None,
        optimize_threshold: bool | None = None,
        save_visualizations: bool = False,
        n_vis_samples: int = 10,  # reference default (:2007-2009)
    ) -> dict:
        cfg = self.cfg
        np.random.seed(cfg.eval_seed)  # set_deterministic_seeds(1337) analog
        data_root = Path(data_root)
        out = (
            Path(output_dir)
            if output_dir
            else build_output_dir(self.checkpoint_dir, data_root, cfg)
        )
        out.mkdir(parents=True, exist_ok=True)

        pairs = load_validation_data(data_root)
        tile_paths = [p for p, _ in pairs]
        images, preds = self.predict_tiles(tile_paths)
        trues = thread_map(
            lambda m: (read_image_gray(m) > 127).astype(np.float32),
            [m for _, m in pairs],
        )

        do_opt = cfg.optimize_threshold if optimize_threshold is None else optimize_threshold
        if cfg.adaptive_threshold:
            threshold, _ = optimize_threshold_adaptive(preds, trues, tile_paths)
        elif do_opt:
            threshold, _ = optimize_threshold_f1_slide_level(preds, trues, tile_paths)
        else:
            threshold = cfg.threshold

        # Per-tile metrics: device-batched confusion + AUC (chunked vmap —
        # the reference computes these one tile at a time,
        # full_evaluation_enhanced.py:847-888), boundary on host threads
        # (scipy's EDT releases the GIL). Batched PER SHAPE GROUP: sliding-
        # window datasets mix image sizes (predict_tiles already groups the
        # same way), so one np.stack over everything would crash.
        shape_groups = defaultdict(list)
        for i, p in enumerate(preds):
            shape_groups[p.shape].append(i)
        n_tiles = len(preds)
        pm = {}
        am = {}
        for shape, idxs in shape_groups.items():
            pa = jnp.asarray(np.stack([preds[i] for i in idxs]))
            ta = jnp.asarray(np.stack([trues[i] for i in idxs]))
            g_pm = {k: np.asarray(v)
                    for k, v in batched_pixel_metrics(pa, ta, threshold).items()}
            g_am = {k: np.asarray(v)
                    for k, v in batched_auc_metrics(pa, ta).items()}
            for d, g in ((pm, g_pm), (am, g_am)):
                for k, vals in g.items():
                    d.setdefault(k, np.empty(n_tiles, np.float64))[idxs] = vals
        bms = _boundary_metrics_all(preds, trues, threshold)
        tile_rows = []
        for i, path in enumerate(tile_paths):
            tile_rows.append({
                "tile": Path(path).name,
                "slide_id": extract_slide_id(path),
                **{k: float(pm[k][i]) for k in (
                    "dice_score", "jaccard_index", "sensitivity", "specificity",
                    "precision", "f1_score", "accuracy")},
                "roc_auc": float(am["roc_auc"][i]),
                "pr_auc": float(am["pr_auc"][i]),
                **bms[i],
            })

        # Slide-level aggregation (:1629-1727): mean of tile metrics per slide,
        # NaN/inf-filtered for AUC/boundary
        slides = defaultdict(list)
        for row in tile_rows:
            slides[row["slide_id"]].append(row)
        slide_metrics = {k: [] for k in METRIC_KEYS}
        for sid, rows in slides.items():
            for k in METRIC_KEYS:
                vals = np.asarray([r[k] for r in rows], dtype=np.float64)
                if k in ("roc_auc", "pr_auc", "hausdorff95", "assd"):
                    vals = vals[np.isfinite(vals)]
                slide_metrics[k].append(float(np.mean(vals)) if len(vals) else np.nan)

        # Bootstrap CIs over slides (:1730-1745)
        summary = {}
        for k in METRIC_KEYS:
            point, (lo, hi) = safe_bootstrap_ci(
                np.asarray(slide_metrics[k]), n_bootstrap=cfg.n_bootstrap
            )
            summary[k] = {"mean": point, "ci_lower": lo, "ci_upper": hi}

        results = {
            "dataset": dataset_name,
            "n_slides": len(slides),
            "n_tiles": len(tile_paths),
            "optimal_threshold": float(threshold),
            "metrics": summary,
            "config": asdict(cfg),
        }
        if save_visualizations:
            from adipose_tpu.eval.visualize import save_bucketed_visualizations

            dices = [r["dice_score"] for r in tile_rows]
            counts = save_bucketed_visualizations(
                images[:n_vis_samples], preds[:n_vis_samples],
                trues[:n_vis_samples], dices[:n_vis_samples],
                tile_paths[:n_vis_samples], out / "visualizations", threshold,
            )
            results["visualization_buckets"] = counts

        if cfg.save_overlays:
            # Dice-bucketed 4-panel dumps over a SAMPLED pos/neg tile subset
            # (sample_tiles :1111-1140; overlays loop :1801-1876)
            from adipose_tpu.eval.visualize import save_bucketed_visualizations

            rng = np.random.RandomState(cfg.eval_seed)
            pos_idx = [i for i, t in enumerate(trues) if t.max() > 0]
            neg_idx = [i for i, t in enumerate(trues) if t.max() == 0]
            sample = lambda idx, n: (idx if len(idx) <= n else
                                     list(rng.choice(idx, n, replace=False)))
            chosen = sample(pos_idx, cfg.n_positive) + sample(neg_idx, cfg.n_negative)
            dices = [r["dice_score"] for r in tile_rows]
            counts = save_bucketed_visualizations(
                [images[i] for i in chosen], [preds[i] for i in chosen],
                [trues[i] for i in chosen], [dices[i] for i in chosen],
                [tile_paths[i] for i in chosen], out / "overlays", threshold,
                max_per_bucket=10 ** 9,
            )
            results["overlay_buckets"] = counts
        # write AFTER the bucket sections so metrics.json carries the same
        # dict the caller receives (bucket counts were silently absent before)
        self._write_artifacts(out, dataset_name, results, tile_rows)
        return results

    def _write_artifacts(self, out: Path, dataset_name: str, results: dict, tile_rows):
        import pandas as pd

        (out / "metrics.json").write_text(json.dumps(results, indent=2))
        pd.DataFrame(tile_rows).to_csv(out / "predictions.csv", index=False)
        display = {
            "dice_score": "Dice Score", "jaccard_index": "Jaccard Index (IoU)",
            "sensitivity": "Sensitivity (Recall)", "specificity": "Specificity",
            "precision": "Precision", "f1_score": "F1 Score",
            "accuracy": "Accuracy", "roc_auc": "ROC AUC", "pr_auc": "PR AUC",
            "hausdorff95": "Hausdorff95", "assd": "ASSD",
        }
        rows = []
        for k, name in display.items():
            m = results["metrics"][k]
            rows.append({
                "Metric": name, "Mean": m["mean"],
                "CI_Lower": m["ci_lower"], "CI_Upper": m["ci_upper"],
                "N_Slides": results["n_slides"], "N_Tiles": results["n_tiles"],
                "Mean_CI": f"{m['mean']:.4f} [{m['ci_lower']:.4f}, {m['ci_upper']:.4f}]",
            })
        pd.DataFrame(rows).to_csv(
            out / f"{dataset_name}_comprehensive_results.csv", index=False
        )
