"""Batch checkpoint evaluation + comparison visualization.

Behavioral spec:
  * ``Segmentation/evaluate_all_checkpoints.py`` — discovers
    ``checkpoints/**/ *adipose*`` run dirs, ranks weight candidates, evaluates
    each (reference relaunches the eval script via ``conda run`` subprocess
    with a 1 h timeout :245-249; here evaluation is an in-process call — no
    subprocess, no conda), records per-checkpoint successes/failures, then
    triggers comparison plots;
  * ``Segmentation/visualize_checkpoint_metrics.py`` — parses each
    checkpoint's ``*_comprehensive_results.csv`` + metadata, bar plots with CI
    whiskers, eval-config suffix matching (:646 ``build_eval_config_string``).
"""

from __future__ import annotations

import json
import time
import traceback
from pathlib import Path

import numpy as np
import pandas as pd

from adipose_tpu.core.config import EvalConfig
from adipose_tpu.train import checkpoint as ckpt


def discover_checkpoints(root: str | Path, pattern: str = "*adipose*"):
    """Run dirs under <root> matching the pattern, newest first
    (``evaluate_all_checkpoints.py:72-130`` semantics)."""
    root = Path(root)
    if not root.exists():
        return []
    found = [d for d in root.rglob(pattern) if d.is_dir()
             and (d / "normalization_stats.json").exists()]
    return sorted(found, key=lambda d: d.name, reverse=True)


def build_eval_config_string(cfg: EvalConfig) -> str:
    """Flag-suffix encoding shared with the evaluator's output dirs
    (``visualize_checkpoint_metrics.py:646``)."""
    parts = []
    if cfg.use_ema_weights:
        parts.append("ema")
    if cfg.use_tta:
        parts.append(f"tta_{cfg.tta_mode}")
    if cfg.use_sliding_window:
        sw = f"sw_{cfg.blend_mode}"
        if cfg.sliding_overlap != 0.5:
            sw += f"_o{int(cfg.sliding_overlap * 100)}"
        parts.append(sw)
    if cfg.use_boundary_refinement:
        parts.append("refine" if cfg.refine_kernel == 5
                     else f"refine{cfg.refine_kernel}")
    if cfg.adaptive_threshold:
        parts.append("adaptive")
    return "_".join(parts)


class CheckpointBatchEvaluator:
    """In-process batch evaluation with per-checkpoint failure records and a
    wall-clock budget per run (replacing the reference's subprocess timeout)."""

    def __init__(self, checkpoints_root: str | Path, data_root: str | Path,
                 cfg: EvalConfig | None = None, timeout_s: float = 3600.0,
                 save_images: bool = False, parallel: bool = False,
                 max_workers: int = 2):
        self.checkpoints_root = Path(checkpoints_root)
        self.data_root = Path(data_root)
        self.cfg = cfg or EvalConfig()
        self.timeout_s = timeout_s
        self.save_images = save_images
        self.parallel = parallel  # --parallel/--max-workers (:560-565)
        self.max_workers = max_workers
        self.records: list = []

    def _eval_one(self, run_dir, dataset_name: str) -> dict:
        from adipose_tpu.eval.evaluator import PublicationEvaluator

        rec = {"checkpoint": str(run_dir), "status": "pending"}
        t0 = time.time()
        try:
            ev = PublicationEvaluator(run_dir, self.cfg)
            results = ev.evaluate(self.data_root, dataset_name,
                                  save_visualizations=self.save_images)
            rec.update(status="success", elapsed_s=time.time() - t0,
                       dice=results["metrics"]["dice_score"]["mean"],
                       threshold=results["optimal_threshold"])
        except Exception as e:
            rec.update(status="failed", elapsed_s=time.time() - t0,
                       error=str(e), traceback=traceback.format_exc())
        if time.time() - t0 > self.timeout_s:
            rec["timed_out"] = True
        return rec

    def run(self, dataset_name: str = "test") -> list:
        run_dirs = discover_checkpoints(self.checkpoints_root)
        if self.parallel and len(run_dirs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                self.records.extend(
                    pool.map(lambda d: self._eval_one(d, dataset_name), run_dirs)
                )
        else:
            for run_dir in run_dirs:
                self.records.append(self._eval_one(run_dir, dataset_name))
        summary_path = self.checkpoints_root / "batch_evaluation_summary.json"
        summary_path.write_text(json.dumps(self.records, indent=2, default=str))
        return self.records


def collect_checkpoint_metrics(checkpoints_root: str | Path,
                               cfg: EvalConfig | None = None) -> pd.DataFrame:
    """Parse per-checkpoint comprehensive_results.csv files whose eval-dir
    suffix matches the config (``visualize_checkpoint_metrics.py:125-440``)."""
    cfg = cfg or EvalConfig()
    suffix = build_eval_config_string(cfg)
    rows = []
    for run_dir in discover_checkpoints(checkpoints_root):
        eval_root = run_dir / "evaluation"
        if not eval_root.exists():
            continue
        for eval_dir in eval_root.iterdir():
            if suffix and not eval_dir.name.endswith(suffix):
                continue
            if not suffix and any(
                tok in eval_dir.name
                for tok in ("ema", "tta", "sw_", "refine", "adaptive")
            ):
                continue
            for csv in eval_dir.glob("*_comprehensive_results.csv"):
                df = pd.read_csv(csv)
                df["checkpoint"] = run_dir.name
                df["eval_dir"] = eval_dir.name
                rows.append(df)
    return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame()


def plot_checkpoint_comparison(df: pd.DataFrame, output_path: str | Path,
                               metric: str = "Dice Score"):
    """Bar plot with CI whiskers across checkpoints
    (``visualize_checkpoint_metrics.py:445-640``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sel = df[df["Metric"] == metric]
    if sel.empty:
        return None
    fig, ax = plt.subplots(figsize=(max(6, len(sel) * 1.2), 4))
    x = np.arange(len(sel))
    means = sel["Mean"].to_numpy()
    # lists, not a (2, N) ndarray: matplotlib's yerr probing calls
    # math.isfinite on each row, which is deprecated for size-1 arrays
    err = [
        (means - sel["CI_Lower"].to_numpy()).tolist(),
        (sel["CI_Upper"].to_numpy() - means).tolist(),
    ]
    ax.bar(x, means, yerr=err, capsize=4)
    ax.set_xticks(x)
    ax.set_xticklabels(sel["checkpoint"], rotation=30, ha="right", fontsize=7)
    ax.set_ylabel(metric)
    ax.set_title(f"{metric} across checkpoints (95% CI)")
    fig.tight_layout()
    fig.savefig(output_path, dpi=120)
    plt.close(fig)
    return output_path
