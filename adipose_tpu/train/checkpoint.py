"""Checkpoint + run-artifact management with the reference's artifact contract.

The reference's checkpoint directory layout is effectively a public API between
its scripts (``train_adipose_unet_v3.py:52-61`` docstring; consumed by
``full_evaluation_enhanced.py:401-490,681-713``):

  checkpoints/segmentation/<timestamp>_<name>_1024_finetune_v3/
    normalization_stats.json     train-set mean/std, loaded by eval (no leakage)
    phase1_best/                 best phase-1 params        (was .weights.h5)
    phase2_best/                 best phase-2 params
    weights_best_overall/        final model = best phase-2
    weights_ema/                 best-EMA snapshot
    phase{1,2}_training.log      per-epoch CSV metrics
    training_settings.log        full hyperparameter/system capture

Here each weights entry is an orbax checkpoint directory; the ordered candidate
lists used by the evaluator's weight resolution are preserved.
"""

from __future__ import annotations

import datetime
import json
import platform
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

# Ordered weight-resolution candidates (full_evaluation_enhanced.py:453-470)
WEIGHT_CANDIDATES_BEST = (
    "weights_best_overall",
    "phase2_best",
    "phase1_best",
    "best_model",
    "model_best",
    "weights_best",
)
WEIGHT_CANDIDATES_EMA = (
    "weights_ema",
    "ema_weights_phase2",
    "ema_weights",
)


def timestamp_now() -> str:
    return datetime.datetime.now().strftime("%Y%m%d_%H%M%S")


def checkpoint_dir_for(
    checkpoint_name: str,
    build_timestamp: str | None = None,
    root: str | Path = "checkpoints/segmentation",
    suffix: str = "_1024_finetune_v3",
) -> Path:
    """Timestamped run directory (``train_adipose_unet_v3.py:645-652``)."""
    ts = build_timestamp or timestamp_now()
    d = Path(root) / f"{ts}_{checkpoint_name}{suffix}"
    d.mkdir(parents=True, exist_ok=True)
    return d


def save_params(ckpt_dir: str | Path, name: str, params) -> Path:
    """Save a param pytree under <ckpt_dir>/<name>/ (orbax)."""
    path = Path(ckpt_dir) / name
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path.resolve(),
            jax.tree.map(np.asarray, params),
            force=True,
        )
    return path


def load_params(path: str | Path, like=None):
    """Restore a param pytree (optionally shaped/typed like ``like``)."""
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x)
                if hasattr(ocp.utils, "to_shape_dtype_struct")
                else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
                like,
            )
            return ckptr.restore(Path(path).resolve(), target)
        return ckptr.restore(Path(path).resolve())


def merge_matching(dst, src):
    """By-name pytree merge: copy ``src`` leaves whose path AND shape match
    ``dst``; everything else keeps ``dst`` (the reference's by_name +
    skip_mismatch loading, ``train_adipose_unet_v3.py:881-916`` /
    ``train_adipose_classifier_v0.py:322-353``)."""
    import jax.numpy as jnp

    if isinstance(dst, dict) and isinstance(src, dict):
        return {k: merge_matching(v, src[k]) if k in src else v
                for k, v in dst.items()}
    if (hasattr(dst, "shape") and hasattr(src, "shape")
            and dst.shape == src.shape):
        return jnp.asarray(src)
    return dst  # shape mismatch / extra leaf: keep the fresh init


def resolve_weights_path(weights_arg: str | Path, use_ema: bool = False) -> Path:
    """Find the best available weights in a checkpoint dir, mirroring
    ``resolve_weights_path``/``_find_best_weights_in_dir``
    (``full_evaluation_enhanced.py:401-490``) incl. the EMA→best fallback."""
    p = Path(weights_arg)
    if not p.is_dir():
        raise FileNotFoundError(f"checkpoint directory not found: {p}")
    if (p / "_CHECKPOINT_METADATA").exists() or (p / "manifest.ocdbt").exists():
        return p  # direct orbax checkpoint
    candidates = WEIGHT_CANDIDATES_EMA if use_ema else WEIGHT_CANDIDATES_BEST
    for name in candidates:
        c = p / name
        if c.is_dir():
            return c
    if use_ema:
        print("EMA weights not found, falling back to best weights")
        for name in WEIGHT_CANDIDATES_BEST:
            c = p / name
            if c.is_dir():
                return c
    subdirs = [d for d in p.iterdir() if d.is_dir()]
    if subdirs:
        return subdirs[0]
    raise FileNotFoundError(f"no weights found in {p}")


def save_normalization_stats(ckpt_dir: str | Path, mean: float, std: float,
                             method: str = "zscore", extra: dict | None = None):
    """``normalization_stats.json`` (``train_adipose_unet_v3.py:1194-1207``)."""
    stats = {"mean": float(mean), "std": float(std), "method": method}
    if extra:
        stats.update(extra)
    (Path(ckpt_dir) / "normalization_stats.json").write_text(json.dumps(stats, indent=2))
    return stats


def load_normalization_stats(ckpt_dir: str | Path) -> tuple:
    """Eval-side loading with the no-leakage contract
    (``full_evaluation_enhanced.py:681-713``)."""
    path = Path(ckpt_dir) / "normalization_stats.json"
    if not path.exists():
        raise FileNotFoundError(
            f"Training normalization statistics not found: {path}"
        )
    stats = json.loads(path.read_text())
    return float(stats["mean"]), float(stats["std"])


def _git_info() -> dict:
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain"], capture_output=True, text=True, timeout=5
            ).stdout.strip()
        )
        return {"commit": commit, "dirty": dirty}
    except Exception:
        return {"commit": "unknown", "dirty": False}


def write_training_settings(ckpt_dir: str | Path, settings: dict):
    """``training_settings.log`` with platform/devices/git capture
    (``train_adipose_unet_v3.py:927-1053``). The deep-supervision flag line is
    format-compatible with the evaluator's detector
    (``full_evaluation_enhanced.py:493-520`` looks for
    'use_deep_supervision: True')."""
    lines = ["=== adipose_tpu training settings ===", ""]
    for k, v in settings.items():
        lines.append(f"{k}: {v}")
    lines += [
        "",
        "=== system ===",
        f"platform: {platform.platform()}",
        f"python: {sys.version.split()[0]}",
        f"jax: {jax.__version__}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"git: {_git_info()}",
        f"timestamp: {datetime.datetime.now().isoformat()}",
    ]
    (Path(ckpt_dir) / "training_settings.log").write_text("\n".join(lines) + "\n")


def detect_deep_supervision(ckpt_dir: str | Path) -> bool:
    """(``full_evaluation_enhanced.py:493-520``)."""
    f = Path(ckpt_dir) / "training_settings.log"
    if not f.exists():
        return False
    content = f.read_text()
    return "use_deep_supervision: True" in content or "deep_supervision: True" in content


def detect_model_config(ckpt_dir: str | Path):
    """Rebuild the checkpoint's architecture from ``training_settings.log``.

    The reference recovers only the deep-supervision flag
    (``full_evaluation_enhanced.py:493-520``) because its other architecture
    knobs are hard-coded; here ``init_nb``/``tile_size``/``dilation_rates``
    are configurable, so evaluating a non-default checkpoint must rebuild the
    trained shape, not the default one. Falls back to defaults for missing
    keys (old checkpoints)."""
    import re

    from adipose_tpu.core.config import UNetConfig

    kwargs = {"use_deep_supervision": detect_deep_supervision(ckpt_dir)}
    f = Path(ckpt_dir) / "training_settings.log"
    if f.exists():
        text = f.read_text()

        def grab(key, cast):
            m = re.search(rf"^{key}: (.+)$", text, re.M)
            if m:
                try:
                    kwargs[key] = cast(m.group(1).strip())
                except (ValueError, SyntaxError):
                    pass

        grab("init_nb", int)
        grab("tile_size", int)
        grab("dropout_rate", float)
        grab("dilation_rates", lambda s: tuple(
            int(t) for t in s.strip("()[] ").split(",") if t.strip()))
    return UNetConfig(**kwargs)


class CsvLogger:
    """Per-epoch CSV metrics (Keras CSVLogger contract: header from first row).

    ``append=True`` (Keras's flag of the same name) adopts an existing file's
    header and appends — a preemption-resumed phase must not truncate the
    pre-resume epoch rows."""

    def __init__(self, path: str | Path, append: bool = False):
        self.path = Path(path)
        self._header = None
        if append and self.path.exists():
            first = self.path.read_text().splitlines()
            if first:
                self._header = first[0].split(",")

    def log(self, epoch: int, metrics: dict):
        row = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        if self._header is None:
            self._header = list(row)
            self.path.write_text(",".join(self._header) + "\n")
        with self.path.open("a") as f:
            f.write(",".join(str(row.get(h, "")) for h in self._header) + "\n")
