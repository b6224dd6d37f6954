"""Training-history plotting — the KerasHistoryPlotCallback analog.

Behavioral spec: ``src/utils/model.py:155-218`` (``KerasHistoryPlotCallback``
grid of per-metric train/val curves; ``KerasSimpleLoggerCallback`` per-epoch
metric deltas). Here the plot renders from the persisted CSV logs
(phase{1,2}_training.log), so it also works post-hoc on any checkpoint dir.
"""

from __future__ import annotations

import math
from pathlib import Path


def plot_training_history(ckpt_dir: str | Path, output: str | Path | None = None):
    """Render train/val curves for every metric in the phase CSV logs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    ckpt_dir = Path(ckpt_dir)
    frames = []
    for phase in (1, 2):
        f = ckpt_dir / f"phase{phase}_training.log"
        if f.exists():
            df = pd.read_csv(f)
            df["phase"] = phase
            frames.append(df)
    single = ckpt_dir / "training.log"
    if not frames and single.exists():
        df = pd.read_csv(single)
        df["phase"] = 1
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no training logs in {ckpt_dir}")
    hist = pd.concat(frames, ignore_index=True)
    hist["global_epoch"] = range(len(hist))

    metrics = [
        c for c in hist.columns
        if c not in ("epoch", "phase", "global_epoch", "epoch_time_s", "lr")
        and not c.startswith("val_")
    ]
    ncol = min(3, max(1, len(metrics)))
    nrow = math.ceil(len(metrics) / ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 3 * nrow),
                             squeeze=False)
    for idx, metric in enumerate(metrics):
        ax = axes[idx // ncol][idx % ncol]
        ax.plot(hist["global_epoch"], hist[metric], label="TR")
        val = f"val_{metric}"
        if val in hist.columns:
            ax.plot(hist["global_epoch"], hist[val], label="VL")
        # phase boundary
        p1_len = (hist["phase"] == 1).sum()
        if (hist["phase"] == 2).any():
            ax.axvline(p1_len - 0.5, color="gray", ls="--", lw=0.8)
        ax.set_title(metric)
        ax.legend(fontsize=7)
    for idx in range(len(metrics), nrow * ncol):
        axes[idx // ncol][idx % ncol].axis("off")
    fig.tight_layout()
    out = Path(output) if output else ckpt_dir / "training_history.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def log_epoch_deltas(history: list) -> list:
    """Per-epoch metric deltas (``KerasSimpleLoggerCallback`` :200-218) as
    printable lines."""
    lines = []
    prev = None
    for row in history:
        if prev is None:
            for k, v in row.items():
                if isinstance(v, (int, float)):
                    lines.append(f"{k:>20}: {v:15.4f}")
        else:
            for k, v in row.items():
                if isinstance(v, (int, float)) and k in prev:
                    diff = v - prev[k]
                    sign = "+" if diff > 0 else "-"
                    lines.append(f"{k:>20}: {v:15.4f} {sign:>5} {abs(diff):15.4f}")
        prev = row
    return lines
