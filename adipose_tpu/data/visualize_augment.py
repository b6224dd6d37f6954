"""Augmentation visualizer — debugging grid of augmented examples.

Behavioral spec: ``src/utils/data.py:462-508`` (``visualize_augmentation``):
N rows of [original | augmented | augmented mask] rendered for a chosen tier.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.data.augment import TIERS


def visualize_augmentation(
    image: np.ndarray,
    mask: np.ndarray,
    tier: str = "moderate",
    num_examples: int = 5,
    save_path: str | Path | None = None,
    seed: int = 42,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fn = TIERS[tier]
    img = jnp.asarray(np.asarray(image, np.float32))
    msk = jnp.asarray(np.asarray(mask, np.float32))
    fig, axes = plt.subplots(num_examples, 3, figsize=(9, 3 * num_examples),
                             squeeze=False)
    for i in range(num_examples):
        ai, am = fn(jax.random.fold_in(jax.random.PRNGKey(seed), i), img, msk)
        axes[i][0].imshow(np.asarray(image), cmap="gray")
        axes[i][0].set_title("Original")
        axes[i][1].imshow(np.asarray(ai), cmap="gray")
        axes[i][1].set_title(f"Augmented {i + 1} ({tier})")
        axes[i][2].imshow(np.asarray(am), cmap="gray")
        axes[i][2].set_title("Augmented Mask")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return Path(save_path)
    return fig
