"""Reinhard LAB stain normalization — device-batched.

Behavioral spec: ``src/utils/stain_normalization.py:32-146`` — per-channel LAB
statistics transfer ``(x − μ_src)·(σ_ref/σ_src) + μ_ref`` against a selected
reference tile whose stats live in ``stain_reference_metadata.json``
(L 62.5±15.2, A 8.3±12.1, B 14.7±8.9 for the shipped reference).

TPU-native differences from the reference:
  * whole batches of tiles normalize in one jit program (vmapped); LAB
    conversion is jnp (see :mod:`adipose_tpu.ops.color`), so the op fuses with
    downstream normalization instead of a per-tile skimage round-trip;
  * reference statistics are plain arrays, precomputed once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path
import json

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.ops.color import lab2rgb, rgb2lab


@dataclass(frozen=True)
class LabStats:
    """Per-channel LAB mean/std. ``mean``/``std`` have shape (3,) = (L, A, B)."""

    mean: tuple
    std: tuple

    @classmethod
    def from_image(cls, rgb) -> "LabStats":
        """Compute LAB stats of an RGB image in [0,1] or uint8
        (``stain_normalization.py:76-92``)."""
        stats = compute_lab_stats(_to_unit(jnp.asarray(rgb)))
        mean, std = (np.asarray(s) for s in stats)
        return cls(mean=tuple(float(x) for x in mean), std=tuple(float(x) for x in std))

    @classmethod
    def from_metadata(cls, path: str | Path) -> "LabStats":
        """Load from a stain_reference_metadata.json
        (``src/utils/stain_reference_metadata.json`` consumed at
        ``stain_normalization.py:324-345``)."""
        meta = json.loads(Path(path).read_text())
        lab = meta.get("lab_statistics") or meta.get("lab_stats") or meta
        mean = tuple(float(lab[c]["mean"]) for c in ("L", "A", "B"))
        std = tuple(float(lab[c]["std"]) for c in ("L", "A", "B"))
        return cls(mean=mean, std=std)

    def as_arrays(self):
        return (
            jnp.asarray(self.mean, dtype=jnp.float32),
            jnp.asarray(self.std, dtype=jnp.float32),
        )


# Shipped reference stats (src/utils/stain_reference_metadata.json:12-28)
DEFAULT_REFERENCE = LabStats(mean=(62.5, 8.3, 14.7), std=(15.2, 12.1, 8.9))


def _to_unit(rgb: jax.Array) -> jax.Array:
    rgb = jnp.asarray(rgb)
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return rgb.astype(jnp.float32) / 255.0
    return rgb.astype(jnp.float32)


@jax.jit
def compute_lab_stats(rgb_unit: jax.Array):
    """Mean/std of each LAB channel over the spatial axes; (...,3) in [0,1]."""
    lab = rgb2lab(rgb_unit)
    axes = tuple(range(lab.ndim - 1))
    return jnp.mean(lab, axis=axes), jnp.std(lab, axis=axes)


@jax.jit
def reinhard_normalize(rgb_unit: jax.Array, ref_mean: jax.Array, ref_std: jax.Array) -> jax.Array:
    """Reinhard transfer of one RGB image in [0,1] → normalized RGB in [0,1].

    Per channel: ``(lab − μ_src)·(σ_ref/σ_src) + μ_ref``; a zero-variance source
    channel maps to the reference mean (``stain_normalization.py:129-134``).
    """
    lab = rgb2lab(rgb_unit)
    axes = tuple(range(lab.ndim - 1))
    src_mean = jnp.mean(lab, axis=axes)
    src_std = jnp.std(lab, axis=axes)
    scale = jnp.where(src_std == 0.0, 0.0, ref_std / jnp.where(src_std == 0.0, 1.0, src_std))
    normalized = (lab - src_mean) * scale + ref_mean
    return lab2rgb(normalized)


@partial(jax.jit, static_argnames=())
def reinhard_normalize_batch(
    rgb_batch_unit: jax.Array, ref_mean: jax.Array, ref_std: jax.Array
) -> jax.Array:
    """Vmapped Reinhard over a batch (B, H, W, 3) in [0,1] — each tile uses its
    own source statistics, matching per-tile application in the reference
    builder (``build_dataset.py:1211-1250``)."""
    return jax.vmap(lambda x: reinhard_normalize(x, ref_mean, ref_std))(rgb_batch_unit)


def normalize_image(rgb, reference: LabStats = DEFAULT_REFERENCE):
    """Drop-in equivalent of ``ReinhardStainNormalizer.normalize_image``
    (``stain_normalization.py:94-146``): accepts uint8 or unit floats and
    returns the same range it received."""
    rgb = jnp.asarray(rgb)
    is_uint8 = jnp.issubdtype(rgb.dtype, jnp.integer) or bool(np.asarray(rgb).max() > 1.0)
    unit = _to_unit(rgb) if is_uint8 else rgb.astype(jnp.float32)
    ref_mean, ref_std = reference.as_arrays()
    out = reinhard_normalize(unit, ref_mean, ref_std)
    if is_uint8:
        return (out * 255.0).astype(jnp.uint8)
    return out
