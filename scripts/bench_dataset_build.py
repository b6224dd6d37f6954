#!/usr/bin/env python
"""Data-engineering perf: dataset builder + epoch loader (VERDICT r4 #3).

Three measurements on IDENTICAL synthetic inputs (RGB pseudocolor slides +
polygon JSONs in the reference discovery layout, per-tile Reinhard enabled —
the reference's slowest offline stage, ``build_dataset.py:1211-1250``):

  1. REBUILD ``SegmentationDatasetBuilder`` — device-batched QC + Reinhard
     (production path; TPU when available).
  2. REFERENCE ``build_dataset.py`` ``main()`` run in-process on CPU —
     ``tifffile`` stubbed with cv2 IO, ``skimage.color`` stubbed with the
     same cv2-float LAB oracle ``tests/test_color_stain.py`` pins
     ``ops/color`` against (skimage is not in this env).
  3. Disk→device epoch loop: ``TileDataset.epoch_batches`` over the built
     train split — cold (JPEG decode) and cached epochs, with and without
     ``prefetch_batches`` — the feed rate for the b8 15.4 tiles/s train step.

Prints one JSON line per row. Usage::

    python scripts/bench_dataset_build.py [n_slides=3] [slide_px=4096]

The rebuild side uses the device; serialize with other TPU scripts.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import types
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REF = "/root/reference"


def make_synthetic(root: Path, n_slides: int, size: int, rng) -> None:
    """Reference discovery layout: Pseudocolored/*.jpg + Masks/fat/*.json."""
    pseudo = root / "Pseudocolored"
    fat = root / "Masks" / "fat"
    pseudo.mkdir(parents=True)
    fat.mkdir(parents=True)
    for s in range(n_slides):
        # pinkish tissue noise + white (QC-empty) corner + bright fat blobs
        img = np.empty((size, size, 3), np.uint8)
        img[..., 0] = rng.randint(150, 200, (size, size))  # B
        img[..., 1] = rng.randint(120, 170, (size, size))  # G
        img[..., 2] = rng.randint(170, 220, (size, size))  # R
        img[: size // 4, : size // 4] = 245  # white region → empty tiles
        polys = []
        for _ in range(6):
            cx, cy = rng.randint(size // 8, size - size // 8, 2)
            r = rng.randint(size // 16, size // 8)
            cv2.circle(img, (int(cx), int(cy)), int(r), (255, 255, 255), -1)
            pts = [[float(cx + r * np.cos(t)), float(cy + r * np.sin(t))]
                   for t in np.linspace(0, 2 * np.pi, 12, endpoint=False)]
            polys.append({"confidenceScore": 3,
                          "annotation": {"elements": [
                              {"type": "polyline", "points": pts}]}})
        cv2.imwrite(str(pseudo / f"slide{s}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        (fat / f"slide{s}.json").write_text(json.dumps(polys))
    # stain reference image: a tissue-toned crop
    ref_tile = img[size // 2 : size // 2 + 512, size // 2 : size // 2 + 512]
    cv2.imwrite(str(root / "stain_ref.jpg"), ref_tile)


def emit(metric: str, value: float, unit: str, **extra) -> None:
    row = {"metric": metric, "value": round(float(value), 3), "unit": unit}
    row.update(extra)
    print(json.dumps(row), flush=True)


# ------------------------------------------------------------------ rebuild
def run_rebuild(root: Path):
    from adipose_tpu.core.config import DataBuildConfig
    from adipose_tpu.data.tiling import SegmentationDatasetBuilder

    cfg = DataBuildConfig(tile_size=1024, stride=512, apply_stain_norm=True,
                          reference_path=str(root / "stain_ref.jpg"),
                          val_fraction=0.2, test_fraction=0.0, workers=1)
    build_root = None
    # cold run pays the remote first-compiles of the device QC/Reinhard
    # programs (1-5 min each on axon); warm is the amortized rate a real
    # many-slide build sees
    for label in ("cold", "warm"):
        builder = SegmentationDatasetBuilder(
            cfg, out_parent=root / f"rebuild_out_{label}")
        t0 = time.perf_counter()
        build_root = builder.build(root)
        dt = time.perf_counter() - t0
        n = builder.stats.tiles_total
        emit(f"rebuild_build_{label}", n / dt, "tiles_examined/s",
             tiles=n, seconds=round(dt, 2),
             kept=builder.stats.tiles_kept_pos + builder.stats.tiles_kept_neg)
    return build_root


# ---------------------------------------------------------------- reference
def _install_stubs():
    """tifffile → cv2 IO; skimage.color → cv2-float LAB (the exact oracle
    tests/test_color_stain.py uses; cv2 float LAB IS the CIE formula set
    skimage implements)."""
    tiff = types.ModuleType("tifffile")

    def _imread(path):
        m = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if m is None:
            raise FileNotFoundError(path)
        return m

    def _imwrite(path, arr, **kwargs):
        cv2.imwrite(str(path), np.asarray(arr))

    tiff.imread, tiff.imwrite = _imread, _imwrite
    sys.modules["tifffile"] = tiff

    sk = types.ModuleType("skimage")
    skc = types.ModuleType("skimage.color")

    def rgb2lab(rgb):
        return cv2.cvtColor(np.ascontiguousarray(rgb, np.float32),
                            cv2.COLOR_RGB2Lab).astype(np.float64)

    def lab2rgb(lab):
        return cv2.cvtColor(np.ascontiguousarray(lab, np.float32),
                            cv2.COLOR_Lab2RGB).astype(np.float64)

    skc.rgb2lab, skc.lab2rgb = rgb2lab, lab2rgb
    sk.color = skc
    sys.modules["skimage"] = sk
    sys.modules["skimage.color"] = skc


def run_reference(root: Path):
    _install_stubs()
    for p in (_REF, f"{_REF}/Segmentation"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    argv = sys.argv
    sys.argv = [
        "build_dataset.py", "--data-root", str(root),
        "--output-root", str(root / "ref_out"),
        "--tile-size", "1024", "--stride", "512",
        "--val-ratio", "0.2", "--test-ratio", "0.0",
        "--no-overlays", "--workers", "1",
        "--stain-normalize", "--reference-path", str(root / "stain_ref.jpg"),
    ]
    try:
        # import under its REAL module name so multiprocessing.Pool can
        # pickle its worker functions by reference in the mask stage
        mod = importlib.import_module("build_dataset")
        t0 = time.perf_counter()
        mod.main()
        dt = time.perf_counter() - t0
    finally:
        sys.argv = argv
    # same denominator as the rebuild: tiles examined = grid positions
    import math

    sample = cv2.imread(str(next((root / "Pseudocolored").glob("*.jpg"))))
    h, w = sample.shape[:2]
    per_axis = max(1, math.ceil((h - 1024) / 512) + 1)
    n_slides = len(list((root / "Pseudocolored").glob("*.jpg")))
    n = per_axis * per_axis * n_slides
    emit("reference_build", n / dt, "tiles_examined/s",
         tiles=n, seconds=round(dt, 2))
    return dt


# ------------------------------------------------------------------- loader
def run_loader(build_root: Path):
    from adipose_tpu.data.loader import TileDataset, prefetch_batches

    ds_dir = build_root / "dataset" / "train"
    ds = TileDataset(ds_dir / "images", ds_dir / "masks", batch_size=8)
    if not len(ds):
        print("no train tiles built; skipping loader bench", file=sys.stderr)
        return
    for name, epoch in (("cold", 0), ("cached", 1)):
        t0 = time.perf_counter()
        n = 0
        for imgs, _ in ds.epoch_batches(epoch):
            n += imgs.shape[0]
        dt = time.perf_counter() - t0
        emit(f"loader_{name}_epoch", n / dt, "tiles/s",
             tiles=n, seconds=round(dt, 2))
    # prefetch overlap with a simulated 65 ms device step (b8 at 15.4 tiles/s
    # = 519 ms per 8-tile batch → the loader must beat 15.4 tiles/s to keep
    # the step fed; the cached epoch shows the steady-state margin)
    ds2 = TileDataset(ds_dir / "images", ds_dir / "masks", batch_size=8)
    t0 = time.perf_counter()
    n = 0
    for imgs, _ in prefetch_batches(ds2.epoch_batches(0), depth=2):
        time.sleep(0.519)  # stand-in for the b8 device step
        n += imgs.shape[0]
    dt = time.perf_counter() - t0
    step_bound = n / (n / 8 * 0.519)
    emit("loader_prefetch_with_step", n / dt, "tiles/s", tiles=n,
         seconds=round(dt, 2), step_bound=round(step_bound, 2))


def main():
    n_slides = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    rng = np.random.RandomState(865)
    root = Path(tempfile.mkdtemp(prefix="bench_build_"))
    try:
        make_synthetic(root, n_slides, size, rng)
        emit("inputs", n_slides, "slides", slide_px=size)
        build_root = run_rebuild(root)
        run_loader(build_root)
        run_reference(root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
