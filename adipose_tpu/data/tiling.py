"""Tile planning + segmentation dataset builder.

Behavioral spec: ``Segmentation/build_dataset.py`` (2166 LoC):
  * ``tile_coords`` (:1287-1307): ceil-step grid with edge clamping;
  * pipeline (:1952-2110): slide discovery + slide-level confidence gate →
    parallel mask rasterization → target-mask prep (fat − bubbles + cleanup) →
    tiling with white/blur QC (``classify_tiles_batch`` :1253-1284) →
    per-tile confidence filter → ambiguous-tile exclusion (0 < ratio <
    min_mask_ratio, :1571) → negative sampling so negatives are ``neg_pct`` of
    the kept set (:1589-1632) → slide-grouped train/val/test split
    (:1654-1783) → timestamped ``_build_YYYYMMDD_HHMMSS`` root with
    ``build_log.json``/``build_summary.txt`` (:205-422);
  * tile names ``{base}_r{ri}_c{ci}.jpg`` — the coordinate contract every
    downstream tool parses (eval slide grouping, WSI reconstruction).

TPU-native: QC (white/blur) and optional Reinhard run as device-batched jit
programs over stacks of tiles — the two hottest stages of the reference's
build (its per-tile skimage Reinhard dominates build time).
"""

from __future__ import annotations

import json
import math
import shutil
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np

from adipose_tpu.core.config import DataBuildConfig
from adipose_tpu.data.rasterize import (
    create_binary_mask,
    get_tile_annotations,
    load_json_annotations,
    prepare_target_mask,
    slide_has_valid_annotations,
)
from adipose_tpu.ops.qc import classify_tiles_batch
from adipose_tpu.ops.stain import DEFAULT_REFERENCE, reinhard_normalize_batch


def tile_coords(h: int, w: int, tile: int, stride: int):
    """(ri, ci, ys, xs) grid covering the image (``build_dataset.py:1287-1307``)."""
    if h < tile or w < tile:
        return []
    x_steps = max(1, math.ceil((w - tile) / stride) + 1)
    y_steps = max(1, math.ceil((h - tile) / stride) + 1)
    coords = []
    for ri in range(y_steps):
        for ci in range(x_steps):
            xs = min(ci * stride, w - tile)
            ys = min(ri * stride, h - tile)
            if xs >= 0 and ys >= 0 and xs + tile <= w and ys + tile <= h:
                coords.append((ri, ci, ys, xs))
    return coords


@dataclass
class SlideSource:
    """One input slide: image + fat annotation JSON (+ optional bubbles)."""

    base: str
    image_path: Path
    fat_json: Path | None = None
    bubble_json: Path | None = None
    is_test: bool = False


def discover_slides(data_root: str | Path, min_confidence: int = 1):
    """Reference layout discovery: ``Pseudocolored/`` images with
    ``Masks/fat/<base>*.json`` annotations (+ ``Masks/bubbles``), plus
    ``Pseudocolored/test/`` external test slides (``build_dataset.py:609-722``).
    Slides whose annotations all fall below ``min_confidence`` are skipped."""
    root = Path(data_root)
    img_exts = (".jpg", ".jpeg", ".png", ".tif", ".tiff")
    slides = []

    def _find_json(mask_dir: Path, base: str):
        if not mask_dir.exists():
            return None
        for cand in sorted(mask_dir.glob(f"{base}*.json")):
            return cand
        return None

    for subdir, is_test in ((root / "Pseudocolored", False),
                            (root / "Pseudocolored" / "test", True)):
        if not subdir.exists():
            continue
        for img in sorted(subdir.iterdir()):
            if img.suffix.lower() not in img_exts or not img.is_file():
                continue
            base = img.stem
            fat = _find_json(root / "Masks" / "fat", base)
            bubbles = _find_json(root / "Masks" / "bubbles", base)
            if fat is not None and not slide_has_valid_annotations(fat, min_confidence):
                continue
            slides.append(SlideSource(base, img, fat, bubbles, is_test))
    return slides


@dataclass
class BuildStats:
    masks_built: int = 0
    tiles_total: int = 0
    tiles_kept_pos: int = 0
    tiles_kept_neg: int = 0
    tiles_skipped_empty: int = 0
    tiles_skipped_blurry: int = 0
    tiles_skipped_ambiguous: int = 0
    tiles_skipped_low_conf: int = 0
    neg_candidates: int = 0
    split_counts: dict = field(default_factory=dict)


class SegmentationDatasetBuilder:
    def __init__(self, cfg: DataBuildConfig | None = None,
                 build_root: str | Path | None = None,
                 out_parent: str | Path = ".",
                 qc_batch: int = 16):
        self.cfg = cfg or DataBuildConfig()
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        self.build_root = (
            Path(build_root)
            if build_root
            else Path(out_parent) / f"_build_{ts}"
        )
        self.qc_batch = qc_batch
        self.stats = BuildStats()

    # -- stage 1: masks -------------------------------------------------------

    def build_slide_mask(self, slide: SlideSource) -> np.ndarray | None:
        """Rasterize fat (− bubbles) into the slide-size target mask."""
        img = cv2.imread(str(slide.image_path), cv2.IMREAD_UNCHANGED)
        if img is None:
            return None
        h, w = img.shape[:2]
        if slide.fat_json is None:
            return np.zeros((h, w), np.uint8)
        polys, _ = load_json_annotations(slide.fat_json, self.cfg.min_confidence_train)
        fat = create_binary_mask(polys, w, h)
        bubble = None
        if slide.bubble_json is not None:
            bpolys, _ = load_json_annotations(slide.bubble_json, 1)
            bubble = create_binary_mask(bpolys, w, h)
        mask = prepare_target_mask(fat, bubble)
        self.stats.masks_built += 1
        return mask

    # -- stage 2: tiling + QC + filters ---------------------------------------

    def _qc_batchwise(self, tiles: list) -> list:
        """Device-batched QC over gray tiles; returns verdict dicts."""
        out = []
        cfg = self.cfg
        for i in range(0, len(tiles), self.qc_batch):
            chunk = np.stack(tiles[i : i + self.qc_batch]).astype(np.float32)
            v = classify_tiles_batch(
                jnp.asarray(chunk), cfg.white_threshold, cfg.white_ratio,
                cfg.blur_threshold,
            )
            for j in range(chunk.shape[0]):
                out.append({k: np.asarray(val[j]) for k, val in v.items()})
        return out

    def tile_slide(self, slide: SlideSource, mask: np.ndarray):
        """Returns list of dicts: {name, image(2D u8), mask(2D u8), pos_ratio,
        keep status}. Applies QC, confidence, ambiguity gates."""
        cfg = self.cfg
        img = cv2.imread(str(slide.image_path), cv2.IMREAD_UNCHANGED)
        if img is None:
            return []
        if img.ndim == 3:
            gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            gray = img
            rgb = None
        if gray.dtype == np.uint16:
            gray = (gray / 257.0).astype(np.uint8)
        h, w = gray.shape
        coords = tile_coords(h, w, cfg.tile_size, cfg.stride)
        if not coords:
            return []
        min_conf = (
            cfg.min_confidence_eval if slide.is_test else cfg.min_confidence_train
        )

        tiles_gray = [gray[ys : ys + cfg.tile_size, xs : xs + cfg.tile_size]
                      for (_, _, ys, xs) in coords]
        verdicts = self._qc_batchwise(tiles_gray)

        if cfg.apply_stain_norm and rgb is not None:
            ref_mean, ref_std = DEFAULT_REFERENCE.as_arrays()
            normed = []
            for i in range(0, len(coords), self.qc_batch):
                chunk = np.stack([
                    rgb[ys : ys + cfg.tile_size, xs : xs + cfg.tile_size]
                    for (_, _, ys, xs) in coords[i : i + self.qc_batch]
                ]).astype(np.float32) / 255.0
                out = reinhard_normalize_batch(jnp.asarray(chunk), ref_mean, ref_std)
                normed.extend(np.asarray(out * 255.0).astype(np.uint8))
            tiles_gray = [cv2.cvtColor(t, cv2.COLOR_RGB2GRAY) for t in normed]

        results = []
        for (ri, ci, ys, xs), tile_img, v in zip(coords, tiles_gray, verdicts):
            self.stats.tiles_total += 1
            if bool(v["is_empty"]):
                self.stats.tiles_skipped_empty += 1
                continue
            if bool(v["is_blurry"]):
                self.stats.tiles_skipped_blurry += 1
                continue
            m_tile = mask[ys : ys + cfg.tile_size, xs : xs + cfg.tile_size]
            pos_ratio = float(m_tile.mean())
            if pos_ratio > 0 and slide.fat_json is not None:
                bbox = (xs, ys, xs + cfg.tile_size, ys + cfg.tile_size)
                _, low_conf_only = get_tile_annotations(slide.fat_json, bbox, min_conf)
                if low_conf_only:
                    self.stats.tiles_skipped_low_conf += 1
                    continue
            if 0 < pos_ratio < cfg.ambiguous_high:
                self.stats.tiles_skipped_ambiguous += 1
                continue
            results.append({
                "name": f"{slide.base}_r{ri}_c{ci}",
                "image": tile_img,
                "mask": (m_tile > 0).astype(np.uint8) * 255,
                "pos_ratio": pos_ratio,
                "is_test": slide.is_test,
                "base": slide.base,
            })
        return results

    # -- stage 3: negative sampling + split -----------------------------------

    def sample_negatives(self, tiles: list) -> list:
        """Keep positives; sample negatives to ``negative_fraction`` of the
        final set (``build_dataset.py:1589-1632``): n_neg = round(f/(1−f)·n_pos)."""
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        pos = [t for t in tiles if t["pos_ratio"] > 0]
        neg = [t for t in tiles if t["pos_ratio"] == 0]
        self.stats.neg_candidates = len(neg)
        f = max(0.0, min(cfg.negative_fraction, 0.99))
        target = int(round((f / max(1e-9, 1.0 - f)) * len(pos)))
        target = min(target, len(neg))
        chosen = (
            [neg[i] for i in rng.choice(len(neg), size=target, replace=False)]
            if target > 0
            else []
        )
        self.stats.tiles_kept_pos = len(pos)
        self.stats.tiles_kept_neg = len(chosen)
        return pos + chosen

    def split_tiles(self, tiles: list) -> dict:
        """Slide-grouped split (``build_dataset.py:1710-1745``): external test
        tiles go to test; remaining slides shuffle-split by val/test ratios."""
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        external_test = [t for t in tiles if t["is_test"]]
        train_pool = [t for t in tiles if not t["is_test"]]
        groups: dict = {}
        for t in train_pool:
            groups.setdefault(t["base"], []).append(t)
        slides = list(groups)
        rng.shuffle(slides)
        n_test = (
            max(1, int(len(slides) * cfg.test_fraction)) if cfg.test_fraction > 0 and slides else 0
        )
        n_test = min(n_test, len(slides))
        test_slides = set(slides[:n_test])
        remaining = slides[n_test:]
        n_val = (
            max(1, int(len(remaining) * cfg.val_fraction)) if cfg.val_fraction > 0 and remaining else 0
        )
        n_val = min(n_val, len(remaining))
        val_slides = set(remaining[:n_val])

        out = {"train": [], "val": [], "test": list(external_test)}
        for s, items in groups.items():
            if s in test_slides:
                out["test"].extend(items)
            elif s in val_slides:
                out["val"].extend(items)
            else:
                out["train"].extend(items)
        return out

    # -- driver ---------------------------------------------------------------

    def build(self, data_root: str | Path) -> Path:
        slides = discover_slides(data_root, self.cfg.min_confidence_train)
        if not slides:
            raise FileNotFoundError(f"no slides discovered under {data_root}")
        all_tiles = []
        for slide in slides:
            mask = self.build_slide_mask(slide)
            if mask is None:
                continue
            all_tiles.extend(self.tile_slide(slide, mask))
        kept = self.sample_negatives(all_tiles)
        splits = self.split_tiles(kept)
        for split, tiles in splits.items():
            img_dir = self.build_root / "dataset" / split / "images"
            msk_dir = self.build_root / "dataset" / split / "masks"
            img_dir.mkdir(parents=True, exist_ok=True)
            msk_dir.mkdir(parents=True, exist_ok=True)
            for t in tiles:
                cv2.imwrite(str(img_dir / f"{t['name']}.jpg"), t["image"],
                            [cv2.IMWRITE_JPEG_QUALITY, 95])
                cv2.imwrite(str(msk_dir / f"{t['name']}.tif"), t["mask"])
            self.stats.split_counts[split] = len(tiles)
        self._write_logs(data_root, slides)
        return self.build_root

    def _write_logs(self, data_root, slides):
        """``build_log.json`` + ``build_summary.txt`` (``build_dataset.py:205-422``)."""
        log = {
            "timestamp": datetime.now().isoformat(),
            "data_root": str(data_root),
            "n_slides": len(slides),
            "config": {k: (list(v) if isinstance(v, tuple) else v)
                       for k, v in vars(self.cfg).items()},
            "stats": vars(self.stats).copy(),
        }
        (self.build_root / "build_log.json").write_text(json.dumps(log, indent=2, default=str))
        s = self.stats
        summary = [
            "=== adipose_tpu dataset build summary ===",
            f"slides: {len(slides)}   masks built: {s.masks_built}",
            f"tiles examined: {s.tiles_total}",
            f"kept: {s.tiles_kept_pos} positive + {s.tiles_kept_neg} negative",
            f"skipped: {s.tiles_skipped_empty} empty/white, {s.tiles_skipped_blurry} blurry, "
            f"{s.tiles_skipped_ambiguous} ambiguous, {s.tiles_skipped_low_conf} low-confidence",
            f"splits: {s.split_counts}",
        ]
        (self.build_root / "build_summary.txt").write_text("\n".join(summary) + "\n")


def find_most_recent_build_dir(base: str | Path) -> Path:
    """(``train_adipose_unet_v3.py:128-165``)."""
    import glob
    import re

    base = Path(base)
    builds = []
    for p in glob.glob(str(base / "_build_*")):
        m = re.search(r"_build_(\d{8}_\d{6})$", Path(p).name)
        if m:
            builds.append((m.group(1), Path(p)))
    if builds:
        return sorted(builds, reverse=True)[0][1]
    if (base / "_build").exists():
        return base / "_build"
    raise FileNotFoundError(f"No build directories found in {base}")
