"""Host-side tile dataset feeding device-resident batches.

Behavioral spec: ``TileDataset`` (``train_adipose_unet_v3.py:510-628``):
dataset layout ``<build>/dataset/{train,val,test}/{images,masks}`` with
``*.jpg`` grayscale tiles paired by stem to ``*.tif``/``*.tiff`` masks; in-RAM
caching; seeded per-epoch shuffling; last-batch padding by repetition;
z-score (dataset stats) or per-tile percentile normalization.

TPU-native split of work: the host only decodes and caches uint8 tiles and
assembles index order; augmentation and normalization run ON DEVICE inside the
jitted train step (:mod:`adipose_tpu.data.augment`), so the host never touches
float pixels — the reference's GIL-bound py_function bottleneck is gone.
Decoding is thread-parallel within a batch (cv2.imread releases the GIL) and
:func:`prefetch_batches` overlaps host decode of the NEXT batches with the
device step on the current one — the analog of the reference's
``tf.data ... .prefetch(AUTOTUNE)`` (``train_adipose_unet_v3.py:609-623``).

TIFF masks are read via cv2 (tifffile isn't in this env); the builders write
cv2-compatible TIFFs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator

import cv2
import numpy as np

from adipose_tpu.core.hostio import io_workers
from adipose_tpu.core.seeding import get_project_seed


def prefetch_batches(iterable, depth: int = 2):
    """Run ``iterable`` on a background thread, keeping up to ``depth``
    batches ready in a bounded queue. Exceptions re-raise at the consumer.

    Abandoning the generator (early break / GC) stops the worker: its queue
    slots are drained so a blocked ``put`` wakes, and the daemon worker checks
    the stop flag before producing more.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    _END, _ERR = object(), object()

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate to the consumer
            q.put((_ERR, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise item[1]
            yield item
    finally:
        stop.set()
        while True:  # free a blocked put so the daemon can observe `stop`
            try:
                q.get_nowait()
            except queue.Empty:
                break


class _BoundedCache:
    """Byte-budgeted insert-if-room tile cache.

    Same admission policy as the reference's ``TileDataset`` cache
    (``train_adipose_unet_v3.py:560-561``: insert while below the cap, no
    eviction — first-seen tiles win), but budgeted in BYTES rather than pair
    count because our tiles are u8 (8× smaller than the reference's f32
    pairs) and sizes vary between the two dataset types. A miss beyond the
    budget simply stays uncached.
    """

    def __init__(self, limit_bytes: int):
        self.limit_bytes = int(limit_bytes)
        self._store: dict = {}
        self._used = 0
        # put() runs concurrently from the decode thread pool (and padded
        # final batches repeat an index, so duplicate-key puts DO happen);
        # the budget check-then-insert must be atomic
        self._lock = threading.Lock()

    def __contains__(self, key) -> bool:
        return key in self._store

    def get(self, key):
        return self._store.get(key)

    def put(self, key, value) -> None:
        arrays = value if isinstance(value, tuple) else (value,)
        nbytes = sum(a.nbytes for a in arrays)
        with self._lock:
            if key in self._store:
                return
            if self._used + nbytes <= self.limit_bytes:
                self._store[key] = value
                self._used += nbytes

    def __len__(self) -> int:
        return len(self._store)


def _imread_gray(path: Path) -> np.ndarray:
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise ValueError(f"Failed to load image: {path}")
    return img


def _imread_mask(path: Path) -> np.ndarray:
    m = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if m is None:
        raise ValueError(f"Failed to load mask: {path}")
    if m.ndim == 3:
        m = m[..., 0]
    return (m > 0).astype(np.uint8)


class TileDataset:
    """Paired image/mask tiles with RAM cache and deterministic epoch order."""

    def __init__(
        self,
        images_dir: str | Path,
        masks_dir: str | Path,
        batch_size: int,
        cache: bool = True,
        seed: int | None = None,
        cache_limit_mb: int = 4096,
    ):
        self.images_dir = Path(images_dir)
        self.masks_dir = Path(masks_dir)
        self.batch_size = batch_size
        self.seed = get_project_seed() if seed is None else seed
        image_files = sorted(self.images_dir.glob("*.jpg")) + sorted(
            self.images_dir.glob("*.png")
        )
        mask_files = {}
        for ext in ("*.tif", "*.tiff", "*.png"):
            for p in self.masks_dir.glob(ext):
                mask_files.setdefault(p.stem, p)
        self.pairs = [
            (p, mask_files[p.stem]) for p in image_files if p.stem in mask_files
        ]
        self._cache = (_BoundedCache(cache_limit_mb << 20)
                       if cache and cache_limit_mb > 0 else None)
        self._pool: ThreadPoolExecutor | None = None

    def _decode_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=io_workers(), thread_name_prefix="tile-decode",
            )
        return self._pool

    def __len__(self) -> int:
        return len(self.pairs)

    @property
    def steps_per_epoch(self) -> int:
        return max(1, (len(self.pairs) + self.batch_size - 1) // self.batch_size)

    def load_pair(self, idx: int):
        img_path, mask_path = self.pairs[idx]
        key = img_path.stem
        if self._cache is not None and key in self._cache:
            return self._cache.get(key)
        img = _imread_gray(img_path)
        mask = _imread_mask(mask_path)
        if self._cache is not None:
            self._cache.put(key, (img, mask))
        return img, mask

    def epoch_batches(self, epoch: int, shuffle: bool = True) -> Iterator[tuple]:
        """Yield (images u8 (B,H,W), masks u8 (B,H,W)) numpy batches.

        Epoch order derives from (seed, epoch) so any epoch is reproducible in
        isolation; short final batches repeat the last element
        (``train_adipose_unet_v3.py:600-602``).
        """
        indices = np.arange(len(self.pairs))
        if shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(indices)
        for i in range(0, len(indices), self.batch_size):
            batch_idx = list(indices[i : i + self.batch_size])
            while len(batch_idx) < self.batch_size:
                batch_idx.append(batch_idx[-1])
            # thread-parallel decode (order-preserving); cv2 releases the GIL
            imgs, masks = zip(*self._decode_pool().map(self.load_pair, batch_idx))
            yield np.stack(imgs), np.stack(masks)


class ClassificationDataset:
    """Keras-style class-folder dataset: ``<split>/{adipose,not_adipose}/*.jpg``
    (``Classification/train_adipose_classifier_v0.py:135-150``)."""

    def __init__(self, split_dir: str | Path, batch_size: int,
                 seed: int | None = None, cache_limit_mb: int = 4096):
        self.split_dir = Path(split_dir)
        self.batch_size = batch_size
        self.seed = get_project_seed() if seed is None else seed
        pos = sorted((self.split_dir / "adipose").glob("*.jpg"))
        neg = sorted((self.split_dir / "not_adipose").glob("*.jpg"))
        self.files = pos + neg
        self.labels = np.array([1] * len(pos) + [0] * len(neg), np.float32)
        self._cache = _BoundedCache(max(0, cache_limit_mb) << 20)
        self._pool: ThreadPoolExecutor | None = None

    def _decode_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=io_workers(), thread_name_prefix="cls-decode",
            )
        return self._pool

    def __len__(self) -> int:
        return len(self.files)

    @property
    def steps_per_epoch(self) -> int:
        return max(1, (len(self.files) + self.batch_size - 1) // self.batch_size)

    def class_counts(self) -> tuple:
        n_pos = int(self.labels.sum())
        return n_pos, len(self.labels) - n_pos

    def load(self, idx: int) -> np.ndarray:
        path = self.files[idx]
        if idx in self._cache:
            return self._cache.get(idx)
        img = _imread_gray(path)
        self._cache.put(idx, img)
        return img

    def epoch_batches(self, epoch: int, shuffle: bool = True) -> Iterator[tuple]:
        indices = np.arange(len(self.files))
        if shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(indices)
        for i in range(0, len(indices), self.batch_size):
            batch_idx = list(indices[i : i + self.batch_size])
            while len(batch_idx) < self.batch_size:
                batch_idx.append(batch_idx[-1])
            imgs = np.stack(list(self._decode_pool().map(self.load, batch_idx)))
            labels = self.labels[batch_idx]
            yield imgs, labels
