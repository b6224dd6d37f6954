"""Shared host-side IO threading helpers.

The reference leans on ``tf.data`` (``AUTOTUNE`` maps + ``.prefetch``,
``train_adipose_unet_v3.py:609-623``) to hide JPEG/TIFF codec latency behind
the accelerator step. The TPU rebuild keeps the host path in plain Python, so
the equivalent overlap comes from two primitives:

- :func:`thread_map` — order-preserving parallel map over a thread pool for
  cv2 decode/encode calls (libjpeg/libtiff release the GIL);
- :func:`adipose_tpu.data.loader.prefetch_batches` — a bounded background
  producer that keeps the next batches decoded while the device steps.

Keep pools per call site (they're cheap) except for per-batch hot loops,
which should reuse a lazily-built pool (see ``data/loader.py``).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, TypeVar

_T = TypeVar("_T")
_R = TypeVar("_R")


def io_workers(cap: int = 8) -> int:
    """Worker count for GIL-releasing codec work: min(cap, cpu_count)."""
    return max(1, min(cap, os.cpu_count() or 1))


def thread_map(fn: Callable[[_T], _R], items: Iterable[_T],
               cap: int = 8) -> list[_R]:
    """Order-preserving parallel map for IO/codec-bound ``fn``.

    Exceptions propagate like a plain ``map`` (first failing item raises at
    its position). Results are fully materialized — use for bounded batches,
    not unbounded streams.
    """
    with ThreadPoolExecutor(max_workers=io_workers(cap)) as ex:
        return list(ex.map(fn, items))
