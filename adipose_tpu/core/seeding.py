"""Central seeding, compatible with the reference's seed.csv contract.

The reference keeps one project seed in ``seed.csv`` (value 865) loaded by
``src/utils/seed_utils.py:11-48`` and applies it to numpy/TF/python RNGs in every
entry point. Here the single seed becomes the root of a keyed `jax.random`
tree: every consumer derives a stable, independent PRNG key from
(seed, domain string), which keeps the pipeline deterministic *and* parallel —
per-sample keys are derived by folding in the sample index, so data-order and
worker count never change the stream a sample sees.
"""

from __future__ import annotations

import hashlib
import os
import random
from pathlib import Path

import jax
import numpy as np

DEFAULT_SEED = 865  # reference seed.csv:1

_REPO_ROOT = Path(__file__).resolve().parents[2]


def load_seed(path: str | os.PathLike | None = None) -> int:
    """Load the project seed from a one-line CSV file.

    Mirrors the reference contract (``src/utils/seed_utils.py:11-40``): the file
    holds a single integer; a missing/corrupt file falls back to the default.
    """
    if path is None:
        path = _REPO_ROOT / "seed.csv"
    try:
        text = Path(path).read_text().strip()
        first = text.splitlines()[0].split(",")[0].strip()
        return int(first)
    except (OSError, ValueError, IndexError):
        return DEFAULT_SEED


def get_project_seed(path: str | os.PathLike | None = None) -> int:
    """Project-wide seed (``src/utils/seed_utils.py:43``-equivalent)."""
    return load_seed(path)


def key_for(domain: str, seed: int | None = None, index: int | None = None) -> jax.Array:
    """Derive a stable PRNG key for a named domain (and optional element index).

    ``key_for("train.augment", index=i)`` is independent of ``key_for("train.shuffle")``
    and of every other index — the domain string is hashed (stable across runs,
    unlike Python's salted ``hash``) and folded into the root key.
    """
    if seed is None:
        seed = get_project_seed()
    digest = hashlib.sha256(domain.encode("utf-8")).digest()
    domain_fold = int.from_bytes(digest[:4], "little")
    key = jax.random.fold_in(jax.random.PRNGKey(seed), domain_fold)
    if index is not None:
        key = jax.random.fold_in(key, index)
    return key


def keys_for_batch_range(domain: str, seed: int | None, indices) -> np.ndarray:
    """``split(key_for(domain, seed, i))`` for every i in ``indices``, in ONE
    device program, downloaded to host.

    Per-iteration ``key_for`` calls each dispatch a tiny fold_in program —
    ~100 ms apiece on the axon tunnel (BASELINE.md r3 lessons) — so epoch
    loops precompute their whole key schedule here. Returns (n, 2, 2) uint32:
    ``[i, 0]`` / ``[i, 1]`` are exactly the two keys
    ``jax.random.split(key_for(domain, seed, indices[i]))`` yields.
    """
    import jax.numpy as jnp

    base = key_for(domain, seed)

    def go(base_key, idxs):
        ks = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(idxs)
        return jax.vmap(jax.random.split)(ks)

    return np.asarray(
        jax.jit(go)(base, jnp.asarray(np.asarray(indices), jnp.uint32)))


def seed_everything(seed: int | None = None) -> int:
    """Seed host-side RNGs (numpy / python) for reproducible host preprocessing.

    Device-side randomness always flows through :func:`key_for`; this covers the
    host-side tail (shuffles in builders, cv2-based augment fallbacks).
    """
    if seed is None:
        seed = get_project_seed()
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return seed
