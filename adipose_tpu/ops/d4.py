"""The D4 symmetry group on square tiles — the basis of TTA and tta-style augment.

Behavioral spec:
  * ``Segmentation/full_evaluation_enhanced.py:522-600`` — TestTimeAugmentation
    transform sets 'minimal' (2), 'basic' (4), 'full' (8), each a pair of
    (augment, de-augment) maps with aug∘deaug = id.
  * ``src/utils/data.py:295-318`` — augment_pair_tta_style's systematic
    transform ids 0..7 (rotations, then fliplr-composed rotations).
  * ``Classification/eval_adipose_classifier.py:98-102`` — same 8 ids for
    deterministic classifier TTA.

TPU-native: a transform id is static data, so applying "transform t of 8" is a
``lax.switch`` over rot90/flip compositions — vmapping over ids gives the whole
8-view TTA batch as ONE device tensor op, no host round-trips.

Transform ids (matching data.py:299-317 / eval order):
  0: identity            4: fliplr
  1: rot90               5: fliplr → rot90
  2: rot180              6: fliplr → rot180
  3: rot270              7: fliplr → rot270

All ops act on the last two-from-end spatial axes of (..., H, W) or the leading
spatial axes of (H, W, C); here we standardize on arrays whose FIRST two axes
are spatial (H, W, ...) to match numpy's rot90/fliplr defaults in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_TRANSFORMS = 8

# De-augmentation table: inverse of each transform id, as a transform id.
# rotk inverse is rot(4-k); fliplr∘rotk inverse is itself composed appropriately.
# Verified by the involution test aug(deaug(x)) == x in tests/test_d4.py.
INVERSE_IDS = (0, 3, 2, 1, 4, 5, 6, 7)


def _rot(k: int):
    return lambda x: jnp.rot90(x, k, axes=(0, 1))


def _fliplr(x):
    return jnp.flip(x, axis=1)


def _branches():
    return [
        lambda x: x,
        _rot(1),
        _rot(2),
        _rot(3),
        _fliplr,
        lambda x: jnp.rot90(_fliplr(x), 1, axes=(0, 1)),
        lambda x: jnp.rot90(_fliplr(x), 2, axes=(0, 1)),
        lambda x: jnp.rot90(_fliplr(x), 3, axes=(0, 1)),
    ]


def apply_transform(x: jax.Array, transform_id) -> jax.Array:
    """Apply D4 transform by (possibly traced) id; spatial axes are (0, 1)."""
    return jax.lax.switch(jnp.asarray(transform_id, jnp.int32), _branches(), x)


# Factorization of each transform id as flipH^a ∘ flipW^b ∘ transpose^t
# (flips applied AFTER the optional transpose; verified against
# apply_transform for all ids in tests/test_d4_blend.py). rot90 = flipH∘T,
# rot270 = flipW∘T, id 5 (fliplr→rot90) = T itself, id 7 = flipH∘flipW∘T.
_D4_TRANSPOSE = (0, 1, 0, 1, 0, 1, 0, 1)
_D4_FLIP_H = (0, 1, 1, 0, 0, 0, 1, 1)
_D4_FLIP_W = (0, 0, 1, 1, 1, 0, 0, 1)


def apply_transform_batch(x: jax.Array, transform_ids: jax.Array) -> jax.Array:
    """Per-sample D4 transforms over a (B, H, W) batch of SQUARE tiles.

    TPU-native: ``vmap(apply_transform)`` with traced ids makes XLA's layout
    assignment put the batch dim in the 128-lane position ({0,2,1}, a 16×
    padding expansion at B=8) so the per-branch rot90 transposes become
    bitcasts — and that layout then infects every downstream fusion (measured:
    the 'moderate' augmentation tier spends 786 of 916 ms/batch in the
    rot90/flip stage, and some ablations fail to even allocate). Factoring
    every D4 element as flipH^a ∘ flipW^b ∘ T^t instead needs ONE shared
    batched transpose plus three layout-preserving selects, with the batch
    dim kept major throughout.
    """
    if x.ndim != 3 or x.shape[1] != x.shape[2]:
        raise ValueError(f"apply_transform_batch needs (B, N, N), got {x.shape}")
    from adipose_tpu.ops.pallas.layout import pin_default_layout

    tids = jnp.asarray(transform_ids, jnp.int32)
    t = jnp.asarray(_D4_TRANSPOSE, bool)[tids][:, None, None]
    a = jnp.asarray(_D4_FLIP_H, bool)[tids][:, None, None]
    b = jnp.asarray(_D4_FLIP_W, bool)[tids][:, None, None]
    # pin: without it XLA bitcasts the transpose by assigning the batch-minor
    # {0,2,1} layout (16× padded at B=8) to every downstream fusion — see
    # ops/pallas/layout.py for the measurement.
    xt = pin_default_layout(jnp.swapaxes(x, 1, 2))
    y = jnp.where(t, xt, x)
    y = jnp.where(a, y[:, ::-1, :], y)
    return jnp.where(b, y[:, :, ::-1], y)


def invert_transform_batch(x: jax.Array, transform_ids: jax.Array) -> jax.Array:
    """Batched inverse of :func:`apply_transform_batch` (same id vector)."""
    inv = jnp.asarray(INVERSE_IDS, jnp.int32)[jnp.asarray(transform_ids, jnp.int32)]
    return apply_transform_batch(x, inv)


def invert_transform(x: jax.Array, transform_id) -> jax.Array:
    """Apply the inverse of a transform id (for de-augmenting predictions)."""
    inv = jnp.asarray(INVERSE_IDS, jnp.int32)[jnp.asarray(transform_id, jnp.int32)]
    return jax.lax.switch(inv, _branches(), x)


@partial(jax.jit, static_argnames=("num",))
def expand_tta(x: jax.Array, num: int = 8) -> jax.Array:
    """All `num` D4 views of one (H, W[, C]) tile → (num, H, W[, C]).

    num=8 is 'full' TTA. For 'minimal'/'basic' the evaluator selects id subsets
    (see :mod:`adipose_tpu.eval.tta`) because the reference's smaller modes use
    flips that are not a prefix of the id ordering.
    """
    ids = jnp.arange(num, dtype=jnp.int32)
    return jax.vmap(lambda t: apply_transform(x, t))(ids)


@partial(jax.jit, static_argnames=("num",))
def collapse_tta(views: jax.Array, num: int = 8) -> jax.Array:
    """De-augment (num, H, W[, C]) predictions and average → (H, W[, C])."""
    ids = jnp.arange(num, dtype=jnp.int32)
    deaug = jax.vmap(invert_transform)(views, ids)
    return jnp.mean(deaug, axis=0)


# The reference's named TTA modes as id subsets.
# 'minimal': identity, fliplr (full_evaluation_enhanced.py:551-554)
# 'basic':   identity, fliplr, flipud, rot90 (:556-561); flipud = rot180∘fliplr = id 6
MODE_IDS = {
    "minimal": (0, 4),
    "basic": (0, 4, 6, 1),
    "full": (0, 1, 2, 3, 4, 5, 6, 7),
}

# Classifier TTA modes differ from the segmentation ones: 'basic' is the four
# rotations, 'full' adds their horizontal flips
# (classification_inference.py:323-348).
CLASSIFIER_MODE_IDS = {
    "basic": (0, 1, 2, 3),
    "full": (0, 1, 2, 3, 4, 5, 6, 7),
}
