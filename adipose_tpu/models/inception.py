"""Flax InceptionV3 + binary classification head.

The reference's tile classifier is Keras ``InceptionV3(include_top=False)`` with
a GlobalAveragePooling → Dropout(0.4) → Dense(1, sigmoid) head
(``Classification/train_adipose_classifier_v0.py:312-319``), fine-tuned in two
phases with the backbone unfrozen from layer ``mixed7``
(:493-503). This is a from-scratch Flax implementation of the public
InceptionV3 architecture (Szegedy et al., 2015), structured so that

  * every conv/BN pair is named ``conv_<i>``/``bn_<i>`` in the same order Keras
    instantiates them — the TF-H5 importer maps by this order;
  * ``mixed<k>`` boundaries are tracked so phase-2 partial unfreezing can mask
    parameters exactly like the reference's ``unfreeze_from_layer('mixed7')``.

TPU-native: NHWC, bf16 compute / f32 params+BN stats, single fused forward.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv(no bias) → BatchNorm(no scale, eps 1e-3) → ReLU (Keras conv2d_bn)."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # Keras special-cases BatchNormalization under `layer.trainable=False`:
        # the layer runs in INFERENCE mode during fit — it normalizes with the
        # MOVING statistics and does not update them
        # (train_adipose_classifier_v0.py:355-358 freezes per-layer). `frozen`
        # reproduces that: a frozen ConvBN uses running stats even when
        # train=True.
        x = nn.BatchNorm(
            use_running_average=(not train) or frozen,
            use_scale=False,
            epsilon=1e-3,
            momentum=0.99,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        return nn.relu(x).astype(self.dtype)


def _avg_pool_same(x):
    # count_include_pad=False: Keras AveragePooling2D('same') divides by the
    # number of VALID cells in each window, not the full 3×3 — border pixels
    # differ otherwise (caught by the TF-oracle forward parity test; the
    # include-pad variant drifted the classifier probability by ~1.7e-2).
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                       count_include_pad=False)


def _max_pool_valid(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionV3(nn.Module):
    """Feature extractor: (B, 299, 299, 3) → (B, 8, 8, 2048).

    ``mixed_outputs`` optionally returns intermediate mixed-block activations.
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_below: int = 0):
        dt = self.dtype
        x = x.astype(dt)
        counter = [0]

        def cbn(y, features, kh, kw, strides=(1, 1), padding="SAME"):
            i = counter[0]
            counter[0] += 1
            return ConvBN(features, (kh, kw), strides, padding, dt, name=f"cbn_{i}")(
                y, train, frozen=i < frozen_below
            )

        # Stem
        x = cbn(x, 32, 3, 3, strides=(2, 2), padding="VALID")
        x = cbn(x, 32, 3, 3, padding="VALID")
        x = cbn(x, 64, 3, 3)
        x = _max_pool_valid(x)
        x = cbn(x, 80, 1, 1, padding="VALID")
        x = cbn(x, 192, 3, 3, padding="VALID")
        x = _max_pool_valid(x)

        mixed = {}

        # mixed 0..2: 35×35 Inception-A
        for k, pool_features in enumerate((32, 64, 64)):
            b1 = cbn(x, 64, 1, 1)
            b5 = cbn(cbn(x, 48, 1, 1), 64, 5, 5)
            b3 = cbn(cbn(cbn(x, 64, 1, 1), 96, 3, 3), 96, 3, 3)
            bp = cbn(_avg_pool_same(x), pool_features, 1, 1)
            x = jnp.concatenate([b1, b5, b3, bp], axis=-1)
            mixed[f"mixed{k}"] = x

        # mixed 3: 17×17 reduction
        b3 = cbn(x, 384, 3, 3, strides=(2, 2), padding="VALID")
        b3d = cbn(cbn(x, 64, 1, 1), 96, 3, 3)
        b3d = cbn(b3d, 96, 3, 3, strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b3, b3d, _max_pool_valid(x)], axis=-1)
        mixed["mixed3"] = x

        # mixed 4..7: 17×17 Inception-B (factorized 7×7)
        for k, c7 in zip((4, 5, 6, 7), (128, 160, 160, 192)):
            b1 = cbn(x, 192, 1, 1)
            b7 = cbn(cbn(cbn(x, c7, 1, 1), c7, 1, 7), 192, 7, 1)
            b7d = cbn(cbn(cbn(cbn(cbn(x, c7, 1, 1), c7, 7, 1), c7, 1, 7), c7, 7, 1), 192, 1, 7)
            bp = cbn(_avg_pool_same(x), 192, 1, 1)
            x = jnp.concatenate([b1, b7, b7d, bp], axis=-1)
            mixed[f"mixed{k}"] = x

        # mixed 8: 8×8 reduction
        b3 = cbn(cbn(x, 192, 1, 1), 320, 3, 3, strides=(2, 2), padding="VALID")
        b7 = cbn(cbn(cbn(x, 192, 1, 1), 192, 1, 7), 192, 7, 1)
        b7 = cbn(b7, 192, 3, 3, strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b3, b7, _max_pool_valid(x)], axis=-1)
        mixed["mixed8"] = x

        # mixed 9..10: 8×8 Inception-C (expanded filter bank)
        for k in (9, 10):
            b1 = cbn(x, 320, 1, 1)
            b3 = cbn(x, 384, 1, 1)
            b3 = jnp.concatenate([cbn(b3, 384, 1, 3), cbn(b3, 384, 3, 1)], axis=-1)
            b3d = cbn(cbn(x, 448, 1, 1), 384, 3, 3)
            b3d = jnp.concatenate([cbn(b3d, 384, 1, 3), cbn(b3d, 384, 3, 1)], axis=-1)
            bp = cbn(_avg_pool_same(x), 192, 1, 1)
            x = jnp.concatenate([b1, b3, b3d, bp], axis=-1)
            mixed[f"mixed{k}"] = x

        return x


# conv index at which each mixed block STARTS (Keras instantiation order).
MIXED_CONV_START = {
    "mixed0": 5, "mixed1": 12, "mixed2": 19, "mixed3": 26,
    "mixed4": 30, "mixed5": 40, "mixed6": 50, "mixed7": 60,
    "mixed8": 70, "mixed9": 76, "mixed10": 85,
}
NUM_CONVS = 94
_MIXED_ORDER = [f"mixed{k}" for k in range(11)]


def unfreeze_conv_start(unfreeze_from: str | None) -> int:
    """First TRAINABLE conv creation-index for ``unfreeze_from_layer``
    semantics (``train_adipose_classifier_v0.py:361-367``): Keras walks
    ``base.layers`` topologically and unfreezes from the layer NAMED
    'mixedK' — the block's Concatenate output, which is created AFTER the
    block's own convs. So 'mixed7' unfreezes convs 70.. (mixed8 onward),
    not mixed7's own 60..69 (probed against the live tf_keras graph:
    tests/test_tf_oracle.py::TestFrozenBNOracle)."""
    if unfreeze_from is None:
        return NUM_CONVS
    k = _MIXED_ORDER.index(unfreeze_from)
    if k + 1 < len(_MIXED_ORDER):
        return MIXED_CONV_START[_MIXED_ORDER[k + 1]]
    return NUM_CONVS


class InceptionV3Classifier(nn.Module):
    """InceptionV3 → GAP → Dropout(0.4) → Dense(1, sigmoid)
    (``train_adipose_classifier_v0.py:312-319``). Returns (B,) probabilities."""

    dropout_rate: float = 0.4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_below: int = 0):
        # frozen_below: conv index below which BNs run in inference mode even
        # under train=True (Keras trainable=False BN semantics) — NUM_CONVS in
        # phase 1, MIXED_CONV_START[unfreeze_from] in phase 2. Dropout is NOT
        # special-cased (Keras Dropout still drops under fit regardless of
        # trainable).
        feats = InceptionV3(dtype=self.dtype, name="backbone")(
            x, train, frozen_below=frozen_below)
        pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        pooled = nn.Dropout(self.dropout_rate, deterministic=not train)(pooled)
        logit = nn.Dense(1, name="adipose_score")(pooled)
        return jax.nn.sigmoid(logit)[..., 0]


def preprocess_tiles(gray_batch: jax.Array) -> jax.Array:
    """Grayscale tile batch (B, H, W) in [0,255] → Inception input (B, 299, 299, 3).

    Mirrors the reference's tf.data graph stage
    (``train_adipose_classifier_v0.py:286-297``): expand channel → bilinear
    resize to 299² → tile to 3 channels → ``preprocess_input`` (x/127.5 − 1).
    """
    x = gray_batch.astype(jnp.float32)[..., None]
    b = x.shape[0]
    x = jax.image.resize(x, (b, 299, 299, 1), method="bilinear")
    x = jnp.tile(x, (1, 1, 1, 3))
    return x / 127.5 - 1.0


def frozen_conv_boundary(unfreeze_from: str | None) -> int:
    """Conv index below which backbone BNs run inference-mode during training
    (the ``frozen_below`` call arg): the whole backbone when fully frozen
    (phase 1), every conv before the first trainable one in phase 2
    (``train_adipose_classifier_v0.py:479-503``)."""
    return unfreeze_conv_start(unfreeze_from)


def backbone_param_mask(params, unfreeze_from: str | None = "mixed7"):
    """Trainability mask for two-phase classifier training.

    Phase 1 (``unfreeze_from=None``): whole backbone frozen, head trains
    (``freeze_backbone``, :357-359). Phase 2: convs from the layer NAMED
    ``unfreeze_from`` onward train (``unfreeze_from_layer``, :362-367) —
    see ``unfreeze_conv_start`` for the exact Keras topological boundary.
    """
    import flax

    start = unfreeze_conv_start(unfreeze_from)
    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        if path[0] != "backbone":
            mask[path] = True  # head always trains
            continue
        if unfreeze_from is None:
            mask[path] = False
            continue
        cbn_seg = next((s for s in path if s.startswith("cbn_")), None)
        idx = int(cbn_seg.split("_")[1]) if cbn_seg else NUM_CONVS
        mask[path] = idx >= start
    return flax.traverse_util.unflatten_dict(mask)
