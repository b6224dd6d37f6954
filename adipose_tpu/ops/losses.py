"""Segmentation losses — pure jnp, golden-matched to the reference formulas.

Reference sources (behavioral spec only):
  * ``src/utils/model.py:8-153`` — jaccard/dice coefficients, one-hot P/R/F1,
    border-weighted BCE+Dice.
  * ``Segmentation/train_adipose_unet_v3.py:218-360`` — dice_loss,
    combined_loss_standard, asymmetric label smoothing, OHEM top-k.

Conventions: masks/probabilities are float arrays with batch-leading layout
``(B, H, W)`` (or any shape — losses flatten). Probabilities are post-softmax /
post-sigmoid values in [0, 1], exactly as the Keras losses received them.

Keras reduction semantics are folded in: ``keras.losses.binary_crossentropy``
reduces over the **last axis**, and Keras then means the remaining axes. For a
``(B, H, W)`` mask this means BCE is effectively the mean over all pixels, but
OHEM's "per-pixel" top-k in the reference actually ranks per-*row* means (shape
``(B, H)`` after the last-axis reduction — ``train_adipose_unet_v3.py:296-310``).
Both behaviors are provided: ``granularity='row'`` is reference-faithful,
``granularity='pixel'`` is the true per-pixel OHEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # K.epsilon()


# ---- Coefficients (src/utils/model.py) -------------------------------------


def dice_coef(y_true: jax.Array, y_pred: jax.Array, smooth: float = 1.0) -> jax.Array:
    """Global soft Dice with smooth=1.0 (``src/utils/model.py:93-98``)."""
    yt = y_true.reshape(-1).astype(jnp.float32)
    yp = y_pred.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(yt * yp)
    return (2.0 * intersection + smooth) / (jnp.sum(yt) + jnp.sum(yp) + smooth)


def dice_coef_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """``-dice_coef`` (``src/utils/model.py:100-101``)."""
    return -1.0 * dice_coef(y_true, y_pred)


def jaccard_coef(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Soft Jaccard reduced over (batch, H, W) axes (``src/utils/model.py:8-12``)."""
    yt = y_true.astype(jnp.float32)
    yp = y_pred.astype(jnp.float32)
    axes = (0, yt.ndim - 1, yt.ndim - 2)
    intersection = jnp.sum(yt * yp, axis=axes)
    union_sum = jnp.sum(yt + yp, axis=axes)
    jac = (intersection + EPSILON) / (union_sum - intersection + EPSILON)
    return jnp.mean(jac)


def jaccard_coef_int(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Jaccard with rounded predictions (``src/utils/model.py:14-19``).

    Note the reference keeps the *soft* sum in the denominator — reproduced.
    """
    yt = y_true.astype(jnp.float32)
    yp = y_pred.astype(jnp.float32)
    yp_pos = jnp.round(jnp.clip(yp, 0.0, 1.0))
    axes = (0, yt.ndim - 1, yt.ndim - 2)
    intersection = jnp.sum(yt * yp_pos, axis=axes)
    union_sum = jnp.sum(yt + yp, axis=axes)
    jac = (intersection + EPSILON) / (union_sum - intersection + EPSILON)
    return jnp.mean(jac)


# ---- Core losses (train_adipose_unet_v3.py) --------------------------------


def dice_loss(y_true: jax.Array, y_pred: jax.Array, smooth: float = 1.0) -> jax.Array:
    """1 - soft Dice on clipped probs (``train_adipose_unet_v3.py:218-227``)."""
    yp = jnp.clip(y_pred.astype(jnp.float32), EPSILON, 1.0 - EPSILON)
    yt = y_true.reshape(-1).astype(jnp.float32)
    yp = yp.reshape(-1)
    intersection = jnp.sum(yt * yp)
    score = (2.0 * intersection + smooth) / (jnp.sum(yt) + jnp.sum(yp) + smooth)
    return 1.0 - score


def binary_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Elementwise BCE on probabilities, clipped like Keras."""
    yt = y_true.astype(jnp.float32)
    yp = jnp.clip(y_pred.astype(jnp.float32), EPSILON, 1.0 - EPSILON)
    return -(yt * jnp.log(yp) + (1.0 - yt) * jnp.log(1.0 - yp))


def combined_loss_standard(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """mean BCE + Dice loss (``train_adipose_unet_v3.py:229-241``)."""
    return jnp.mean(binary_crossentropy(y_true, y_pred)) + dice_loss(y_true, y_pred)


def smooth_labels(
    y_true: jax.Array, epsilon_pos: float = 0.03, epsilon_neg: float = 0.07
) -> jax.Array:
    """Asymmetric label smoothing: 1→1-εp-εn, 0→εn
    (``train_adipose_unet_v3.py:273-275``)."""
    yt = y_true.astype(jnp.float32)
    return yt * (1.0 - epsilon_pos - epsilon_neg) + epsilon_neg


def combined_loss_with_label_smoothing(
    y_true: jax.Array,
    y_pred: jax.Array,
    epsilon_pos: float = 0.03,
    epsilon_neg: float = 0.07,
) -> jax.Array:
    """BCE + Dice on asymmetrically smoothed labels
    (``train_adipose_unet_v3.py:244-280``)."""
    y_smooth = smooth_labels(y_true, epsilon_pos, epsilon_neg)
    return combined_loss_standard(y_smooth, y_pred)


@partial(jax.jit, static_argnames=("keep_ratio", "granularity"))
def ohem_loss(
    y_true: jax.Array,
    y_pred: jax.Array,
    keep_ratio: float = 0.7,
    granularity: str = "row",
) -> jax.Array:
    """Online hard example mining: top-k hardest BCE + global Dice
    (``train_adipose_unet_v3.py:282-318``).

    granularity='row' reproduces the reference exactly (Keras BCE means over the
    last axis before ranking, so the top-k runs over per-row losses);
    'pixel' ranks true per-pixel BCE — strictly harder mining.
    """
    yt = y_true.astype(jnp.float32)
    per_pixel = binary_crossentropy(yt, y_pred)
    if granularity == "row":
        ranked = jnp.mean(per_pixel, axis=-1)  # Keras last-axis reduction
    elif granularity == "pixel":
        ranked = per_pixel
    else:
        raise ValueError(f"granularity must be 'row' or 'pixel', got {granularity}")
    batch = ranked.shape[0]
    flat = ranked.reshape(batch, -1)
    k = max(1, int(flat.shape[1] * keep_ratio))
    top_k, _ = jax.lax.top_k(flat, k)
    hard_bce = jnp.mean(top_k)
    return hard_bce + dice_loss(yt, y_pred)


def ohem_loss_with_smoothing(
    y_true: jax.Array,
    y_pred: jax.Array,
    keep_ratio: float = 0.7,
    epsilon_pos: float = 0.03,
    epsilon_neg: float = 0.07,
    granularity: str = "row",
) -> jax.Array:
    """OHEM on smoothed labels (``train_adipose_unet_v3.py:320-360``)."""
    y_smooth = smooth_labels(y_true, epsilon_pos, epsilon_neg)
    return ohem_loss(y_smooth, y_pred, keep_ratio=keep_ratio, granularity=granularity)


# ---- Border-weighted losses (src/utils/model.py:103-153) --------------------


def _border_weight(y_true: jax.Array, kernel_size: int = 21) -> jax.Array:
    """Average-pool border detection → weight map with mean preserved.

    ``src/utils/model.py:106-116``: 21×21 same-padded avg pool of the mask;
    pixels whose local average is in (0.005, 0.995) are border; border weight is
    tripled then the whole map is rescaled so its sum matches the uniform map.
    """
    yt = y_true.astype(jnp.float32)
    squeeze_batch = False
    if yt.ndim == 2:
        yt = yt[None]
        squeeze_batch = True
    x = yt[..., None]  # (B, H, W, 1)
    window = (1, kernel_size, kernel_size, 1)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, window, (1, 1, 1, 1), "SAME"
    )
    averaged = summed / counts
    border = ((averaged > 0.005) & (averaged < 0.995)).astype(jnp.float32)
    weight = jnp.ones_like(averaged)
    w0 = jnp.sum(weight)
    weight = weight + border * 2.0
    w1 = jnp.sum(weight)
    weight = weight * (w0 / w1)
    weight = weight[..., 0]
    if squeeze_batch:
        weight = weight[0]
    return weight


def weighted_dice_coeff(
    y_true: jax.Array, y_pred: jax.Array, weight: jax.Array, smooth: float = 1.0
) -> jax.Array:
    """(``src/utils/model.py:120-125``) — note weight enters squared."""
    w = weight.astype(jnp.float32) ** 2
    m1 = y_true.astype(jnp.float32)
    m2 = y_pred.astype(jnp.float32)
    intersection = m1 * m2
    return (2.0 * jnp.sum(w * intersection) + smooth) / (
        jnp.sum(w * m1) + jnp.sum(w * m2) + smooth
    )


def weighted_dice_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """(``src/utils/model.py:103-118``)."""
    weight = _border_weight(y_true)
    return 1.0 - weighted_dice_coeff(y_true, y_pred, weight)


def weighted_bce(y_true: jax.Array, y_pred: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted BCE via the numerically-stable logit form
    (``src/utils/model.py:127-136``)."""
    yt = y_true.astype(jnp.float32)
    yp = jnp.clip(y_pred.astype(jnp.float32), EPSILON, 1.0 - EPSILON)
    logit = jnp.log(yp / (1.0 - yp))
    loss = (1.0 - yt) * logit + (1.0 + (weight - 1.0) * yt) * (
        jnp.log1p(jnp.exp(-jnp.abs(logit))) + jnp.maximum(-logit, 0.0)
    )
    return jnp.sum(loss) / jnp.sum(weight)


def weighted_bce_dice_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Border-weighted BCE + border-weighted Dice (``src/utils/model.py:139-153``)."""
    weight = _border_weight(y_true)
    return weighted_bce(y_true, y_pred, weight) + (
        1.0 - weighted_dice_coeff(y_true, y_pred, weight)
    )


# ---- One-hot classification metrics (src/utils/model.py:64-91) --------------


def precision_onehot(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Argmax-based precision for one-hot outputs (``src/utils/model.py:64-73``)."""
    yt = jnp.argmax(y_true, axis=-1).astype(jnp.float32)
    yp = jnp.argmax(y_pred, axis=-1).astype(jnp.float32)
    tp = jnp.sum(jnp.round(jnp.clip(yt * yp, 0.0, 1.0)))
    predicted_pos = jnp.sum(jnp.round(jnp.clip(yp, 0.0, 1.0)))
    return tp / (predicted_pos + EPSILON)


def recall_onehot(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """(``src/utils/model.py:75-84``)."""
    yt = jnp.argmax(y_true, axis=-1).astype(jnp.float32)
    yp = jnp.argmax(y_pred, axis=-1).astype(jnp.float32)
    tp = jnp.sum(jnp.round(jnp.clip(yt * yp, 0.0, 1.0)))
    possible_pos = jnp.sum(jnp.round(jnp.clip(yt, 0.0, 1.0)))
    return tp / (possible_pos + EPSILON)


def fmeasure_onehot(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """(``src/utils/model.py:86-91``)."""
    p = precision_onehot(y_true, y_pred)
    r = recall_onehot(y_true, y_pred)
    return 2.0 * (p * r) / (p + r + EPSILON)


# ---- Classifier loss --------------------------------------------------------


def bce_with_label_smoothing(
    y_true: jax.Array, y_pred: jax.Array, label_smoothing: float = 0.1
) -> jax.Array:
    """Keras BinaryCrossentropy(label_smoothing=s): y → y(1-s) + s/2, then mean BCE
    (``Classification/train_adipose_classifier_v0.py:369-378``)."""
    yt = y_true.astype(jnp.float32) * (1.0 - label_smoothing) + 0.5 * label_smoothing
    return jnp.mean(binary_crossentropy(yt, y_pred))


# ---- Deep-supervision composite ---------------------------------------------


def deep_supervision_loss(
    y_true: jax.Array,
    outputs: dict,
    loss_fn_main,
    loss_fn_aux,
    weight_main: float = 1.0,
    weight_aux1: float = 0.4,
    weight_aux2: float = 0.3,
) -> jax.Array:
    """Weighted multi-head loss (``train_adipose_unet_v3.py:839-855``):
    same target supervises main_out / aux_out1 / aux_out2."""
    total = weight_main * loss_fn_main(y_true, outputs["main_out"])
    total = total + weight_aux1 * loss_fn_aux(y_true, outputs["aux_out1"])
    total = total + weight_aux2 * loss_fn_aux(y_true, outputs["aux_out2"])
    return total
