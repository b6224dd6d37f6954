"""Test-time augmentation — one batched device program per tile.

Behavioral spec: ``TestTimeAugmentation``
(``full_evaluation_enhanced.py:522-600``): modes minimal (identity+fliplr),
basic (+flipud, rot90), full (8-member D4); predictions are de-augmented and
averaged. Classifier TTA uses the same 8 transform ids in logit space
(``Classification/eval_adipose_classifier.py:98-102,311-336``).

TPU-native: instead of N sequential ``model.predict`` calls, the N views are
stacked into ONE batch (N·B images) and pushed through a single jitted forward
— MXU utilization scales with the TTA factor instead of dying on tiny batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from adipose_tpu.core.jitopts import infer_jit
from adipose_tpu.ops.d4 import (CLASSIFIER_MODE_IDS, MODE_IDS, apply_transform,
                                invert_transform)


def make_tta_predict(predict_fn, mode: str = "basic"):
    """Wrap ``predict_fn(params, images(B,H,W)) -> (B,H,W)`` with batched TTA.

    Returns ``tta_predict(params, images) -> (B, H, W)`` averaged over the
    mode's de-augmented views.
    """
    ids = MODE_IDS[mode if mode in MODE_IDS else "basic"]
    ids_arr = jnp.asarray(ids, jnp.int32)
    n = len(ids)

    @infer_jit
    def tta_predict(params, images):
        b, h, w = images.shape

        # (n, B, H, W): all views of all images
        def view(tid):
            return jax.vmap(lambda im: apply_transform(im, tid))(images)

        views = jax.vmap(view)(ids_arr)
        flat = views.reshape(n * b, h, w)
        preds = predict_fn(params, flat).reshape(n, b, h, w)

        def deaug(pred_views, tid):
            return jax.vmap(lambda p: invert_transform(p, tid))(pred_views)

        deauged = jax.vmap(deaug)(preds, ids_arr)
        return jnp.mean(deauged, axis=0)

    return tta_predict


def make_classifier_tta_predict(predict_fn, mode: str = "full", logit_space: bool = True):
    """Classifier TTA: average over D4 views of the input tile.

    The reference ensembles snapshot predictions in logit space
    (``eval_adipose_classifier.py:324-336``); per-view averaging here follows
    the same convention when ``logit_space`` is set. Modes are the classifier
    ones — 'basic' four rotations, 'full' all eight D4 members
    (``classification_inference.py:323-348``).
    """
    ids = CLASSIFIER_MODE_IDS.get(mode, CLASSIFIER_MODE_IDS["full"])
    ids_arr = jnp.asarray(ids, jnp.int32)
    n = len(ids)

    @infer_jit
    def tta_predict(variables, images):
        b = images.shape[0]

        def view(tid):
            return jax.vmap(lambda im: apply_transform(im, tid))(images)

        views = jax.vmap(view)(ids_arr)  # (n, B, H, W) or (n, B, H, W, C)
        flat = views.reshape((n * b,) + images.shape[1:])
        probs = predict_fn(variables, flat).reshape(n, b)
        if logit_space:
            p = jnp.clip(probs, 1e-7, 1 - 1e-7)
            logits = jnp.log(p / (1 - p))
            return jax.nn.sigmoid(jnp.mean(logits, axis=0))
        return jnp.mean(probs, axis=0)

    return tta_predict
