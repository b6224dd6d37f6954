#!/usr/bin/env python
"""Generate tests/golden_tf_oracle.npz — REFERENCE-computed expectations.

Runs the real reference implementation under tf_keras (model forwards with
seeded weights from tests/tf_oracle_util.py's streams, loss/metric formulas
from src/utils/model.py and train_adipose_unet_v3.py) and stores its outputs.
The TF-less fixture tests (tests/test_golden.py::TestTFOracleGoldens) rebuild
the same weights on the Flax side and compare — so day-one parity stays
pinned even if TF leaves the environment. Unlike tests/golden_unet.npz (which
guards against refactor drift using the repo's own outputs), every expectation
in THIS file was produced by the reference implementation.

U-Net outputs are stored on a ::16 subsample grid (64×64 per head) plus
full-map mean/max — small enough to commit, dense enough that any weight
mis-mapping or architecture drift shows up.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tf_oracle_util import (  # noqa: E402
    build_keras_classifier,
    fill_keras_inception,
    fill_keras_unet,
    load_reference_model_utils,
    load_reference_unet_module,
    seeded_inception_weights,
    seeded_unet_weights,
)

INIT_NB = 8
UNET_SEED = {False: 123, True: 124}
INPUT_SEED = 7
CLS_SEED = 321
CLS_INPUT_SEED = 11
MASK_SEED = 99
SUB = 16  # output subsample stride


def unet_golden(out: dict):
    ref = load_reference_unet_module()
    for ds in (False, True):
        with tempfile.TemporaryDirectory() as td:
            cwd = os.getcwd()
            os.chdir(td)
            try:
                m = ref.AdiposeUNetV3(checkpoint_name="gold", use_deep_supervision=ds,
                                      build_timestamp="20260101_000000")
                net = m.build_model(init_nb=INIT_NB)
            finally:
                os.chdir(cwd)
        fill_keras_unet(net, seeded_unet_weights(INIT_NB, ds, seed=UNET_SEED[ds]))
        rs = np.random.RandomState(INPUT_SEED)
        x = rs.standard_normal((1, 1024, 1024)).astype(np.float32)
        y = net(x, training=False)
        heads = ({k: np.asarray(v) for k, v in y.items()} if ds
                 else {"main_out": np.asarray(y)})
        tag = "unet_ds" if ds else "unet"
        for k, v in heads.items():
            out[f"{tag}/{k}/sub"] = v[:, ::SUB, ::SUB]
            out[f"{tag}/{k}/mean"] = np.float32(v.mean())
            out[f"{tag}/{k}/max"] = np.float32(v.max())
        print(f"{tag}: heads={sorted(heads)}")


def inception_golden(out: dict):
    model = build_keras_classifier()
    fill_keras_inception(model, seeded_inception_weights(CLS_SEED))
    rs = np.random.RandomState(CLS_INPUT_SEED)
    x = rs.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    out["inception/probs"] = np.asarray(model(x, training=False))[:, 0]
    print("inception probs:", out["inception/probs"])


def loss_golden(out: dict):
    ref_m = load_reference_model_utils()
    ref_u = load_reference_unet_module()
    import tensorflow as tf

    rs = np.random.RandomState(MASK_SEED)
    y_true = (rs.rand(2, 96, 96) > 0.6).astype(np.float32)
    y_pred = rs.rand(2, 96, 96).astype(np.float32)
    out["losses/y_true"] = y_true
    out["losses/y_pred"] = y_pred
    for name in ("dice_coef", "dice_coef_loss", "jaccard_coef", "jaccard_coef_int"):
        out[f"losses/{name}"] = np.float32(getattr(ref_m, name)(y_true, y_pred))
    yt2 = np.stack([1 - y_true, y_true], -1)
    yp2 = np.stack([1 - y_pred, y_pred], -1)
    for name in ("precision_onehot", "recall_onehot", "fmeasure_onehot"):
        out[f"losses/{name}"] = np.float32(
            getattr(ref_m, name)(tf.constant(yt2), tf.constant(yp2)))
    for name in ("weighted_bce_dice_loss", "weighted_dice_loss"):
        out[f"losses/{name}"] = np.float32(
            getattr(ref_m, name)(y_true[0][..., None], y_pred[0][..., None]))
    out["losses/combined_loss_standard"] = np.float32(
        tf.reduce_mean(ref_u.combined_loss_standard(y_true, y_pred)))
    out["losses/combined_loss_with_label_smoothing"] = np.float32(
        tf.reduce_mean(ref_u.combined_loss_with_label_smoothing(y_true, y_pred)))
    out["losses/ohem_loss"] = np.float32(tf.reduce_mean(
        ref_u.online_hard_example_mining_loss(y_true, y_pred, keep_ratio=0.7)))
    out["losses/ohem_loss_with_smoothing"] = np.float32(tf.reduce_mean(
        ref_u.online_hard_example_mining_loss_with_smoothing(y_true, y_pred, 0.7)))
    print("losses:", {k.split("/")[1]: float(v) for k, v in out.items()
                      if k.startswith("losses/") and v.ndim == 0})


def main():
    out = {}
    unet_golden(out)
    inception_golden(out)
    loss_golden(out)
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden_tf_oracle.npz")
    np.savez_compressed(path, **out)
    print("wrote", os.path.abspath(path), os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
