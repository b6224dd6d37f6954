#!/usr/bin/env python
"""Derive (and verify) the generic-layout H5 manifests in models/tf_import.py.

tf_keras ≥2.16 / Keras 3 ``.weights.h5`` files store layers under
``layers/<snake_case_class>[_<k>]/vars`` — group names are assigned by
``saving_lib._save_container_state`` walking ``model.layers`` in topological
order (NOT by ``layer.name``, NOT in instantiation order). This script builds
the real reference models under tf_keras, simulates that naming, and prints
the resulting group→layer manifests. Run with ``--check`` to assert they
match the constants hardcoded in ``adipose_tpu/models/tf_import.py``.

Refs: train_adipose_unet_v3.py:660-758 (U-Net graph),
train_adipose_classifier_v0.py:312-319 (classifier graph).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tf_oracle_util import (  # noqa: E402
    build_keras_classifier,
    load_reference_unet_module,
    setup_tf_env,
)


def simulate_save_names(model):
    """Replicate saving_lib._save_container_state naming over model.layers."""
    from tf_keras.src.utils import generic_utils

    used = {}
    out = []
    for layer in model.layers:
        name = generic_utils.to_snake_case(layer.__class__.__name__)
        if name in used:
            used[name] += 1
            name = f"{name}_{used[name]}"
        else:
            used[name] = 0
        out.append((name, layer))
    return out


def _suffix(name: str, base: str) -> int:
    rest = name[len(base):]
    return 0 if rest == "" else int(rest.lstrip("_"))


def unet_conv_order(ds: bool) -> list:
    ref = load_reference_unet_module()
    with tempfile.TemporaryDirectory() as td:
        cwd = os.getcwd()
        os.chdir(td)  # AdiposeUNetV3.__init__ mkdirs checkpoints/ under CWD
        try:
            m = ref.AdiposeUNetV3(checkpoint_name="tmp", use_deep_supervision=ds,
                                  build_timestamp="20260101_000000")
            net = m.build_model(init_nb=4)
        finally:
            os.chdir(cwd)
    order = {}
    for h5name, layer in simulate_save_names(net):
        if h5name.startswith("conv2d"):
            order[_suffix(h5name, "conv2d")] = layer.name
    return [order[k] for k in sorted(order)]


def inception_perm() -> tuple:
    """h5 ordinal k (topological) → conv creation index (= flax cbn index),
    verified identical for convs and their paired BNs."""
    setup_tf_env()
    model = build_keras_classifier()
    convs = [l for l in model.layers if l.__class__.__name__ == "Conv2D"]
    # creation order by auto-name suffix RANK (not value): in a non-fresh
    # process the uid counters are offset (conv2d_94, ...) but stay ordered
    by_creation = sorted(convs, key=lambda l: _suffix(l.name, "conv2d"))
    creation = {id(l): i for i, l in enumerate(by_creation)}
    conv_perm, bn_perm = {}, {}
    for h5name, layer in simulate_save_names(model):
        cls = layer.__class__.__name__
        if cls == "Conv2D":
            conv_perm[_suffix(h5name, "conv2d")] = creation[id(layer)]
        elif cls == "BatchNormalization":
            producer = layer.input._keras_history.layer
            assert producer.__class__.__name__ == "Conv2D"
            bn_perm[_suffix(h5name, "batch_normalization")] = creation[id(producer)]
    conv_list = [conv_perm[k] for k in sorted(conv_perm)]
    bn_list = [bn_perm[k] for k in sorted(bn_perm)]
    assert conv_list == bn_list, "conv/BN topological pairing diverged"
    return tuple(conv_list)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="assert manifests match tf_import.py constants")
    args = ap.parse_args()

    manifests = {
        "unet": unet_conv_order(False),
        "unet_ds": unet_conv_order(True),
        "inception_perm": list(inception_perm()),
    }
    print(json.dumps(manifests, indent=2))

    if args.check:
        from adipose_tpu.models import tf_import as ti

        assert tuple(manifests["unet"]) == ti.UNET_GENERIC_CONV_ORDER
        assert tuple(manifests["unet_ds"]) == ti.UNET_GENERIC_CONV_ORDER_DS
        assert tuple(manifests["inception_perm"]) == ti.INCEPTION_TOPO_PERM
        print("OK: manifests match adipose_tpu/models/tf_import.py")


if __name__ == "__main__":
    main()
