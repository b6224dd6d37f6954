"""Shared helpers for TF-oracle parity: load the reference models under
tf_keras, fill both frameworks' weights from one seeded numpy stream.

The weight streams are the contract between ``scripts/gen_tf_goldens.py``
(which runs the REFERENCE implementation to produce ``tests/golden_tf_oracle
.npz``) and the fixture tests (which rebuild the same weights on the Flax
side without TF). Draw order is fixed: U-Net follows the reference conv
instantiation order (``tf_import.UNET_GENERIC_CONV_ORDER[_DS]``), InceptionV3
follows conv creation order (= our ``cbn_<i>`` indices).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

from adipose_tpu.models.tf_import import (
    UNET_GENERIC_CONV_ORDER,
    UNET_GENERIC_CONV_ORDER_DS,
)

_REF = "/root/reference"


def setup_tf_env():
    """Environment for importing the reference scripts under tf_keras."""
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def load_reference_unet_module():
    """Import the reference's train_adipose_unet_v3.py (tifffile stubbed).

    Pre-registers the tf_keras-rewritten ``src.utils.model`` (see
    ``load_reference_model_utils``) so the trainer's ``dice_coef`` metric —
    which does ``from keras import backend as K`` — binds the Keras-2 API it
    was written for even when Keras 3 owns the ``keras`` name; otherwise
    ``model.compile(metrics=[dice_coef])`` dies at fit time on
    ``K.flatten``."""
    setup_tf_env()
    if "tifffile" not in sys.modules:
        sys.modules["tifffile"] = types.ModuleType("tifffile")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    if "src.utils.model" not in sys.modules:
        import src.utils  # noqa: F401 — parent packages must exist first

        sys.modules["src.utils.model"] = load_reference_model_utils()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_train_adipose_unet_v3",
        f"{_REF}/Segmentation/train_adipose_unet_v3.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_classifier_module():
    """Import the reference's train_adipose_classifier_v0.py — source of the
    freeze_backbone / unfreeze_from_layer functions the frozen-BN oracle
    drives (train_adipose_classifier_v0.py:356-367)."""
    setup_tf_env()
    if "tifffile" not in sys.modules:
        sys.modules["tifffile"] = types.ModuleType("tifffile")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_train_adipose_classifier_v0",
        f"{_REF}/Classification/train_adipose_classifier_v0.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_ref_unet_at_size(ref_mod, tmp_path, size: int, init_nb: int = 4,
                           dropout_rate: float = 0.3):
    """Build the reference's OWN ``AdiposeUNetV3.build_model`` graph (plain,
    non-DS) at a smaller tile size: its Input/Reshape hardcode 1024
    (train_adipose_unet_v3.py:664-665); everything else in the plain layer
    stack is shape-agnostic. The module globals are patched for the duration
    of the build only — the layers themselves are the reference's. Deep
    supervision is NOT supported: its aux ``tf.image.resize([1024,1024])``
    Lambdas (:717-726) are re-traced by Keras at fit time, outside any
    build-scoped patch — build DS models at the native 1024.
    Returns (trainer_instance, net)."""
    import os

    orig_input, orig_reshape = ref_mod.Input, ref_mod.Reshape
    ref_mod.Input = lambda shape=None, **kw: orig_input(shape=(size, size), **kw)
    ref_mod.Reshape = lambda target, **kw: orig_reshape((size, size, 1), **kw)
    cwd = os.getcwd()
    os.chdir(tmp_path)  # constructor mkdirs checkpoints/ under CWD
    try:
        m = ref_mod.AdiposeUNetV3(checkpoint_name="tmp",
                                  use_deep_supervision=False,
                                  build_timestamp="20260101_000000")
        net = m.build_model(init_nb=init_nb, dropout_rate=dropout_rate)
        return m, net
    finally:
        os.chdir(cwd)
        ref_mod.Input, ref_mod.Reshape = orig_input, orig_reshape


def keras_grads_by_layer(net, loss_value_fn, x, y):
    """∂(scalar loss)/∂θ of the reference net via GradientTape, keyed by
    ``(layer_name, 'kernel'|'bias')``."""
    import tensorflow as tf

    with tf.GradientTape() as tape:
        pred = net(x, training=True)
        loss = loss_value_fn(y, pred)
    grads = tape.gradient(loss, net.trainable_variables)
    out = {}
    for var, g in zip(net.trainable_variables, grads):
        name = var.name.split(":")[0]          # e.g. down1_conv1/kernel
        layer, leaf = name.split("/")[-2:]
        out[(layer, leaf)] = np.asarray(g)
    return float(loss), out


def flax_unet_grads_by_layer(grads_tree) -> dict:
    """Flatten a flax U-Net grad tree to the same keys as
    ``keras_grads_by_layer`` (reference layer names appear in the path)."""
    import flax

    flat = flax.traverse_util.flatten_dict(grads_tree)
    out = {}
    for path, g in flat.items():
        out[(path[-2], path[-1])] = np.asarray(g)
    return out


def load_reference_model_utils():
    """Import the reference's src/utils/model.py (loss/metric oracles).

    The module does ``from keras...``, which in this env can resolve to
    Keras 3 (no ``K.flatten``/``K.pool2d``) if anything imported keras first;
    rewrite those imports to ``tf_keras`` (the Keras-2 API the reference was
    written for) before executing — no other source change.
    """
    setup_tf_env()
    import tf_keras  # noqa: F401 — ensure available before exec

    src = open(f"{_REF}/src/utils/model.py").read()
    src = src.replace("from keras.", "from tf_keras.")
    src = src.replace("from keras ", "from tf_keras ")
    mod = types.ModuleType("ref_model_utils")
    exec(compile(src, f"{_REF}/src/utils/model.py", "exec"), mod.__dict__)
    return mod


# --------------------------------------------------------------------------
# Seeded weight streams
# --------------------------------------------------------------------------

def unet_kernel_shapes(init_nb: int, ds: bool) -> dict:
    """Reference U-Net conv kernel shapes by layer name
    (train_adipose_unet_v3.py:668-746)."""
    nb = init_nb
    shapes = {
        "down1_conv1": (3, 3, 1, nb), "down1_conv2": (3, 3, nb, nb),
        "down2_conv1": (3, 3, nb, 2 * nb), "down2_conv2": (3, 3, 2 * nb, 2 * nb),
        "down3_conv1": (3, 3, 2 * nb, 4 * nb), "down3_conv2": (3, 3, 4 * nb, 4 * nb),
        "dilate1": (3, 3, 4 * nb, 8 * nb),
        **{f"dilate{i}": (3, 3, 8 * nb, 8 * nb) for i in range(2, 7)},
        "up3_conv1": (3, 3, 8 * nb, 4 * nb), "up3_conv2": (3, 3, 8 * nb, 4 * nb),
        "up3_conv3": (3, 3, 4 * nb, 4 * nb),
        "up2_conv1": (3, 3, 4 * nb, 2 * nb), "up2_conv2": (3, 3, 4 * nb, 2 * nb),
        "up2_conv3": (3, 3, 2 * nb, 2 * nb),
        "up1_conv1": (3, 3, 2 * nb, nb), "up1_conv2": (3, 3, 2 * nb, nb),
        "up1_conv3": (3, 3, nb, nb),
        "output_softmax": (1, 1, nb, 2),
    }
    if ds:
        shapes["aux_out1"] = (1, 1, 4 * nb, 1)
        shapes["aux_out2"] = (1, 1, 2 * nb, 1)
    return shapes


def seeded_unet_weights(init_nb: int, ds: bool, seed: int = 123) -> dict:
    """{layer: (kernel, bias)} — He-scaled so activations stay sane through
    22+ relu convs (N(0,1) kernels overflow by the bottleneck)."""
    rs = np.random.RandomState(seed)
    shapes = unet_kernel_shapes(init_nb, ds)
    order = UNET_GENERIC_CONV_ORDER_DS if ds else UNET_GENERIC_CONV_ORDER
    out = {}
    for name in order:
        kshape = shapes[name]
        fan_in = kshape[0] * kshape[1] * kshape[2]
        # round to f32 LAST: these exact arrays go to both frameworks, and a
        # float64 remnant would round differently through the H5 file
        k = (rs.standard_normal(kshape) * np.sqrt(2.0 / fan_in)).astype(np.float32)
        b = (rs.standard_normal((kshape[3],)) * 0.05).astype(np.float32)
        out[name] = (k, b)
    return out


def fill_keras_unet(net, weights: dict):
    for name, (k, b) in weights.items():
        net.get_layer(name).set_weights([k, b])


def fill_flax_unet(variables: dict, weights: dict) -> dict:
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    new = dict(flat)
    for path in flat:
        layer = next((s for s in path if s in weights), None)
        if layer is None:
            continue
        k, b = weights[layer]
        arr = k if path[-1] == "kernel" else b
        assert tuple(arr.shape) == tuple(np.shape(flat[path])), (path, arr.shape)
        new[path] = arr
    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(new)
    return out


def seeded_inception_weights(seed: int = 321) -> dict:
    """Weight stream for the InceptionV3 classifier, keyed by creation index.

    Returns {"convs": [(kernel, beta, mean, var), ...×94],
             "head": (kernel, bias)}. BN stats are randomized too so a
    mis-paired conv↔BN mapping cannot hide behind identity-init stats.
    """
    import jax
    import jax.numpy as jnp

    from adipose_tpu.models.inception import InceptionV3Classifier

    # read the canonical shapes off the flax model (== Keras creation order,
    # verified by scripts/gen_tf_manifests.py)
    model = InceptionV3Classifier(dtype=jnp.float32)
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    )
    p = v["params"]["backbone"]
    rs = np.random.RandomState(seed)
    convs = []
    i = 0
    while f"cbn_{i}" in p:
        kshape = tuple(p[f"cbn_{i}"]["conv"]["kernel"].shape)
        fan_in = kshape[0] * kshape[1] * kshape[2]
        # f32 rounding LAST (same arrays feed both frameworks; see
        # seeded_unet_weights)
        k = (rs.standard_normal(kshape) * np.sqrt(2.0 / fan_in)).astype(np.float32)
        c = kshape[3]
        beta = (rs.standard_normal(c) * 0.1).astype(np.float32)
        mean = (rs.standard_normal(c) * 0.2).astype(np.float32)
        var = rs.uniform(0.5, 1.5, c).astype(np.float32)
        convs.append((k, beta, mean, var))
        i += 1
    hk = (rs.standard_normal((2048, 1)) * (2048 ** -0.5)).astype(np.float32)
    hb = np.float32([0.1])
    return {"convs": convs, "head": (hk, hb)}


def fill_keras_inception(model, weights: dict):
    """Set weights on the tf_keras classifier by creation order (layer-name
    numeric suffix — fresh-process auto names)."""
    def suffix(name, base):
        rest = name[len(base):]
        return 0 if rest == "" else int(rest.lstrip("_"))

    convs = sorted(
        (l for l in model.layers if l.__class__.__name__ == "Conv2D"),
        key=lambda l: suffix(l.name, "conv2d"),
    )
    bns = sorted(
        (l for l in model.layers if l.__class__.__name__ == "BatchNormalization"),
        key=lambda l: suffix(l.name, "batch_normalization"),
    )
    assert len(convs) == len(weights["convs"]) == len(bns)
    for conv, bn, (k, beta, mean, var) in zip(convs, bns, weights["convs"]):
        conv.set_weights([k])
        bn.set_weights([beta, mean, var])
    hk, hb = weights["head"]
    model.get_layer("adipose_score").set_weights([hk, hb])


def fill_flax_inception(variables: dict, weights: dict) -> dict:
    import flax

    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"])
    new_p, new_s = dict(params), dict(stats)
    for i, (k, beta, mean, var) in enumerate(weights["convs"]):
        scope = ("backbone", f"cbn_{i}")
        new_p[scope + ("conv", "kernel")] = k
        new_p[scope + ("bn", "bias")] = beta
        new_s[scope + ("bn", "mean")] = mean
        new_s[scope + ("bn", "var")] = var
    hk, hb = weights["head"]
    new_p[("adipose_score", "kernel")] = hk
    new_p[("adipose_score", "bias")] = hb
    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(new_p)
    out["batch_stats"] = flax.traverse_util.unflatten_dict(new_s)
    return out


def build_keras_classifier(dropout_rate: float = 0.4, return_base: bool = False):
    """The reference classifier graph (train_adipose_classifier_v0.py:312-319)
    built directly under tf_keras (weights=None — DNS-blocked env).
    ``return_base=True`` additionally returns the InceptionV3 base model —
    the object the reference's freeze/unfreeze functions operate on."""
    setup_tf_env()
    from tf_keras import Model
    from tf_keras.applications.inception_v3 import InceptionV3
    from tf_keras.layers import Dense, Dropout, GlobalAveragePooling2D

    base = InceptionV3(include_top=False, weights=None, input_shape=(299, 299, 3))
    x = base.output
    x = GlobalAveragePooling2D()(x)
    x = Dropout(dropout_rate)(x)
    out = Dense(1, activation="sigmoid", name="adipose_score")(x)
    model = Model(inputs=base.input, outputs=out)
    return (model, base) if return_base else model
