"""TF/Keras ``.weights.h5`` → Flax parameter importers.

Parity bridge (SURVEY.md §7 step 2): load weights trained by the reference's
TF2.13 scripts into the Flax models so Dice parity can be verified without
retraining. Handles:

  * **U-Net**: the reference names every conv layer (``down1_conv1`` …
    ``output_softmax``, ``aux_out1/2`` — ``train_adipose_unet_v3.py:660-758``),
    and our Flax modules reuse those names, so mapping is by name. Keras conv
    kernels are (kh, kw, cin, cout) = Flax convention → no transpose needed.
  * **InceptionV3**: Keras orders layers ``conv2d[_i]`` / ``batch_normalization
    [_i]`` by instantiation; our ``cbn_<i>`` indices follow the same
    instantiation order, so ``conv2d_{i}`` ↔ ``cbn_{i}/conv`` and
    ``batch_normalization_{i}`` ↔ ``cbn_{i}/bn`` (+ batch_stats moving
    mean/variance). The head Dense is ``adipose_score``
    (``train_adipose_classifier_v0.py:312-319``).

Supports both Keras-3 ``.weights.h5`` layouts (``_layer_checkpoint_dependencies``
/ ``layers`` trees and flat ``vars`` groups) and legacy ``model_weights``
groups, by searching for named weight datasets anywhere in the file.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _walk_datasets(h5group, prefix=""):
    import h5py

    for key, item in h5group.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(item, h5py.Dataset):
            yield path, item
        else:
            yield from _walk_datasets(item, path)


def load_h5_weight_map(h5_path: str | Path) -> dict:
    """All datasets in the file keyed by full path."""
    import h5py

    out = {}
    with h5py.File(h5_path, "r") as f:
        for path, ds in _walk_datasets(f):
            out[path] = np.asarray(ds)
    return out


def _find_layer_arrays(weight_map: dict, layer_name: str) -> list:
    """Datasets belonging to a named layer, in-file order.

    Matches any path containing ``/<layer_name>/`` or starting with it —
    covers Keras-2 ``model_weights/<name>/<name>/kernel:0`` and Keras-3
    ``layers/<name>/vars/0`` layouts.
    """
    hits = []
    pattern = re.compile(rf"(^|/){re.escape(layer_name)}(/|$)")
    for path in sorted(weight_map):
        if pattern.search(path):
            hits.append((path, weight_map[path]))
    return hits


def _kernel_and_bias(arrays: list):
    """Identify (kernel, bias) among a layer's datasets by rank/shape."""
    kernel = bias = None
    for path, arr in arrays:
        if arr.ndim >= 2:
            kernel = arr
        elif arr.ndim == 1:
            bias = arr
    return kernel, bias


def import_unet_weights(h5_path: str | Path, flax_params: dict,
                        strict: bool = False) -> dict:
    """Map a reference U-Net ``.weights.h5`` onto Flax params by layer name.

    ``flax_params`` is the model's ``{'params': ...}`` tree (or the inner
    dict); returns a new tree with matched leaves replaced. Unmatched layers
    keep their initialization (``load_pretrained_weights`` by-name semantics,
    ``train_adipose_unet_v3.py:881-916``) unless ``strict``.
    """
    import flax

    weight_map = load_h5_weight_map(h5_path)
    inner = flax_params.get("params", flax_params)
    flat = flax.traverse_util.flatten_dict(inner)

    # collect flax conv layers by their reference-visible name (last scope
    # segment that matches a reference layer name)
    by_layer: dict = {}
    for path in flat:
        for seg in path:
            if re.match(r"(down\d_conv\d|dilate\d|up\d_conv\d|output_softmax|aux_out\d)$", seg):
                by_layer.setdefault(seg, []).append(path)

    new_flat = dict(flat)
    missing = []
    for layer, paths in by_layer.items():
        arrays = _find_layer_arrays(weight_map, layer)
        if not arrays:
            missing.append(layer)
            continue
        kernel, bias = _kernel_and_bias(arrays)
        for path in paths:
            leaf = path[-1]
            cur = flat[path]
            if leaf == "kernel" and kernel is not None:
                if kernel.shape != cur.shape:
                    raise ValueError(
                        f"{layer}: kernel shape {kernel.shape} != flax {cur.shape}"
                    )
                new_flat[path] = kernel.astype(np.asarray(cur).dtype)
            elif leaf == "bias" and bias is not None:
                new_flat[path] = bias.astype(np.asarray(cur).dtype)
    if strict and missing:
        raise KeyError(f"layers not found in {h5_path}: {missing}")
    new_inner = flax.traverse_util.unflatten_dict(new_flat)
    if "params" in flax_params:
        out = dict(flax_params)
        out["params"] = new_inner
        return out
    return new_inner


def import_inception_weights(h5_path: str | Path, flax_variables: dict,
                             strict: bool = False) -> dict:
    """Map Keras InceptionV3 weights onto the Flax classifier variables.

    Conv i: ``conv2d`` (i=0) / ``conv2d_{i}`` → ``backbone/cbn_{i}/conv``;
    BN i: ``batch_normalization[_i]`` → bias→params, moving stats→batch_stats.
    Head: ``adipose_score`` Dense.
    """
    import flax

    weight_map = load_h5_weight_map(h5_path)
    params = flax.traverse_util.flatten_dict(flax_variables["params"])
    stats = flax.traverse_util.flatten_dict(flax_variables.get("batch_stats", {}))
    new_params, new_stats = dict(params), dict(stats)
    missing = []

    def keras_name(base: str, i: int) -> str:
        return base if i == 0 else f"{base}_{i}"

    n_convs = len({p[1] for p in params if p[0] == "backbone" and p[1].startswith("cbn_")})
    for i in range(n_convs):
        conv_arrays = _find_layer_arrays(weight_map, keras_name("conv2d", i))
        bn_arrays = _find_layer_arrays(weight_map, keras_name("batch_normalization", i))
        scope = ("backbone", f"cbn_{i}")
        if conv_arrays:
            kernel, _ = _kernel_and_bias(conv_arrays)
            key = scope + ("conv", "kernel")
            if key in params and kernel is not None:
                if kernel.shape != params[key].shape:
                    raise ValueError(f"cbn_{i}: {kernel.shape} != {params[key].shape}")
                new_params[key] = kernel.astype(np.asarray(params[key]).dtype)
        else:
            missing.append(f"conv2d_{i}")
        if bn_arrays:
            # Keras BN var order (scale=False): beta, moving_mean, moving_variance
            vecs = [a for _, a in bn_arrays if a.ndim == 1]
            if len(vecs) >= 3:
                beta, mean, var = vecs[0], vecs[1], vecs[2]
                bkey = scope + ("bn", "bias")
                if bkey in params:
                    new_params[bkey] = beta.astype(np.asarray(params[bkey]).dtype)
                mkey = scope + ("bn", "mean")
                vkey = scope + ("bn", "var")
                if mkey in stats:
                    new_stats[mkey] = mean.astype(np.asarray(stats[mkey]).dtype)
                if vkey in stats:
                    new_stats[vkey] = var.astype(np.asarray(stats[vkey]).dtype)
        else:
            missing.append(f"batch_normalization_{i}")

    head = _find_layer_arrays(weight_map, "adipose_score")
    if head:
        kernel, bias = _kernel_and_bias(head)
        kkey, bkey = ("adipose_score", "kernel"), ("adipose_score", "bias")
        if kernel is not None and kkey in params:
            new_params[kkey] = kernel.astype(np.asarray(params[kkey]).dtype)
        if bias is not None and bkey in params:
            new_params[bkey] = bias.astype(np.asarray(params[bkey]).dtype)

    if strict and missing:
        raise KeyError(f"layers not found: {missing[:10]}...")
    out = {"params": flax.traverse_util.unflatten_dict(new_params)}
    if stats:
        out["batch_stats"] = flax.traverse_util.unflatten_dict(new_stats)
    return out
