"""Deployment export — the TPU-native analog of the reference's ONNX exporters.

The reference ships ``export_{segmentation,classification}_to_onnx.py``
(tf2onnx, opset 17) so models run under onnxruntime. The JAX-native deployment
format is ``jax.export`` StableHLO: a hermetic serialized program with fixed
input shapes that any XLA runtime (TPU/CPU/GPU) can load and execute without
Python model code. The export bundle is a directory:

    <out>/
      model.stablehlo      serialized jax.export artifact
      params/              orbax checkpoint of the parameters
      manifest.json        shapes, dtypes, normalization stats, model type

ONNX proper would need tf2onnx/onnx (not in this environment); the manifest
records enough to regenerate an ONNX graph offline if required.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def export_model(
    weights: str | Path,
    model_type: str,
    output: str | Path,
    batch_size: int = 1,
    tile_size: int = 1024,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> Path:
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from adipose_tpu.train import checkpoint as ckpt

    weights_path = ckpt.resolve_weights_path(weights)
    out = Path(output)
    out.mkdir(parents=True, exist_ok=True)

    if model_type == "unet":
        from adipose_tpu.models.unet import DilatedUNet
        from adipose_tpu.train.state import make_unet_predict

        ckpt_dir = weights_path.parent
        try:
            mean, std = ckpt.load_normalization_stats(ckpt_dir)
        except FileNotFoundError:
            mean, std = 200.99, 25.26
        mcfg = ckpt.detect_model_config(ckpt_dir)
        model = DilatedUNet(
            init_nb=mcfg.init_nb,
            use_deep_supervision=mcfg.use_deep_supervision,
            dilation_rates=tuple(mcfg.dilation_rates),
            compute_dtype=jnp.bfloat16,
        )
        params = ckpt.load_params(weights_path)
        base = make_unet_predict(model)

        def fn(params, tiles):
            # raw grayscale in [0,255] → probabilities; normalization baked in
            return base(params, (tiles - mean) / (std + 1e-10))

        example = (params, jnp.zeros((batch_size, tile_size, tile_size), jnp.float32))
        in_desc = {"input": f"float32[{batch_size},{tile_size},{tile_size}] gray 0-255"}
        extra = {"normalization": {"mean": mean, "std": std}}
    elif model_type == "classifier":
        from adipose_tpu.models.inception import InceptionV3Classifier

        model = InceptionV3Classifier(dtype=jnp.bfloat16)
        variables = ckpt.load_params(weights_path)

        def fn(variables, images):
            return model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                images, train=False,
            )

        params = variables
        example = (params, jnp.zeros((batch_size, 299, 299, 3), jnp.float32))
        in_desc = {"input": f"float32[{batch_size},299,299,3] inception-preprocessed"}
        extra = {}
    else:
        raise ValueError(f"unknown model type: {model_type}")

    # multi-platform lowering: the bundle runs on any of `platforms` (the
    # ONNX-portability analog — one artifact serves TPU deployment and CPU
    # smoke tests alike)
    exported = jex.export(jax.jit(fn), platforms=list(platforms))(*jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "shape") else jax.ShapeDtypeStruct(x.shape, x.dtype),
        example,
    ))
    (out / "model.stablehlo").write_bytes(exported.serialize())
    ckpt.save_params(out, "params", params)
    manifest = {
        "model_type": model_type,
        "inputs": in_desc,
        "batch_size": batch_size,
        "tile_size": tile_size,
        "format": "jax.export stablehlo",
        "platforms": list(platforms),
        **extra,
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out


def load_exported(bundle: str | Path):
    """Load a bundle → (callable(params, input), params, manifest)."""
    from jax import export as jex

    from adipose_tpu.train import checkpoint as ckpt

    bundle = Path(bundle)
    exported = jex.deserialize((bundle / "model.stablehlo").read_bytes())
    params = ckpt.load_params(bundle / "params")
    manifest = json.loads((bundle / "manifest.json").read_text())
    return exported.call, params, manifest
