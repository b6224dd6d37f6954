"""adipose_tpu — TPU-native framework for dual-model adipose histology analysis.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of the
MAGIC-SCAN ``adipose_tissue-unet`` reference pipeline (TF2.13, single-GPU):
WSI chunking/tiling, Reinhard stain normalization, tile QC, a dilated-bottleneck
U-Net segmenter and an InceptionV3 tile classifier, two-phase fine-tuning with
EMA + cosine schedules, D4 test-time augmentation, sliding-window inference with
Gaussian-blended reconstruction, and publication-grade evaluation with
bootstrap confidence intervals.

Design principles (TPU-first, not a translation):
  * All hot-path compute is pure-functional jnp/Flax under ``jax.jit``.
  * Batched everything: TTA is a vmapped D4 transform, sliding-window inference is
    one device program over a tile batch, blending is an on-device scatter-add.
  * Scaling is expressed with ``jax.sharding.Mesh`` + NamedSharding, so the same
    train/eval step runs on 1 chip or a v5e-8 slice via XLA collectives over ICI.
  * Host-side work (JPEG IO, polygon rasterization) stays on host, feeding
    device-resident pipelines.

Subpackages
  core/      config, seeding (seed.csv-compatible), artifacts, registry
  ops/       losses, metrics, color/stain math, normalization, QC, D4 group,
             blending, FFT debanding (+ Pallas kernels for the hot ops)
  models/    Flax U-Net (dilated bottleneck, optional deep supervision),
             Flax InceptionV3 + classification head
  parallel/  mesh construction and sharding rules
  data/      mask rasterization, tile planning, augmentation, dataset builders,
             host→device input pipelines
  train/     optax two-phase trainers, EMA, schedules, checkpointing
  eval/      TTA, sliding-window inference, threshold optimization, metrics + CIs
  wsi/       WSI chunkers, ECM preprocessing, reconstruction, overlays
  cli/       one entry point with subcommands mirroring the reference scripts
"""

__version__ = "0.1.0"
