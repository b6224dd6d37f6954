"""Flax U-Net with summed-dilation bottleneck and optional deep supervision.

Architecture spec (defined once here; the reference duplicates it four times —
canonical copy ``Segmentation/train_adipose_unet_v3.py:660-758``):

  encoder   3 levels of [Conv3×3-ReLU ×2 → MaxPool2] at init_nb·(1,2,4) filters
  bottleneck six Conv3×3-ReLU at init_nb·8 with dilation rates 1,2,4,8,16,32,
            fed sequentially, with dropout after the first, all six SUMMED
            (:681-688) — a large effective receptive field inside one tile
  decoder   3 levels of [nearest-×2 upsample → Conv3×3 → skip-concat →
            Conv3×3 ×2 → dropout]
  head      Conv1×1 → 2-way softmax → class-1 slice (:747-752)
  aux heads (optional) Conv1×1-sigmoid at up3 (H/4) and up2 (H/2), bilinearly
            upsampled to full resolution (:712-745)

TPU-native choices:
  * NHWC layout, bf16 compute / f32 params — conv FLOPs land on the MXU at
    full rate; softmax and outputs are computed in f32.
  * `half_remat` wraps encoder/decoder stages in `nn.remat` to trade FLOPs for
    HBM at 1024² resolution when training with larger global batches.
  * Layer names mirror the reference's Keras names so the TF-H5 importer
    (:mod:`adipose_tpu.models.tf_import`) can map weights for parity testing.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Keras ``UpSampling2D`` default (nearest ×2) for NHWC."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FusedUpsampleConv(nn.Module):
    """nearest-×2 upsample + Conv3×3, computed as ONE lhs-dilated conv.

    Mathematically identical to ``conv3x3(upsample_nearest_2x(x))`` (verified
    exactly in f32 by tests/test_models.py): nearest-×2 followed by a 3×3
    kernel K equals a stride-2 transposed conv with the 4×4 kernel
    K' [a,b] = Σ_{i∈{a−1,a}, j∈{b−1,b}} K[i,j] and padding (2,2).

    Why: the two-op form materializes the 4×-size upsampled activation in HBM
    before the conv reads it back; the fused form never does — measured
    1.5–1.8× faster at every decoder scale on v5e. The parameter tree
    (``<name>/kernel``, ``<name>/bias``, shape (3,3,cin,cout)) is identical to
    ``nn.Conv``'s, so checkpoints and the TF importer are unaffected.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        k = kernel
        kp = (
            jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
            + jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
            + jnp.pad(k, ((0, 1), (1, 0), (0, 0), (0, 0)))
            + jnp.pad(k, ((1, 0), (0, 1), (0, 0), (0, 0)))
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp.astype(self.dtype),
            window_strides=(1, 1), padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


def resize_bilinear(x: jax.Array, out_hw: tuple) -> jax.Array:
    """``tf.image.resize(..., method='bilinear')`` equivalent (half-pixel
    centers, no corner alignment) for NHWC."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


class _ConvBlock(nn.Module):
    """Two Conv3×3-ReLU layers (one encoder/decoder stage)."""

    features: int
    names: tuple
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for name in self.names:
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name=name)(x)
            x = nn.relu(x)
        return x


class DilatedUNet(nn.Module):
    """Dilated-bottleneck U-Net; input (B, H, W) float32, output probabilities.

    Returns (B, H, W) class-1 probability, or a dict with ``main_out``,
    ``aux_out1``, ``aux_out2`` when ``use_deep_supervision`` is set — matching
    the reference's output contract so eval/training code is head-agnostic.
    """

    init_nb: int = 44
    dropout_rate: float = 0.3
    use_deep_supervision: bool = False
    dilation_rates: tuple = (1, 2, 4, 8, 16, 32)
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        dt = self.compute_dtype
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(dt)
        h, w = x.shape[1], x.shape[2]

        block = nn.remat(_ConvBlock) if self.remat else _ConvBlock

        # Encoder
        down1 = block(self.init_nb, ("down1_conv1", "down1_conv2"), dt)(x)
        p1 = nn.max_pool(down1, (2, 2), strides=(2, 2))
        down2 = block(self.init_nb * 2, ("down2_conv1", "down2_conv2"), dt)(p1)
        p2 = nn.max_pool(down2, (2, 2), strides=(2, 2))
        down3 = block(self.init_nb * 4, ("down3_conv1", "down3_conv2"), dt)(p2)
        p3 = nn.max_pool(down3, (2, 2), strides=(2, 2))

        # Dilated bottleneck: sequential feed, summed taps
        feats = self.init_nb * 8
        d = p3
        taps = []
        for i, rate in enumerate(self.dilation_rates):
            d = nn.Conv(
                feats,
                (3, 3),
                padding="SAME",
                kernel_dilation=(rate, rate),
                dtype=dt,
                name=f"dilate{i + 1}",
            )(d)
            d = nn.relu(d)
            if i == 0:
                d = nn.Dropout(self.dropout_rate, deterministic=not train)(d)
            taps.append(d)
        bottleneck = sum(taps)

        # Decoder
        def up_stage(feat, skip, y, names):
            y = nn.relu(FusedUpsampleConv(feat, dt, name=names[0])(y))
            # NOTE: computing this as two split convs (avoiding the concat
            # materialization) was measured SLOWER on v5e (75.2 vs 80.0
            # tiles/s) — XLA fuses concat+conv better than two MXU passes.
            y = jnp.concatenate([skip, y], axis=-1)
            y = nn.relu(nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=names[1])(y))
            y = nn.relu(nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=names[2])(y))
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            return y

        up3 = up_stage(self.init_nb * 4, down3, bottleneck,
                       ("up3_conv1", "up3_conv2", "up3_conv3"))
        up2 = up_stage(self.init_nb * 2, down2, up3,
                       ("up2_conv1", "up2_conv2", "up2_conv3"))
        up1 = up_stage(self.init_nb, down1, up2,
                       ("up1_conv1", "up1_conv2", "up1_conv3"))

        # Main head: 1×1 conv in bf16 (avoids materializing the full-res
        # 44-channel tensor in f32), softmax in f32 for numerics.
        logits = nn.Conv(2, (1, 1), dtype=dt, name="output_softmax")(up1)
        main = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]

        if not self.use_deep_supervision:
            return main

        aux1 = nn.Conv(1, (1, 1), dtype=dt, name="aux_out1")(up3)
        aux1 = resize_bilinear(jax.nn.sigmoid(aux1.astype(jnp.float32)), (h, w))[..., 0]
        aux2 = nn.Conv(1, (1, 1), dtype=dt, name="aux_out2")(up2)
        aux2 = resize_bilinear(jax.nn.sigmoid(aux2.astype(jnp.float32)), (h, w))[..., 0]
        return {"main_out": main, "aux_out1": aux1, "aux_out2": aux2}


ENCODER_LAYERS = (
    # the phase-1 frozen set (train_adipose_unet_v3.py:761-773)
    "down1_conv1", "down1_conv2",
    "down2_conv1", "down2_conv2",
    "down3_conv1", "down3_conv2",
)


def encoder_param_mask(params) -> Any:
    """Pytree mask: True for trainable leaves in phase 1 (encoder frozen).

    The reference freezes only the encoder conv layers in phase 1
    (``freeze_encoder_layers``, :760-775); everything else trains.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        frozen = any(seg in ENCODER_LAYERS for seg in path)
        mask[path] = not frozen
    return flax.traverse_util.unflatten_dict(mask)
