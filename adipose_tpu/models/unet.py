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
  * Level-1 (full-resolution) channels are zero-padded 44 → ``lane_pad`` (64)
    at apply time: 44-channel convs at 1024² hit a pathological slow path in
    the conv emitter (16.0 ms vs 13.6 ms padded, measured v5e b16) because 44
    does not divide the 128-lane register. Bit-exact; params stay (…,44).
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
from jax.ad_checkpoint import checkpoint_name

#: checkpoint_name tags carried by every full-resolution (level-1) activation
#: stash. Training at 1024² b8 fills HBM (17 GB temps) and XLA responds with
#: ~95 ms/step of layout-transpose + compression-remat copies on exactly these
#: buffers (BASELINE.md round-2 profile). Rematerializing them instead —
#: ``jax.checkpoint(apply, policy=jax.checkpoint_policies.
#: save_anything_except_these_names(*LEVEL1_CHECKPOINT_NAMES))`` — trades 5
#: level-1 convs of recompute for those copies. Tags are identity elsewhere.
LEVEL1_CHECKPOINT_NAMES = (
    "l1.down1_conv1", "l1.down1_conv2",
    "l1.up1_conv1", "l1.up1_conv2", "l1.up1_conv3", "l1.up1",
)


def level1_remat_policy():
    """Checkpoint policy: save everything except level-1 (1024²) stashes."""
    return jax.checkpoint_policies.save_anything_except_these_names(
        *LEVEL1_CHECKPOINT_NAMES)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Keras ``UpSampling2D`` default (nearest ×2) for NHWC."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def fused_upsample_kernel(k):
    """4×4 lhs-dilated kernel equivalent to nearest-×2 upsample + 3×3 conv:
    K'[a,b] = Σ_{i∈{a−1,a}, j∈{b−1,b}} K[i,j] (see FusedUpsampleConv)."""
    return (
        jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        + jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        + jnp.pad(k, ((0, 1), (1, 0), (0, 0), (0, 0)))
        + jnp.pad(k, ((1, 0), (0, 1), (0, 0), (0, 0)))
    )


def _scatter_kernel_blocks(kernel, in_blocks, cout_pad: int):
    """Zero-pad a conv kernel for MXU-lane-aligned activations.

    ``kernel`` is (kh, kw, Cin_logical, Cout). ``in_blocks`` is a tuple of
    (logical, padded) channel-block sizes describing how the input tensor's
    channels are laid out (e.g. a concat of two padded blocks); logical sizes
    must sum to Cin_logical. Kernel rows are scattered so each logical block
    lands at its padded offset; output channels are zero-padded to
    ``cout_pad``. Padding with zeros is BIT-exact: the extra products are
    exactly 0 and x+0 == x in every float format, and the tap/accumulation
    order of the real channels is unchanged.
    """
    kh, kw, cin, cout = kernel.shape
    assert sum(b[0] for b in in_blocks) == cin, (in_blocks, cin)
    rows = []
    off = 0
    for logical, padded in in_blocks:
        blk = kernel[:, :, off : off + logical, :]
        if padded > logical:
            blk = jnp.pad(blk, ((0, 0), (0, 0), (0, padded - logical), (0, 0)))
        rows.append(blk)
        off += logical
    k = jnp.concatenate(rows, axis=2) if len(rows) > 1 else rows[0]
    if cout_pad > cout:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, cout_pad - cout)))
    return k


class PadConv(nn.Module):
    """Conv3×3 computed with channels zero-padded to an MXU-friendly width.

    Measured on v5e at 1024² (B=16, bf16): a 44→44 SAME conv runs at
    16.0 ms but the same conv padded to 64→64 runs at 13.6 ms — channel
    counts that divide the 128-lane register width evenly are dramatically
    better for XLA's conv emitter at large spatial sizes, even though the
    padded form does 2.1× the nominal FLOPs (48 is WORSE: 20.6 ms).
    Zero-padding is bit-exact (see :func:`_scatter_kernel_blocks`).

    Params are identical to ``nn.Conv`` (kernel (3,3,ΣCin_logical,features),
    bias (features,)) so checkpoints and the TF importer are unaffected.
    The OUTPUT carries ``cout_pad`` channels whose tail is all-zero (exact
    zeros survive relu); consumers must use matching ``in_blocks``.
    """

    features: int
    dtype: Any = jnp.bfloat16
    in_blocks: tuple = ()  # ((logical, padded), ...); () = unpadded input
    cout_pad: int = 0      # 0 = no output padding
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self, x):
        blocks = self.in_blocks or ((x.shape[-1], x.shape[-1]),)
        cin = sum(b[0] for b in blocks)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        cout_pad = max(self.cout_pad, self.features)
        k = _scatter_kernel_blocks(kernel, blocks, cout_pad)
        b = jnp.pad(bias, (0, cout_pad - self.features)) if cout_pad > self.features else bias
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


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

    ``cout_pad`` zero-pads output channels to an MXU-lane-friendly width
    (bit-exact; see :class:`PadConv`).
    """

    features: int
    dtype: Any = jnp.bfloat16
    cout_pad: int = 0

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        k = kernel
        bias_p = bias
        cout_pad = max(self.cout_pad, self.features)
        if cout_pad > self.features:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, cout_pad - self.features)))
            bias_p = jnp.pad(bias, (0, cout_pad - self.features))
        kp = fused_upsample_kernel(k)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp.astype(self.dtype),
            window_strides=(1, 1), padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias_p.astype(self.dtype)


class DiffSigmoidHead(nn.Module):
    """2-way-softmax-class-1 head computed as ``sigmoid(logit1 - logit0)``.

    The reference head is Conv1×1→softmax(2)→slice class 1
    (``train_adipose_unet_v3.py:747-752``). Mathematically
    ``softmax([l0,l1])[1] == sigmoid(l1-l0)`` exactly, so the head only ever
    needs the DIFFERENCE of the two 1×1 kernels — one channel, not two.

    Why it exists: a 2-channel tensor at 1024² lands in a pathological
    T(2,128) TPU layout; the conv + f32 softmax chain (exp/div/reduce_max/
    reduce_sum over 16M×2 f32 elements) measured 28 ms of a 183 ms forward
    (15%). The single-channel contraction (einsum over the lane dim, f32
    accumulation) measures 7 ms isolated and fuses cleanly. f32 parity vs the
    softmax form is ~1e-7; under bf16 compute the kernel-difference rounding
    is below the bf16 noise floor already accepted model-wide.

    The param tree is IDENTICAL to the Conv1×1 head (kernel (1,1,Cin,2),
    bias (2,)) so orbax checkpoints and the TF-H5 importer are unaffected.
    ``cin`` is the logical channel count; inputs may carry zero-padded lanes
    beyond it (see :class:`PadConv`).
    """

    cin: int
    n_classes: int = 2

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.cin, self.n_classes), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.n_classes,), jnp.float32
        )
        wd = kernel[0, 0, :, 1] - kernel[0, 0, :, 0]
        if x.shape[-1] > self.cin:  # lane-padded input: pad taps with zeros
            wd = jnp.pad(wd, (0, x.shape[-1] - self.cin))
        bd = bias[1] - bias[0]
        # NOTE: a Pallas replacement for this einsum was tried and REVERTED
        # (ops/pallas/unet_kernels.py): the custom call's default-layout
        # operand constraint forces a 2.1 GB relayout of the conv output
        # ({3,0,2,1} -> {3,2,1,0}) and the kernel's lane-dim reduction runs
        # on the VPU at 22 ms vs einsum's 8.6 ms (v5e, b16) — 88.7 -> 55.8
        # tiles/s end-to-end. Keep the einsum.
        # HIGHEST: the env's global bf16 matmul default would truncate f32
        # activations here; for bf16 inputs HIGHEST is a no-op (MXU multiplies
        # bf16 exactly into f32 accumulators), so this costs nothing.
        logit = jnp.einsum(
            "bhwc,c->bhw", x, wd.astype(x.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.nn.sigmoid(logit + bd)


class SigmoidHead1x1(nn.Module):
    """Conv1×1(1 channel)→sigmoid aux head as a lane-dim contraction.

    Same motivation as :class:`DiffSigmoidHead` (single-channel conv outputs
    pick bad TPU layouts); params identical to ``nn.Conv(1, (1,1))``.
    """

    cin: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, 1),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        w = kernel[0, 0, :, 0]
        if x.shape[-1] > self.cin:
            w = jnp.pad(w, (0, x.shape[-1] - self.cin))
        logit = jnp.einsum(
            "bhwc,c->bhw", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # see DiffSigmoidHead
        )
        return jax.nn.sigmoid(logit + bias[0])


def resize_bilinear(x: jax.Array, out_hw: tuple) -> jax.Array:
    """``tf.image.resize(..., method='bilinear')`` equivalent (half-pixel
    centers, no corner alignment) for NHWC."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


class _ConvBlock(nn.Module):
    """Two Conv3×3-ReLU layers (one encoder/decoder stage).

    ``in_blocks`` describes a lane-padded input layout and ``cout_pads`` gives
    per-conv output lane padding (see :class:`PadConv`); with both empty the
    block is plain ``nn.Conv``. Either way the param tree is identical.
    """

    features: int
    names: tuple
    dtype: Any = jnp.bfloat16
    in_blocks: tuple = ()
    cout_pads: tuple = ()
    # Tag each conv-relu output with jax.ad_checkpoint.checkpoint_name
    # ("l1.<conv name>") so trainers can rematerialize exactly these stashes
    # (see LEVEL1_CHECKPOINT_NAMES). Identity outside a checkpoint context.
    ckpt_tag: bool = False

    @nn.compact
    def __call__(self, x):
        blocks = self.in_blocks
        for i, name in enumerate(self.names):
            pad = self.cout_pads[i] if i < len(self.cout_pads) else 0
            if blocks or pad:
                x = PadConv(self.features, self.dtype, in_blocks=blocks,
                            cout_pad=pad, name=name)(x)
            else:
                x = nn.Conv(self.features, (3, 3), padding="SAME",
                            dtype=self.dtype, name=name)(x)
            x = nn.relu(x)
            if self.ckpt_tag:
                x = checkpoint_name(x, f"l1.{name}")
            blocks = ((self.features, pad),) if pad else ()
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
    # Block-LOCAL rematerialization of exactly the level-1 (full-resolution)
    # stages: the down1 encoder block and the up1 decoder stage + main head
    # each become their own small nn.remat region, so the backward pass
    # recomputes a handful of 1024²-scale activations from tiny inputs
    # instead of stashing them. This attacks the measured HBM-edge live set
    # (~17 GB temps at b8; ~95 ms/step of XLA compression-remat copies on
    # exactly these buffers — BASELINE.md) at the cost of ~5 level-1 convs
    # of replay. Distinct from `remat` (every stage) and from whole-apply
    # jax.checkpoint policies (whose bulk replay failed to compile at b8 —
    # scripts/exp_train_remat_policy.py): the regions here are local, so
    # the replay live set is small. Param tree is unchanged (lifted
    # function transform on the module's own scope).
    remat_level1: bool = False
    # Whether the remat_level1 regions carry optimization barriers
    # (jax.checkpoint prevent_cse). False lets XLA CSE the backward replay
    # against the forward computation — which quietly reinstates the very
    # stashes the remat exists to remove (measured: b8 identical to base,
    # scripts/exp_remat_level1.py). True is the honest remat.
    remat_level1_prevent_cse: bool = True
    # Zero-pad level-1 channels (init_nb → lane_pad) so the full-resolution
    # convs run MXU-lane-aligned — bit-exact, measured 72.6 → ~80 tiles/s on
    # v5e at 1024² (see PadConv docstring). 0 disables.
    lane_pad: int = 64
    # Compute the softmax-slice head as sigmoid(logit diff) (DiffSigmoidHead;
    # 83.3 → 88.7 tiles/s inference). The einsum's BACKWARD materializes a
    # badly-laid-out full-res gradient copy (+2 GB at batch 8, OOMs training),
    # so trainers may turn it off — both heads read the same params and are
    # mathematically equal, so checkpoints interchange freely.
    fast_head: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        dt = self.compute_dtype
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(dt)
        h, w = x.shape[1], x.shape[2]

        block = nn.remat(_ConvBlock) if self.remat else _ConvBlock
        nb = self.init_nb
        P = self.lane_pad if self.lane_pad > nb else 0

        # Encoder (explicit names reproduce flax's auto-naming so the padded
        # and unpadded paths share one param tree)
        down1_block = (nn.remat(_ConvBlock)
                       if (self.remat or self.remat_level1) else _ConvBlock)
        down1 = down1_block(nb, ("down1_conv1", "down1_conv2"), dt,
                            in_blocks=(), cout_pads=(P, P) if P else (),
                            ckpt_tag=True, name="_ConvBlock_0")(x)
        p1 = nn.max_pool(down1, (2, 2), strides=(2, 2))
        down2 = block(nb * 2, ("down2_conv1", "down2_conv2"), dt,
                      in_blocks=((nb, P),) if P else (), cout_pads=(),
                      name="_ConvBlock_1")(p1)
        p2 = nn.max_pool(down2, (2, 2), strides=(2, 2))
        down3 = block(self.init_nb * 4, ("down3_conv1", "down3_conv2"), dt,
                      name="_ConvBlock_2")(p2)
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
        def up_stage(feat, skip, y, names, tag=False):
            def _t(z, name):
                return checkpoint_name(z, f"l1.{name}") if tag else z

            y = _t(nn.relu(FusedUpsampleConv(feat, dt, name=names[0])(y)), names[0])
            # NOTE: computing this as two split convs (avoiding the concat
            # materialization) was measured SLOWER on v5e (75.2 vs 80.0
            # tiles/s) — XLA fuses concat+conv better than two MXU passes.
            y = jnp.concatenate([skip, y], axis=-1)
            y = _t(nn.relu(nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=names[1])(y)), names[1])
            y = _t(nn.relu(nn.Conv(feat, (3, 3), padding="SAME", dtype=dt, name=names[2])(y)), names[2])
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            return _t(y, "up1") if tag else y

        up3 = up_stage(self.init_nb * 4, down3, bottleneck,
                       ("up3_conv1", "up3_conv2", "up3_conv3"))
        up2 = up_stage(self.init_nb * 2, down2, up3,
                       ("up2_conv1", "up2_conv2", "up2_conv3"))

        def level1_tail(mdl, down1_v, up2_v):
            """up1 decoder stage + main head: the whole full-resolution tail
            as one function of (down1, up2), so ``remat_level1`` can replay
            it in backward — its inputs are the only 1024²-scale values that
            then stay live. Params bind to ``mdl``'s own scope (names
            unchanged)."""
            del mdl  # params bind via the enclosing compact scope
            if P:
                # Level-1 decoder stage lane-padded: the skip/upsample concat
                # is 64+64 = exactly one 128-lane register.
                y = nn.relu(FusedUpsampleConv(nb, dt, cout_pad=P,
                                              name="up1_conv1")(up2_v))
                y = checkpoint_name(y, "l1.up1_conv1")
                y = jnp.concatenate([down1_v, y], axis=-1)
                y = nn.relu(PadConv(nb, dt, in_blocks=((nb, P), (nb, P)),
                                    cout_pad=P, name="up1_conv2")(y))
                y = checkpoint_name(y, "l1.up1_conv2")
                y = nn.relu(PadConv(nb, dt, in_blocks=((nb, P),), cout_pad=P,
                                    name="up1_conv3")(y))
                y = checkpoint_name(y, "l1.up1_conv3")
                up1 = nn.Dropout(self.dropout_rate,
                                 deterministic=not train)(y)
                up1 = checkpoint_name(up1, "l1.up1")
            else:
                up1 = up_stage(self.init_nb, down1_v, up2_v,
                               ("up1_conv1", "up1_conv2", "up1_conv3"),
                               tag=True)

            # Main head: softmax-2ch-slice computed as sigmoid(logit-diff)
            # (exact reformulation; see DiffSigmoidHead — saves 15% of
            # forward).
            if self.fast_head:
                return DiffSigmoidHead(cin=nb, name="output_softmax")(up1)
            if P:
                logits = PadConv(2, dt, in_blocks=((nb, P),),
                                 kernel_size=(1, 1),
                                 name="output_softmax")(up1)
            else:
                logits = nn.Conv(2, (1, 1), dtype=dt,
                                 name="output_softmax")(up1)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]

        if self.remat_level1:
            main = nn.remat(
                level1_tail, prevent_cse=self.remat_level1_prevent_cse,
            )(self, down1, up2)
        else:
            main = level1_tail(self, down1, up2)

        if not self.use_deep_supervision:
            return main

        if self.fast_head:
            aux1 = SigmoidHead1x1(cin=nb * 4, name="aux_out1")(up3)[..., None]
            aux2 = SigmoidHead1x1(cin=nb * 2, name="aux_out2")(up2)[..., None]
        else:
            aux1 = jax.nn.sigmoid(
                nn.Conv(1, (1, 1), dtype=dt, name="aux_out1")(up3).astype(jnp.float32))
            aux2 = jax.nn.sigmoid(
                nn.Conv(1, (1, 1), dtype=dt, name="aux_out2")(up2).astype(jnp.float32))
        aux1 = resize_bilinear(aux1, (h, w))[..., 0]
        aux2 = resize_bilinear(aux2, (h, w))[..., 0]
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
