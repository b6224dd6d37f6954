"""Spatially-sharded (context-parallel) inference forward of the DilatedUNet.

One 1024² tile is ~180 ms of single-chip work; when LATENCY on one image
matters more than throughput, this module runs the SAME parameters over a
mesh with the image's H axis sharded across chips (the image-domain analog of
context parallelism — SURVEY.md §5 "long-context"). Strategy, chosen by where
the FLOPs are (ARCHITECTURE.md performance model):

  * levels 1–2 (≥94% of the compute, at 1024²/512²) run H-sharded with
    1-row halo exchanges per 3×3 conv (:mod:`adipose_tpu.parallel.spatial`);
  * level 3 + the dilated bottleneck + decoder level 3 are REPLICATED after
    an all-gather at /4 resolution — the rate-32 dilated convs would need
    32-row halos (more than a shard holds) while the whole /4 feature map is
    ~12 MB, so gathering is cheaper than multi-hop halos;
  * the decoder re-shards at /2 via a local slice of the replicated up3.

The graph mirrors ``models/unet.py`` inference exactly (fused upsample+conv
kernels included — the 4×4 lhs-dilated derivation is shared math), and
equality with ``model.apply`` is pinned by tests/test_spatial.py on the
8-virtual-device CPU mesh. Architecture spec cite:
``Segmentation/train_adipose_unet_v3.py:660-758``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from adipose_tpu.models.unet import fused_upsample_kernel
from adipose_tpu.parallel.spatial import halo_exchange, spatial_max_pool2


def _conv(x, kb, dilation=(1, 1), h_pad="none"):
    """NHWC conv, SAME on W; H padding: 'none' (halo provided) or 'same'."""
    k, b = kb
    kh, kw = k.shape[0], k.shape[1]
    ph = dilation[0] * (kh - 1) // 2 if h_pad == "same" else 0
    pw = dilation[1] * (kw - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(ph, ph), (pw, pw)], rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def _upconv(x, kb, h_pad="same"):
    """Fused nearest-×2-upsample + 3×3 conv as one lhs-dilated 4×4 conv.

    ``h_pad='same'``: global form (pad 2, like the flax module).
    ``h_pad='halo'``: shard-local form — caller supplies a 1-row halo; the
    lhs-dilation's inserted zeros + zero edge halos reproduce the global
    padding exactly (out rows = 2·local rows).
    """
    k, b = kb
    kp = fused_upsample_kernel(k)
    ph = (2, 2) if h_pad == "same" else (0, 0)
    y = jax.lax.conv_general_dilated(
        x, kp, (1, 1), [ph, (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def spatial_unet_predict(params, images, mesh: Mesh, *,
                         axis_name: str = "data",
                         compute_dtype=jnp.bfloat16):
    """H-sharded DilatedUNet inference: (B, H, W) normalized → (B, H, W) probs.

    H must be divisible by 8·mesh.shape[axis_name] (three pools shard-local).
    Parameters are the ordinary ``model.init``/checkpoint tree, replicated.

    Deep-supervision checkpoints are rejected: this forward produces only the
    main head (inference never uses the aux outputs), and silently ignoring
    ``aux_out*`` params would hide a checkpoint/config mismatch. Also implies
    ``fast_head`` semantics — identical outputs either way (models/unet.py).
    """
    p = params["params"]
    aux = sorted(k for k in p if k.startswith("aux_out"))
    if aux:
        raise ValueError(
            f"spatial_unet_predict does not support deep-supervision "
            f"checkpoints (found {aux}); run the aux-head forward via "
            f"model.apply, or drop the aux heads from the param tree "
            f"explicitly if only main_out is wanted")
    dt = compute_dtype

    def kb(*path):
        node = p
        for seg in path:
            node = node[seg]
        return node["kernel"].astype(dt), node["bias"]

    relu = jax.nn.relu
    n_sh = mesh.shape[axis_name]

    def local_forward(x):  # x: (B, H_local, W) slab
        x = x[..., None].astype(dt)

        def sconv(x, kbv, dilation=(1, 1)):
            halo = dilation[0]
            xp = halo_exchange(x, halo, axis_name)
            return relu(_conv(xp, kbv, dilation, h_pad="none"))

        # encoder levels 1–2: sharded with halos
        d1 = sconv(sconv(x, kb("_ConvBlock_0", "down1_conv1")),
                   kb("_ConvBlock_0", "down1_conv2"))
        p1 = spatial_max_pool2(d1)
        d2 = sconv(sconv(p1, kb("_ConvBlock_1", "down2_conv1")),
                   kb("_ConvBlock_1", "down2_conv2"))
        p2 = spatial_max_pool2(d2)

        # gather to full /4 resolution; middle of the net runs replicated
        full = jax.lax.all_gather(p2, axis_name, axis=1, tiled=True)
        d3 = relu(_conv(full, kb("_ConvBlock_2", "down3_conv1"), h_pad="same"))
        d3 = relu(_conv(d3, kb("_ConvBlock_2", "down3_conv2"), h_pad="same"))
        p3 = spatial_max_pool2(d3)  # no shard boundary: plain local pool

        d = p3
        taps = []
        for i, rate in enumerate((1, 2, 4, 8, 16, 32)):
            d = relu(_conv(d, kb(f"dilate{i + 1}"), dilation=(rate, rate),
                           h_pad="same"))
            taps.append(d)
        bott = sum(taps)

        y = relu(_upconv(bott, kb("up3_conv1"), h_pad="same"))
        y = jnp.concatenate([d3, y], axis=-1)
        y = relu(_conv(y, kb("up3_conv2"), h_pad="same"))
        up3 = relu(_conv(y, kb("up3_conv3"), h_pad="same"))

        # decoder level 2: replicated upsample, then re-shard via local slice
        y2_full = relu(_upconv(up3, kb("up2_conv1"), h_pad="same"))
        h2_local = y2_full.shape[1] // n_sh
        idx = jax.lax.axis_index(axis_name)
        y2 = jax.lax.dynamic_slice_in_dim(y2_full, idx * h2_local, h2_local, 1)
        y2 = jnp.concatenate([d2, y2], axis=-1)
        y2 = sconv(y2, kb("up2_conv2"))
        up2 = sconv(y2, kb("up2_conv3"))

        # decoder level 1: sharded fused upconv (1-row halo)
        y1 = relu(_upconv(halo_exchange(up2, 1, axis_name),
                          kb("up1_conv1"), h_pad="halo"))
        y1 = jnp.concatenate([d1, y1], axis=-1)
        y1 = sconv(y1, kb("up1_conv2"))
        up1 = sconv(y1, kb("up1_conv3"))

        # sigmoid(logit-diff) head == softmax-2ch class-1 (models/unet.py)
        hk = p["output_softmax"]["kernel"]
        hb = p["output_softmax"]["bias"]
        wd = (hk[0, 0, :, 1] - hk[0, 0, :, 0]).astype(up1.dtype)
        logit = jnp.einsum("bhwc,c->bhw", up1, wd,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jax.nn.sigmoid(logit + (hb[1] - hb[0]))

    f = jax.shard_map(
        local_forward, mesh=mesh,
        in_specs=P(None, axis_name, None),
        out_specs=P(None, axis_name, None),
    )
    return f(images)
