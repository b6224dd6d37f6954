"""Pallas U-Net head kernel — kept as a measured NEGATIVE result.

The reference computes its head as Conv1x1 -> softmax -> class-1 slice
(``Segmentation/train_adipose_unet_v3.py:747-752``); our model reformulates it
as ``sigmoid(<x, k1-k0> + (b1-b0))`` (models/unet.py DiffSigmoidHead). XLA's
``multiply_reduce`` fusion for that einsum runs ~6x off HBM speed-of-light
(16.6 ms of a 173 ms forward at batch 16, v5e), so a Pallas replacement was
the obvious move. It LOST, twice over (measurements in the model docstring):

  * the channel dim is the 64-lane minor dim, and cross-LANE reductions are
    the VPU's worst case (~6 shuffle+add steps per vreg): 22 ms standalone
    vs einsum's 8.6 ms. An MXU dot avoids that but pads the length-1 output
    dim to 128 lanes — a 16 MB f32 accumulator that overflows scoped VMEM at
    useful block sizes.
  * a Pallas custom call constrains its operands to DEFAULT layout; the
    producing conv prefers ``{3,0,2,1}``, so XLA inserts a 2.1 GB relayout
    copy (and/or degrades the producer): 88.7 -> 55.8 tiles/s end-to-end.

Any future Pallas work at the 1024^2 level must either consume the conv
layout natively (logical-shape trick: emit (H,W,B,C) so default layout
matches the conv's physical order) or span a region whose boundaries are
already default-layout (the u8 input; the f32 output mask).

The kernel stays (with tests) so the measurement is reproducible; production
paths use the einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _head_kernel(bias_ref, x_ref, w_ref, out_ref):
    # VPU contraction: upcasting both factors to f32 makes the products exact
    # for bf16 inputs (bf16->f32 is lossless), so the f32-accumulated result
    # matches the einsum path bit-for-bit. An MXU dot would pad the length-1
    # output dim to 128 lanes (a 16 MB f32 accumulator at rb=32 — VMEM OOM).
    x = x_ref[0].astype(jnp.float32)
    w = w_ref[:].reshape(1, 1, -1).astype(jnp.float32)
    logit = jnp.sum(x * w, axis=-1)
    out_ref[0] = jax.nn.sigmoid(logit + bias_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def diff_sigmoid_head(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """``sigmoid(einsum('bhwc,c->bhw', x, w) + bias)`` as one VMEM pass.

    Args:
      x: (B, H, W, C) activation (bf16 or f32).
      w: (C,) tap-difference vector (f32; cast to x.dtype like the einsum).
      bias: scalar logit offset.

    Returns:
      (B, H, W) float32 probabilities.
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, wdim, c = x.shape
    rb = 8 if h % 8 == 0 else h  # (1, 8, W, C) blocks: ~6 MB VMEM working set
    kernel = pl.pallas_call(
        _head_kernel,
        grid=(b, h // rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rb, wdim, c), lambda i, r: (i, r, 0, 0)),
            pl.BlockSpec((1, c), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, wdim), lambda i, r: (i, r, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wdim), jnp.float32),
        interpret=interpret,
    )
    return kernel(
        jnp.asarray([bias], jnp.float32),
        x,
        w.astype(x.dtype).reshape(1, c),
    )


@jax.custom_vjp
def diff_sigmoid_head_vjp(x: jax.Array, w: jax.Array, bias: jax.Array):
    """:func:`diff_sigmoid_head` with an einsum-math backward.

    The Pallas kernel has no autodiff rule; trainers default to the softmax
    head anyway (models/unet.py ``fast_head``), but if grads are ever taken
    through this path they must be correct, so the VJP recomputes the
    standard sigmoid/einsum cotangents from the saved activations.
    """
    return diff_sigmoid_head(x, w, bias)


def _head_fwd(x, w, bias):
    p = diff_sigmoid_head(x, w, bias)
    return p, (x, w, p)


def _head_bwd(res, g):
    x, w, p = res
    dlogit = g * p * (1.0 - p)  # f32, like the einsum path's cotangent
    dx = (dlogit[..., None] * w.astype(jnp.float32)).astype(x.dtype)
    dw = jnp.einsum(
        "bhwc,bhw->c", x.astype(jnp.float32), dlogit,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(w.dtype)
    dbias = jnp.sum(dlogit)
    return dx, dw, dbias


diff_sigmoid_head_vjp.defvjp(_head_fwd, _head_bwd)
