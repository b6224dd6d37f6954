"""Layout pinning via a trivial Pallas copy kernel.

Pallas kernels lower to XLA custom calls, whose operands and results are
CONSTRAINED to default (major-to-minor) layouts. That constraint makes a
kernel at a conv boundary expensive (``unet_kernels.py``: a 2.1 GB relayout)
— but it is leverage when XLA's layout assignment picks a pathological
layout on its own: inserting a no-op Pallas copy forces the producer to
materialize default-layout data at that point, and downstream fusions see a
default-layout operand instead of inheriting the bad choice.

Concrete case (measured 2026-08-18): a batched spatial transpose
(``ops/d4.py:apply_transform_batch``) makes XLA lay out every downstream
f32[8,1024,1024] augmentation temp as {0,2,1} — batch dim in the 128-lane
position, a 16× padding expansion — which cost 786 ms/batch in the
rot90/flip stage alone and drove ablation programs to 23.5 GB HLO temp.
Pinning the transposed array costs one honest 32 MB relayout pass (~0.1 ms).
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pin_default_layout(x: jax.Array) -> jax.Array:
    """Force `x` to materialize in the default major-to-minor layout (TPU).

    No-op on other backends (CPU tests, virtual meshes): only the TPU
    layout-assignment pathology this guards against exists there, and
    Pallas TPU kernels don't lower elsewhere.
    """
    if jax.default_backend() != "tpu":
        return x
    if x.ndim < 2:
        return x
    lead = x.shape[:-2]
    block = (1,) * len(lead) + x.shape[-2:]

    def index_map(*idx):
        return idx + (0, 0)

    return pl.pallas_call(
        _copy_kernel,
        grid=lead,
        in_specs=[pl.BlockSpec(block, index_map)],
        out_specs=pl.BlockSpec(block, index_map),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


@jax.custom_vjp
def pin_default_layout_grad(x: jax.Array) -> jax.Array:
    """Differentiable :func:`pin_default_layout` — semantically identity, so
    the VJP passes the cotangent through (also pinned, anchoring the gradient
    buffer's layout the same way the primal's is)."""
    return pin_default_layout(x)


def _pin_fwd(x):
    return pin_default_layout(x), None


def _pin_bwd(_, g):
    return (pin_default_layout(g),)


pin_default_layout_grad.defvjp(_pin_fwd, _pin_bwd)
