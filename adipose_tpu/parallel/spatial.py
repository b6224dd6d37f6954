"""Spatial (context-parallel analog) sharding primitives: halo-exchange convs.

The reference has no distributed story at all (SURVEY.md §2.5); its answer to
gigapixel extent is the 3-level tiling hierarchy, and ours shards the tile
STREAM over the mesh 'data' axis (wsi/pipeline.py, eval/sliding_window.py).
This module provides the complementary primitive for the case tiling cannot
cover: ONE image too large (or too latency-critical) for one chip. The image's
H dimension is sharded across devices; convolutions see their neighbors'
border rows via explicit halo exchange over ICI (``jax.lax.ppermute``) —
the image-domain analog of ring/context parallelism for sequence models
(SURVEY.md §5 "long-context": optional spatial sharding with halo exchange).

Everything here runs inside ``jax.shard_map`` over a mesh axis; the global
results are bit-identical to the unsharded ops (tested on the 8-virtual-
device CPU mesh, tests/test_spatial.py).

Semantics notes:
  * ``halo_exchange`` fills out-of-image halos with zeros, matching SAME
    (zero) convolution padding at the global image border.
  * Shard-local heights must be equal (H divisible by the axis size) and at
    least as large as the halo (one ppermute hop reaches one neighbor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _axis_index(axis_name: str):
    return jax.lax.axis_index(axis_name)


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a H-sharded NHWC (or NHW) slab with ``halo`` rows from neighbors.

    Inside ``shard_map``: returns (..., H_local + 2*halo, ...) where the first
    and last ``halo`` rows come from the previous / next shard along
    ``axis_name`` (zeros at the global image edges).
    """
    n = jax.lax.axis_size(axis_name)
    idx = _axis_index(axis_name)
    assert x.shape[1] >= halo, (
        f"shard-local H ({x.shape[1]}) must be >= halo ({halo}): one "
        "ppermute hop only reaches the adjacent shard")
    top_rows = x[:, :halo]      # my first rows -> successor's top halo source
    bot_rows = x[:, -halo:]     # my last rows  -> predecessor's bottom halo

    if n == 1:
        from_prev = jnp.zeros_like(bot_rows)
        from_next = jnp.zeros_like(top_rows)
    else:
        # receive predecessor's LAST rows as my top halo
        from_prev = jax.lax.ppermute(
            bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])
        # receive successor's FIRST rows as my bottom halo
        from_next = jax.lax.ppermute(
            top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])
    # zero the wrapped halos at the global edges (SAME zero padding)
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def _conv_local(x, kernel, dilation):
    """SAME-on-W, VALID-on-(haloed-)H convolution of one NHWC slab."""
    kw = kernel.shape[1]
    dw = dilation[1]
    pad_w = (dw * (kw - 1)) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1),
        [(0, 0), (pad_w, pad_w)],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def spatial_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    axis_name: str,
    dilation: tuple = (1, 1),
) -> jax.Array:
    """H-sharded SAME convolution (odd kernel), shard_map-internal.

    Equal to the global ``conv_general_dilated(..., 'SAME')`` on the gathered
    image. Halo size is ``dilation_h * (kh // 2)`` rows per side.
    """
    kh = kernel.shape[0]
    halo = dilation[0] * (kh // 2)
    xp = halo_exchange(x, halo, axis_name) if halo else x
    return _conv_local(xp, kernel, tuple(dilation))


def spatial_max_pool2(x: jax.Array) -> jax.Array:
    """2×2/stride-2 max pool of an H-sharded slab (local H must be even —
    pool windows never straddle shard boundaries then)."""
    assert x.shape[1] % 2 == 0, "shard-local H must be even for 2x2 pooling"
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def sharded_conv_fn(mesh: Mesh, axis_name: str = "data"):
    """Wrap :func:`spatial_conv2d` in shard_map over ``mesh[axis_name]``.

    Returns ``f(image_nhwc, kernel, dilation=(1,1))`` operating on a GLOBAL
    NHWC image whose H axis shards over ``axis_name``; XLA moves only the
    halo rows over ICI.
    """

    def run(x, kernel, dilation=(1, 1)):
        f = jax.shard_map(
            partial(spatial_conv2d, axis_name=axis_name,
                    dilation=tuple(dilation)),
            mesh=mesh,
            in_specs=(P(None, axis_name, None, None), P(None, None, None, None)),
            out_specs=P(None, axis_name, None, None),
        )
        return f(x, kernel)

    return run
