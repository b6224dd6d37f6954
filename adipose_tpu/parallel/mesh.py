"""Device mesh construction and sharding rules.

The reference's only distributed component is a dead TF1 batch-slicing helper
(``src/utils/multi_gpu.py:7-58``) plus CPU process pools; it never shipped a
real communication backend (SURVEY.md §2.5). The TPU rebuild makes scaling a
first-class property instead: one logical program, laid out over a
``jax.sharding.Mesh``, with XLA inserting ICI collectives.

Axes:
  * ``data``  — batch dimension (tiles). All training/eval steps shard their
    leading batch axis here; gradients all-reduce with ``psum`` over ICI.
  * ``model`` — reserved for tensor/spatial parallelism. The models here are
    ~10⁷ params so model sharding is not needed for capacity, but the axis is
    plumbed through so larger variants / spatial halo sharding can use it
    (mesh shape (N, 1) today).

On a host with no TPU, an 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) exercises the identical code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, model_axis: int = 1) -> Mesh:
    """Build a (data, model) mesh over the first ``num_devices`` devices
    (0 ⇒ all)."""
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def make_mesh_for_batch(batch_size: int, num_devices: int = 0) -> Mesh:
    """Mesh whose 'data' axis divides the global batch.

    The reference trains at batch 2-4 (``train_adipose_unet_v3.py:1471``),
    which cannot shard across 8 chips; rather than silently requiring
    batch % devices == 0, use the largest device count that divides the batch
    (SURVEY.md §7 'batch-2 on 8 chips'). Idle devices simply don't join the
    mesh; growing the batch recovers them.
    """
    devices = jax.devices()
    limit = num_devices if num_devices and num_devices > 0 else len(devices)
    limit = min(limit, len(devices))
    n = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    return make_mesh(n)


def make_mesh_spatial(batch_size: int, num_devices: int = 0,
                      image_h: int = 1024) -> Mesh:
    """Mesh that uses ALL devices for small batches: leftover devices shard H.

    ``make_mesh_for_batch`` leaves devices idle when the batch doesn't divide
    (batch 2 on 8 chips → 2 used). Here the remaining devices go on the
    'model' axis and the images' H dimension shards over it — XLA/GSPMD
    inserts the conv halo exchanges (forward AND backward) automatically, the
    spatial-parallel answer to SURVEY.md §7 'batch-2 training on 8 chips'.
    The model axis is kept a power of two that divides ``image_h`` so every
    level of the conv pyramid splits evenly.
    """
    devices = jax.devices()
    limit = num_devices if num_devices and num_devices > 0 else len(devices)
    limit = min(limit, len(devices))
    n_data = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    n_model = limit // n_data
    while n_model > 1 and (image_h % n_model or (n_model & (n_model - 1))):
        n_model -= 1
    return make_mesh(n_data * n_model, model_axis=n_model)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over 'data' and axis 1 (image H) over 'model'."""
    if ndim < 2:
        return data_sharding(mesh, ndim)
    return NamedSharding(mesh, P("data", "model", *([None] * (ndim - 2))))


def shard_batch_spatial(mesh: Mesh, batch):
    """Place a host batch on the mesh with (batch, H) sharded over
    ('data', 'model'). H must divide by the model-axis size
    (``make_mesh_spatial`` guarantees it for the standard tile sizes)."""
    def put(x):
        return jax.device_put(x, spatial_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays with leading batch axis) onto the
    mesh, sharded over 'data'. Batch size must divide by the data-axis size."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to(batch_size: int, *arrays):
    """Host-side: pad arrays' leading axis up to ``batch_size`` by repeating the
    last element; returns (padded_arrays, real_count). Keeps shapes static for
    jit while allowing ragged final batches."""
    out = []
    n = arrays[0].shape[0]
    for a in arrays:
        if a.shape[0] < batch_size:
            pad = np.repeat(a[-1:], batch_size - a.shape[0], axis=0)
            a = np.concatenate([a, pad], axis=0)
        out.append(a)
    return out, n
