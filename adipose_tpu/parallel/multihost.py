"""Multi-host (DCN) scaling — ``jax.distributed`` + hybrid mesh layout.

The reference has **no** distributed communication backend at all (SURVEY.md
§2.5: no NCCL/MPI/horovod; only dead TF1 batch-slicing towers,
``src/utils/multi_gpu.py:7-58``). The TPU rebuild's single-slice story is
`parallel/mesh.py` (GSPMD over ICI); this module is the beyond-one-host layer:

  * :func:`initialize_multihost` — ``jax.distributed.initialize`` wrapper that
    is a safe no-op for single-process runs, so every entry point can call it
    unconditionally;
  * :func:`make_global_mesh` — a ``(data, model)`` mesh over ALL global
    devices, laid out so the **data axis crosses the DCN process boundary**
    while the model/spatial axis stays inside one host's ICI domain. That is
    the standard layout rule: gradient all-reduce is one ring over DCN per
    step, but the chatty per-conv halo exchanges of spatial sharding
    (`parallel/spatial.py`) never leave ICI;
  * :func:`local_batch_slice` / :func:`make_global_array` — per-host data
    loading: each process reads only its shard of the global batch and the
    shards assemble into one global jax.Array.

Single-host behavior is identical to `mesh.py` (the tests run both on the
8-device virtual CPU mesh).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from adipose_tpu.parallel.mesh import data_sharding

#: Environment variables whose presence indicates an externally-configured
#: cluster (TPU pod metadata, or explicit coordinator settings).
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` when a cluster is configured; else no-op.

    On TPU pods ``jax.distributed.initialize()`` auto-detects everything from
    the environment, so entry points call this with no arguments. Explicit
    args cover manual CPU/GPU clusters. Returns True iff the distributed
    runtime is (now) initialized. Safe to call twice.
    """
    explicit = coordinator_address is not None and num_processes is not None
    if not explicit and num_processes in (None, 1):
        auto = any(os.environ.get(v) for v in _CLUSTER_ENV_VARS)
        if not auto:
            return False  # single-process run: nothing to initialize
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized → keep going
        if "already initialized" not in str(e).lower():
            raise
    return True


def make_global_mesh(model_axis: int = 1) -> Mesh:
    """(data, model) mesh over every device of every process.

    Layout: the process (DCN) dimension is the OUTERMOST factor of the data
    axis, and ``model_axis`` devices per host form the model axis — so model/
    spatial collectives ride ICI and only the per-step gradient reduction
    crosses DCN. Single-process, this reduces exactly to
    ``mesh.make_mesh(model_axis=...)`` over all local devices.
    """
    n_proc = jax.process_count()
    devices = jax.devices()  # globally ordered by process_index
    per_proc = len(devices) // n_proc
    if per_proc % model_axis != 0:
        raise ValueError(
            f"{per_proc} devices/host not divisible by model_axis={model_axis}"
        )
    arr = np.asarray(devices).reshape(n_proc * (per_proc // model_axis),
                                      model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of THIS process's contiguous shard of the global batch.

    The global batch must divide by process_count; each host's loader reads
    only ``global_batch[start : start + size]`` from shared storage.
    """
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n_proc} processes"
        )
    size = global_batch_size // n_proc
    return jax.process_index() * size, size


def make_global_array(mesh: Mesh, local_data) -> jax.Array:
    """Assemble per-process host shards into one global data-sharded array.

    ``local_data``'s leading axis is this process's slice of the global batch
    (see :func:`local_batch_slice`); the result is a jax.Array of global shape
    sharded over the mesh's 'data' axis. Single-process this is equivalent to
    ``device_put`` with the same sharding.
    """
    local_data = np.asarray(local_data)
    return jax.make_array_from_process_local_data(
        data_sharding(mesh, local_data.ndim), local_data
    )
