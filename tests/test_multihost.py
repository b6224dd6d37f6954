"""Multi-host (DCN) layer — single-process semantics on the virtual mesh.

The real multi-process path cannot run inside one pytest process; these pin
the single-process contract (no-op init, global mesh == local mesh, identity
batch slice, make_global_array == device_put) that the multi-process code
composes from, on the 8-device virtual CPU mesh.
"""

import jax
import numpy as np

from adipose_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch
from adipose_tpu.parallel.multihost import (
    initialize_multihost,
    local_batch_slice,
    make_global_array,
    make_global_mesh,
)


def test_initialize_noop_single_process(monkeypatch):
    for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    assert initialize_multihost() is False
    assert jax.process_count() == 1  # untouched


def test_global_mesh_matches_local():
    gm = make_global_mesh()
    lm = make_mesh()
    assert gm.shape == lm.shape == {"data": 8, "model": 1}
    gm2 = make_global_mesh(model_axis=4)
    assert gm2.shape == {"data": 2, "model": 4}
    # model axis stays within contiguous (same-host) device blocks
    assert [d.id for d in gm2.devices.ravel()] == list(range(8))


def test_local_batch_slice_identity():
    assert local_batch_slice(16) == (0, 16)


def test_make_global_array_equals_device_put():
    mesh = make_global_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = make_global_array(mesh, x)
    ref = shard_batch(mesh, x)
    assert g.shape == (8, 4)
    assert g.sharding.is_equivalent_to(data_sharding(mesh, 2), 2)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))
    # sharded input feeds the same jit program as device_put data
    s = jax.jit(lambda a: a.sum())(g)
    assert float(s) == float(x.sum())


_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid, port = int(sys.argv[1]), sys.argv[2]
from adipose_tpu.parallel.multihost import (
    initialize_multihost, make_global_mesh, local_batch_slice,
    make_global_array)
import numpy as np
assert initialize_multihost(f"127.0.0.1:{port}", num_processes=2,
                            process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8
mesh = make_global_mesh()
assert dict(mesh.shape) == {"data": 8, "model": 1}
start, size = local_batch_slice(8)
assert (start, size) == (pid * 4, 4)
g = make_global_array(mesh, np.full((size, 4), pid + 1, np.float32))
total = float(jax.jit(lambda a: a.sum())(g))
assert total == 48.0, total
print("MULTIPROC-OK", flush=True)
"""


def test_two_process_dcn(tmp_path):
    """REAL multi-process run: 2 processes x 4 virtual devices form one
    8-device global mesh; per-process host shards assemble into a global
    array and a cross-process (gloo) reduction sees all shards."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "MULTIPROC-OK" in out
