"""One-off: measure per-execute overhead of the tunneled axon runtime.

If a fixed per-dispatch cost dominates, batching more work per program call
(scan megabatches) beats micro-optimizing device FLOPs.

Usage: python scripts/exp_dispatch_overhead.py   (TPU, serialized)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet

    print("backend:", jax.devices())

    # 1) trivial program: per-call wall time, sequential (sync each call)
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    tiny(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        y = tiny(x)
        y.block_until_ready()
        _ = float(y[0, 0])
    dt = time.perf_counter() - t0
    print(f"tiny sync: {dt / 20 * 1e3:.2f} ms/call")

    # 2) trivial program, pipelined 20 deep, sync once
    t0 = time.perf_counter()
    ys = [tiny(x) for _ in range(20)]
    _ = float(ys[-1][0, 0])
    dt = time.perf_counter() - t0
    print(f"tiny pipelined: {dt / 20 * 1e3:.2f} ms/call")

    # 3) real model b16: sequential-sync vs pipelined
    TILE = 1024
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    @jax.jit
    def predict(params, tiles_u8):
        xx = (tiles_u8.astype(jnp.float32) - mean) / (std + 1e-10)
        return model.apply(params, xx, train=False)

    rng = np.random.RandomState(865)
    batches = [
        jnp.asarray((rng.rand(16, TILE, TILE) * 255).astype(np.uint8))
        for _ in range(3)
    ]
    for b in batches[:2]:
        out = predict(params, b)
        _ = float(out[0, 0, 0])

    t0 = time.perf_counter()
    for i in range(6):
        out = predict(params, batches[i % 3])
        _ = float(out[0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"b16 sequential-sync: {dt / 6 * 1e3:.1f} ms/call = "
          f"{16 * 6 / dt:.1f} tiles/s")

    t0 = time.perf_counter()
    outs = [predict(params, batches[i % 3]) for i in range(6)]
    _ = float(outs[-1][0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"b16 pipelined:       {dt / 6 * 1e3:.1f} ms/call = "
          f"{16 * 6 / dt:.1f} tiles/s")

    # 4) scan megabatch: 4 chunks of 16 in ONE program
    @jax.jit
    def predict_scan(params, tiles_u8):  # (4, 16, H, W)
        def body(_, chunk):
            xx = (chunk.astype(jnp.float32) - mean) / (std + 1e-10)
            return None, model.apply(params, xx, train=False)

        _, outs = jax.lax.scan(body, None, tiles_u8)
        return outs

    mega = [
        jnp.asarray((rng.rand(4, 16, TILE, TILE) * 255).astype(np.uint8))
        for _ in range(2)
    ]
    for m in mega:
        out = predict_scan(params, m)
        _ = float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    outs = [predict_scan(params, mega[i % 2]) for i in range(3)]
    _ = float(outs[-1][0, 0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"scan 4x16 pipelined: {dt / 3 * 1e3:.1f} ms/call = "
          f"{64 * 3 / dt:.1f} tiles/s")


if __name__ == "__main__":
    main()
