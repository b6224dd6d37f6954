"""Honest re-measure of the fused zscore+stats Pallas kernel (BASELINE row).

Round-1 reported "141 000 tiles/s" for :func:`fused_zscore_normalize`, read
with ``block_until_ready`` — which on the tunneled axon runtime does NOT
block for small programs (ARCHITECTURE.md "Measurement discipline"). This
script re-measures with the forced-download protocol (scalar device→host
pull per timed call, rotating distinct batches) and prints both the Pallas
kernel and the jnp multi-pass baseline it replaces (per-tile mean / std /
white-ratio as separate reductions + z-score, the reference's
``train_adipose_unet_v3.py:568-607`` / ``build_dataset.py:1253-1284`` shape).

Usage: python scripts/bench_preprocess.py [batch]   (TPU, serialized)
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.jitopts import infer_jit
    from adipose_tpu.ops.pallas.preprocess import fused_zscore_normalize

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    TILE = 1024
    print("backend:", jax.devices(), "batch:", batch)

    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    @infer_jit
    def jnp_baseline(tiles_u8, mean, std):
        x = tiles_u8.astype(jnp.float32)
        t_mean = jnp.mean(x, axis=(1, 2))
        t_std = jnp.std(x, axis=(1, 2))
        white = jnp.mean((x >= 235.0).astype(jnp.float32), axis=(1, 2))
        out = (x - mean) / (std + 1e-10)
        return out, jnp.stack([t_mean, t_std, white], axis=1)

    rng = np.random.RandomState(865)
    batches = [
        jnp.asarray((rng.rand(batch, TILE, TILE) * 255).astype(np.uint8))
        for _ in range(3)
    ]

    def measure(fn, name, iters=6):
        # warmup + compile
        out, stats = fn(batches[0], mean, std)
        _ = float(stats[0, 0])
        _ = float(out[0, 0, 0])
        t0 = time.perf_counter()
        for i in range(iters):
            out, stats = fn(batches[i % 3], mean, std)
        # hard sync: programs run in order on one core; pulling scalars from
        # the LAST outputs guarantees the whole sequence executed.
        _ = float(stats[0, 0]) + float(out[0, 0, 0])
        dt = time.perf_counter() - t0
        tps = batch * iters / dt
        print(f"{name:14s} {dt/iters*1e3:8.2f} ms/batch  {tps:10.1f} tiles/s")
        return tps

    t_jnp = measure(jnp_baseline, "jnp multi-pass")
    t_pl = measure(lambda b, m, s: fused_zscore_normalize(b, m, s),
                   "pallas fused")
    # sanity: identical outputs (both compute in f32 from u8)
    o1, s1 = jnp_baseline(batches[0], mean, std)
    o2, s2 = fused_zscore_normalize(batches[0], mean, std)
    print("max |out diff|:", float(jnp.max(jnp.abs(o1 - o2))),
          " max |stats diff|:", float(jnp.max(jnp.abs(s1 - s2))))
    print(f"speedup: {t_pl / t_jnp:.2f}x")


if __name__ == "__main__":
    main()
