"""One-off: batch-size sweep for the inference bench (run on TPU, serialized).

Usage: python scripts/exp_batch_sweep.py [batches...]
"""
import sys
import time

import numpy as np

TILE = 1024


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet

    print("backend:", jax.devices())
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    @jax.jit
    def predict(params, tiles_u8):
        x = (tiles_u8.astype(jnp.float32) - mean) / (std + 1e-10)
        return model.apply(params, x, train=False)

    rng = np.random.RandomState(865)
    for batch in [int(a) for a in (sys.argv[1:] or ["16", "20", "24"])]:
        try:
            batches = [
                jnp.asarray((rng.rand(batch, TILE, TILE) * 255).astype(np.uint8))
                for _ in range(3)
            ]
            for b in batches[:2]:
                out = predict(params, b)
                out.block_until_ready()
                _ = float(out[0, 0, 0])
            iters = max(4, 96 // batch)
            t0 = time.perf_counter()
            outs = [predict(params, batches[i % 3]) for i in range(iters)]
            for out in outs:
                out.block_until_ready()
            _ = float(outs[-1][0, 0, 0])
            dt = time.perf_counter() - t0
            print(f"batch {batch}: {batch * iters / dt:.1f} tiles/s")
        except Exception as e:  # noqa: BLE001
            print(f"batch {batch}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
