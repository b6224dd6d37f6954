"""TTA-eval throughput benchmark: the reference's hot loop (per-tile predict
with test-time augmentation, ``full_evaluation_enhanced.py:1547-1588``) as the
batched device program from eval/tta.py.

Usage: python scripts/bench_eval_tta.py [mode]   (TPU, serialized)
  mode: minimal (2 views) | basic (4) | full (8); default basic.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.eval.tta import make_tta_predict
    from adipose_tpu.models.unet import DilatedUNet

    mode = sys.argv[1] if len(sys.argv) > 1 else "basic"
    print("backend:", jax.devices())
    TILE, BATCH = 1024, 4  # "basic" TTA expands 4x -> device batch 16 (the b16 optimum)
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    def predict(params, tiles):
        x = (tiles - mean) / (std + 1e-10)
        return model.apply(params, x, train=False)

    tta = make_tta_predict(predict, mode)

    rng = np.random.RandomState(865)
    batches = [
        jnp.asarray((rng.rand(BATCH, TILE, TILE) * 255).astype(np.float32))
        for _ in range(3)
    ]
    for b in batches[:2]:
        out = tta(params, b)
        _ = float(out[0, 0, 0])

    iters = 6
    t0 = time.perf_counter()
    outs = [tta(params, batches[i % 3]) for i in range(iters)]
    _ = float(outs[-1][0, 0, 0])
    dt = time.perf_counter() - t0
    tps = BATCH * iters / dt
    print(json.dumps({
        "metric": f"unet_1024px_tta_{mode}_tiles_per_sec",
        "value": round(tps, 2),
        "unit": "tiles/s/chip (each tile = all TTA views, de-augmented mean)",
    }))


if __name__ == "__main__":
    main()
