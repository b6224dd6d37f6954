"""Train-step throughput: percentile normalization, sort vs u8-CDF kernel.

VERDICT r1 item 5 follow-up: the U-Net trainer's percentile path now uses the
Pallas 256-bin-CDF kernel on TPU (ops/normalize.batched_percentile_unit_fast);
this measures the train-step delta to record in BASELINE.md. Timings use the
forced-scalar-download sync (axon block_until_ready is unreliable for small
programs; the train step is big enough to be honest, but keep the download
anyway). TPU only; serialize with other TPU scripts.

Usage: python scripts/bench_train_percentile.py [batch=8]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train.state import TrainState, make_optimizer, unet_loss_from_config
    import adipose_tpu.train.trainer_unet as TU
    from adipose_tpu.train.trainer_unet import _make_fused_train_step
    import adipose_tpu.ops.normalize as N

    print("backend:", jax.devices())
    TILE = 1024
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = TrainConfig(normalization_method="percentile")
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    rng = np.random.RandomState(865)

    def measure(label, fast):
        # toggle the TPU fast path by patching the trainer's binding
        # (trainer_unet imports the symbol at module load)
        orig = TU.batched_percentile_unit_fast
        if not fast:
            TU.batched_percentile_unit_fast = (
                lambda imgs, p_low, p_high, mesh=None:
                N.batched_percentile_unit(imgs, p_low, p_high))
        try:
            step = _make_fused_train_step(model, loss_fn, cfg.augment_level,
                                          "percentile", cfg.percentile_low,
                                          cfg.percentile_high)
            params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
            state = TrainState.create(params=params, tx=tx)
            imgs = jnp.asarray((rng.rand(batch, TILE, TILE) * 255).astype(np.uint8))
            masks = jnp.asarray((rng.rand(batch, TILE, TILE) > 0.7).astype(np.uint8))
            mean, std = jnp.float32(200.99), jnp.float32(25.26)
            for i in range(2):  # warmup/compile
                state, m = step(state, imgs, masks, key_for("w", i), mean, std)
                _ = float(m["loss"])
            t0 = time.perf_counter()
            iters = 6
            for i in range(iters):
                state, m = step(state, imgs, masks, key_for("t", i), mean, std)
                _ = float(m["loss"])  # forced sync per step
            dt = time.perf_counter() - t0
            print(f"{label}: {batch * iters / dt:.2f} tiles/s "
                  f"({dt / iters * 1e3:.1f} ms/step)")
        finally:
            TU.batched_percentile_unit_fast = orig

    measure("percentile sort (jnp.percentile)", fast=False)
    measure("percentile u8-CDF Pallas kernel", fast=True)


if __name__ == "__main__":
    main()
