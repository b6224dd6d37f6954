"""One-off: compile/measure the REAL trainer fused step across batch sizes.

BASELINE.md records 14.6 tiles/s at b8; verify that still compiles and holds
after the FusedUpsampleConv/PadConv changes, and profile where time goes.

Usage: python scripts/exp_train_step_bench.py [batches...]  (TPU, serialized)
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train.state import (
        TrainState, make_optimizer, unet_loss_from_config)
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    print("backend:", jax.devices())
    TILE = 1024
    cfg = TrainConfig()
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    step = _make_fused_train_step(model, loss_fn, cfg.augment_level,
                                  cfg.normalization_method,
                                  cfg.percentile_low, cfg.percentile_high)

    rng = np.random.RandomState(865)
    key = key_for("train.step")
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    for batch in [int(a) for a in (sys.argv[1:] or ["8", "4", "2"])]:
        try:
            # donate_argnums eats the state (and the params inside it) each
            # run — re-init per batch size
            params_i = model.init(key_for("bench.init"),
                                  jnp.zeros((1, TILE, TILE)))
            state = TrainState.create(params=params_i, tx=tx)
            imgs = jnp.asarray(
                (rng.rand(batch, TILE, TILE) * 255).astype(np.uint8))
            masks = jnp.asarray(
                (rng.rand(batch, TILE, TILE) > 0.5).astype(np.uint8))
            t0 = time.perf_counter()
            state, metrics = step(state, imgs, masks, key, mean, std)
            _ = float(metrics["loss"])
            compile_s = time.perf_counter() - t0
            iters = max(3, 16 // batch)
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, imgs, masks, key, mean, std)
            _ = float(metrics["loss"])
            dt = time.perf_counter() - t0
            print(f"b{batch}: {batch * iters / dt:.2f} tiles/s "
                  f"({dt / iters * 1e3:.0f} ms/step, compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"b{batch}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
