"""One-off: find a model config that makes the b4 train step compile.

b4 hits an XLA TPU lowering that allocates 20.8G of HLO temps (b8 needs only
~14G; b2 compiles fine) — space-to-batch-style conv rewrites on the odd
44/88-channel shapes. Candidates: remat (shrink live set), lane_pad=64
(change the conv shapes the pass keys on).

Usage: python scripts/exp_b4_fixes.py   (TPU, serialized)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train.state import (
        TrainState, make_optimizer, unet_loss_from_config)
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    print("backend:", jax.devices())
    TILE, BATCH = 1024, 4
    cfg = TrainConfig()
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    rng = np.random.RandomState(865)
    key = key_for("train.step")
    mean, std = jnp.float32(200.99), jnp.float32(25.26)
    imgs = jnp.asarray((rng.rand(BATCH, TILE, TILE) * 255).astype(np.uint8))
    masks = jnp.asarray((rng.rand(BATCH, TILE, TILE) > 0.5).astype(np.uint8))

    for name, kw in [
        ("remat       ", dict(remat=True, lane_pad=0)),
        ("lane_pad    ", dict(remat=False, lane_pad=64)),
        ("remat+lanepd", dict(remat=True, lane_pad=64)),
    ]:
        try:
            model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                                fast_head=False, **kw)
            params = model.init(key_for("bench.init"),
                                jnp.zeros((1, TILE, TILE)))
            state = TrainState.create(params=params, tx=tx)
            step = _make_fused_train_step(
                model, loss_fn, cfg.augment_level, cfg.normalization_method,
                cfg.percentile_low, cfg.percentile_high)
            t0 = time.perf_counter()
            state, metrics = step(state, imgs, masks, key, mean, std)
            _ = float(metrics["loss"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(4):
                state, metrics = step(state, imgs, masks, key, mean, std)
            _ = float(metrics["loss"])
            dt = time.perf_counter() - t0
            print(f"{name}: {BATCH * 4 / dt:.2f} tiles/s "
                  f"({dt / 4 * 1e3:.0f} ms/step, compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
