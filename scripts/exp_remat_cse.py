"""One-off: remat_level1 WITH optimization barriers (prevent_cse=True) vs the
r4-first-cut prevent_cse=False form that measured identical to base.

Theory: under plain jit, prevent_cse=False lets XLA common-subexpression-
eliminate the backward replay of the level-1 tail against the forward
computation — the "replayed" convs collapse onto the forward ones and their
outputs become live again, reinstating exactly the stashes remat_level1 was
built to remove. prevent_cse=True inserts the standard jax.checkpoint
optimization barriers so the replay stays a replay.

Also retries b4: if the honest remat really shrinks the live set, the XLA
conv-lowering pass that blows 20.8 GB of HLO temps at b4 may now fit.

Usage: python scripts/exp_remat_cse.py [batches...]   (TPU, serialized)
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
    from adipose_tpu.train.state import (
        TrainState,
        make_optimizer,
        unet_loss_from_config,
    )
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    print("backend:", jax.devices())
    TILE = 1024
    cfg = TrainConfig()
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    rng = np.random.RandomState(865)
    key = key_for("train.step")
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    batches = [int(a) for a in (sys.argv[1:] or ["8", "8", "4", "2"])]
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False,
                        remat_level1=True, remat_level1_prevent_cse=True)
    step = _make_fused_train_step(model, loss_fn, cfg.augment_level,
                                  cfg.normalization_method,
                                  cfg.percentile_low, cfg.percentile_high)
    for batch in batches:
        try:
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
            print(f"remat_l1+cse b{batch}: {batch * iters / dt:.2f} tiles/s "
                  f"({dt / iters * 1e3:.0f} ms/step, "
                  f"compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"remat_l1+cse b{batch}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
