"""One-off: block-local level-1 remat (model.remat_level1) vs base at the
production train step — the VERDICT r3 item-4 "shrink the live set itself"
lever.

The b8 train program sits at the HBM edge (~17 GB temps) and XLA spends
~95 ms/step on compression-remat copies of level-1 stashes; whole-apply
checkpoint policies failed to compile (exp_train_remat_policy.py) and layout
pins measured negative (exp_stash_layout.py). remat_level1 instead makes the
down1 block and the up1 tail + head their OWN small nn.remat regions —
backward replays ~5 level-1 convs from tiny inputs and the stashes never
exist. Gradients bit-identical (verified CPU, f32).

Also retries the reference's production batch sizes (b4/b2), which crash
XLA's conv lowering without remat and fall back to full-model remat at 8.1
tiles/s.

Usage: python scripts/exp_remat_level1.py [batches...]   (TPU, serialized)
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
    variants = [("remat_level1", dict(remat_level1=True)),
                ("base", dict())]
    for name, kw in variants:
        model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                            lane_pad=0, fast_head=False, **kw)
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
                print(f"{name} b{batch}: {batch * iters / dt:.2f} tiles/s "
                      f"({dt / iters * 1e3:.0f} ms/step, "
                      f"compile {compile_s:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} b{batch}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
