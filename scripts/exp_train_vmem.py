"""One-off: does a bigger scoped-VMEM budget help the TRAIN step?

Context: 32 MiB scoped VMEM bought the inference forward 88.7 -> 93.1 tiles/s
(core/jitopts.py). The b8 train step is memory-bound (~100 ms of XLA
remat-compression copies, BASELINE.md) — a bigger fusion budget could either
shrink those copies or blow the tighter training memory envelope. Measure,
don't guess.

Usage: python scripts/exp_train_vmem.py [batch] [budget_kib...]
       (TPU, serialized; budget 0 = compiler default; repeats allowed)
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
        TrainState, make_optimizer, unet_loss_from_config)
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    print("backend:", jax.devices())
    TILE = 1024
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = TrainConfig()
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    base = _make_fused_train_step(model, loss_fn, cfg.augment_level,
                                  cfg.normalization_method,
                                  cfg.percentile_low, cfg.percentile_high)
    fn = base.__wrapped__  # re-jit the same step under different options

    rng = np.random.RandomState(865)
    key = key_for("train.step")
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    budgets = ([None if int(a) == 0 else int(a) for a in sys.argv[2:]]
               or [None, 32768, 65536])
    for kib in budgets:
        opts = None if kib is None else {
            "xla_tpu_scoped_vmem_limit_kib": str(kib)}
        step = jax.jit(fn, donate_argnums=(0,),
                       static_argnames=("augment",),
                       compiler_options=opts)
        label = "default" if kib is None else f"{kib // 1024}MiB"
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
            iters = max(4, 96 // batch)
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, imgs, masks, key, mean, std)
            _ = float(metrics["loss"])
            dt = time.perf_counter() - t0
            print(f"b{batch} vmem={label}: {batch * iters / dt:.2f} tiles/s "
                  f"({dt / iters * 1e3:.0f} ms/step, compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"b{batch} vmem={label}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
