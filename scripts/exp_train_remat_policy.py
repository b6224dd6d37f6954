"""One-off: does rematerializing the level-1 stashes beat XLA's copies?

Round-2 profile (BASELINE.md): the b8 1024² train step spends ~95 ms in
layout-transpose + compression-remat copies on level-1-scale buffers, and
its temps fill HBM (16.96 GB). This measures the alternative: drop exactly
the level-1 activation stashes via jax.checkpoint with
save_anything_except_these_names(LEVEL1_CHECKPOINT_NAMES) — ~5 recomputed
1024² convs (~45 ms) in exchange for the copies.

Usage: python scripts/exp_train_remat_policy.py  (TPU, serialized)

RESULT (2026-08-18, v5e, b8 1024²): NEGATIVE — keep the XLA default.
  baseline  compile 57s  copies=54 (24.71 GB)  temps=16.96 GB
            548.7 ms/step -> 14.58 tiles/s   (tags are free: same
            copies/temps as the untagged profile in exp_train_copies.py)
  all / decoder / encoder / tail: COMPILE OOM, 20.3-20.7 GB program HBM
            vs 15.75 GB capacity — for every tag subset, jax.checkpoint
            replays the dropped level-1 chain as one bulk
            transpose(jvp(...)) region whose live set (2 GB select_n
            dropout applications + 352 MB pred relu masks, see
            /tmp/dec_oom.log pattern) peaks far above the ~95 ms of
            compression-remat copies it was meant to remove. XLA's own
            compress-to-bf16 spilling is strictly better here.
"""
import re
import time


def copy_bytes(txt):
    sz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "f16": 2}
    total, n = 0, 0
    for line in txt.splitlines():
        m = re.match(r"%?[\w.\-]*copy[\w.\-]* = (\w+)\[([\d,]*)\][^=]*copy\(",
                     line.strip())
        if not m:
            continue
        dt, dims = m.groups()
        b = sz.get(dt, 4)
        for d in dims.split(","):
            if d:
                b *= int(d)
        total += b
        n += 1
    return n, total


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.jitopts import train_jit
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet, level1_remat_policy
    from adipose_tpu.ops import losses as L
    from adipose_tpu.ops.normalize import batched_percentile_unit_fast
    from adipose_tpu.train.state import (
        TrainState, make_optimizer, unet_loss_from_config)

    print("backend:", jax.devices())
    TILE, BATCH = 1024, 8
    cfg = TrainConfig()
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    rng = np.random.RandomState(865)
    key = key_for("train.step")
    imgs = jnp.asarray((rng.rand(BATCH, TILE, TILE) * 255).astype(np.uint8))
    masks = jnp.asarray((rng.rand(BATCH, TILE, TILE) > 0.5).astype(np.uint8))

    def make_step(policy):
        def fwd(params, images, drop_key):
            return model.apply(params, images, train=True,
                               rngs={"dropout": drop_key})

        fwd_c = jax.checkpoint(fwd, policy=policy) if policy else fwd

        @partial(train_jit, donate_argnums=(0,))
        def step(state, images_u8, masks_u8, rng):
            images = batched_percentile_unit_fast(
                images_u8.astype(jnp.float32), cfg.percentile_low,
                cfg.percentile_high)
            m = masks_u8.astype(jnp.float32)

            def compute(params):
                out = fwd_c(params, images, rng)
                main = out["main_out"] if isinstance(out, dict) else out
                return loss_fn(m, out), main

            (loss, main), grads = jax.value_and_grad(
                compute, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads)
            return new_state, {"loss": loss,
                               "dice_coef": L.dice_coef(m, main)}

        return step

    import sys

    drop = jax.checkpoint_policies.save_anything_except_these_names
    VARIANTS = {
        "baseline": None,
        # full drop: OOMs at compile (20.67G) — bulk recompute of the whole
        # level-1 chain peaks worse than the copies it removes (2026-08-18)
        "all": level1_remat_policy(),
        "decoder": drop("l1.up1_conv1", "l1.up1_conv2", "l1.up1_conv3",
                        "l1.up1"),
        "encoder": drop("l1.down1_conv1", "l1.down1_conv2"),
        "tail": drop("l1.up1_conv3", "l1.up1"),
    }
    names = sys.argv[1:] or ["baseline", "all"]
    for label in names:
        policy = VARIANTS[label]
        step = make_step(policy)
        state = TrainState.create(params=params, tx=tx)
        t0 = time.time()
        lowered = step.tuned.lower(state, imgs, masks, key)
        try:
            compiled = lowered.compile()
        except Exception as e:
            lines = str(e).splitlines()
            head = [ln for ln in lines if "memory" in ln.lower()
                    or "hbm" in ln.lower()][:4] or lines[:6]
            print(f"[{label}] COMPILE FAILED after {time.time()-t0:.0f}s: "
                  + " | ".join(ln.strip()[:120] for ln in head), flush=True)
            continue
        n, b = copy_bytes(compiled.as_text())
        ms = compiled.memory_analysis()
        print(f"[{label}] compile {time.time()-t0:.0f}s  copies={n} "
              f"({b/1e9:.2f} GB)  temps={ms.temp_size_in_bytes/1e9:.2f} GB",
              flush=True)
        for _ in range(3):
            state, metrics = step(state, imgs, masks, key)
            _ = float(metrics["loss"])
        times = []
        for _ in range(10):
            t0 = time.time()
            state, metrics = step(state, imgs, masks, key)
            _ = float(metrics["loss"])
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"[{label}] median {med*1e3:.1f} ms/step -> "
              f"{BATCH/med:.2f} tiles/s  (min {min(times)*1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
