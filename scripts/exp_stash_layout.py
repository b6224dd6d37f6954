"""VERDICT r2 item 6: attack the ~95 ms of compression-remat layout copies.

The b8 1024² train step spends ~18% in XLA `copy.*` ops — the compiler
spills the level-1 bf16 stashes (conv-preferred {3,0,2,1} layout, 44ch
lane-padded to 128 → 2.9× physical) by re-laying them to dense {2,1,3,0}
and back (BASELINE.md r2 profile). Untried angles, measured here on the
real fused train step by monkeypatching the model's `checkpoint_name` tag
hook (models/unet.py:312 — every level-1 stash flows through it):

  base      tags as-is (identity) — reproduces the r2 ~15.2 tiles/s
  pin       pin_default_layout at stash time (verdict suggestion (a)):
            anchor the stash to the default C-minor layout so XLA stores one
            honest copy instead of a compress/uncompress pair
  pin-T     transpose (B,H,W,C)->(B,C,H,W), pin (W minor-most = truly dense,
            no lane padding), transpose back — the stash XLA keeps may then
            be the dense intermediate

Each variant: compile + 2 warmup + 6 timed steps, forced scalar sync.
TPU, serialized. Results -> BASELINE.md (positive or negative).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import adipose_tpu.models.unet as U
    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.ops.pallas.layout import pin_default_layout_grad as pin_default_layout
    from adipose_tpu.train.state import TrainState, make_optimizer, unet_loss_from_config
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    print("backend:", jax.devices())
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    TILE = 1024
    cfg = TrainConfig()
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    rng = np.random.RandomState(865)
    imgs = (rng.rand(batch, TILE, TILE) * 255).astype(np.uint8)
    masks = (rng.rand(batch, TILE, TILE) > 0.7).astype(np.uint8)
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    orig_tag = U.checkpoint_name

    def tag_pin(x, name):
        return pin_default_layout(orig_tag(x, name))

    def tag_pin_t(x, name):
        xt = jnp.transpose(orig_tag(x, name), (0, 3, 1, 2))
        return jnp.transpose(pin_default_layout(xt), (0, 2, 3, 1))

    def measure(label, tag_fn):
        U.checkpoint_name = tag_fn
        try:
            # trainers build the model inside _make_fused_train_step; the
            # module-level model class reads U.checkpoint_name at trace time
            model = U.DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                                  lane_pad=0, fast_head=False)
            step = _make_fused_train_step(model, loss_fn, cfg.augment_level,
                                          cfg.normalization_method,
                                          cfg.percentile_low, cfg.percentile_high)
            params = model.init(key_for("exp.stash"), jnp.zeros((1, TILE, TILE)))
            state = TrainState.create(params=params, tx=tx)
            di = jnp.asarray(imgs)
            dm = jnp.asarray(masks)
            for i in range(2):
                state, m = step(state, di, dm, key_for("w", i), mean, std)
                _ = float(m["loss"])
            iters = 6
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = step(state, di, dm, key_for("t", i), mean, std)
                _ = float(m["loss"])  # forced sync each step
            dt = time.perf_counter() - t0
            print(json.dumps({
                "variant": label,
                "tiles_per_s": round(batch * iters / dt, 2),
                "ms_per_step": round(dt / iters * 1e3, 1),
            }))
        except Exception as e:  # compile OOM etc. — a measured negative
            print(json.dumps({"variant": label, "error": str(e)[:300]}))
        finally:
            U.checkpoint_name = orig_tag

    measure("base (identity tags)", orig_tag)
    measure("pin_default_layout at stash", tag_pin)
    measure("transpose+pin (dense, no lane pad)", tag_pin_t)


if __name__ == "__main__":
    main()
