"""One-off: per-fusion profile of the REAL b8 trainer step (the config that
compiles: lane_pad=0, softmax head, combined_loss_standard).

Usage: python scripts/exp_profile_train2.py   (TPU, serialized)
"""
import glob
import gzip
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train.state import (
        TrainState, make_optimizer, unet_loss_from_config)
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    print("backend:", jax.devices())
    TILE, BATCH = 1024, 8
    cfg = TrainConfig()
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    loss_fn = unet_loss_from_config(cfg)
    step = _make_fused_train_step(model, loss_fn, cfg.augment_level,
                                  cfg.normalization_method,
                                  cfg.percentile_low, cfg.percentile_high)
    rng = np.random.RandomState(865)
    key = key_for("train.step")
    mean, std = jnp.float32(200.99), jnp.float32(25.26)
    state = TrainState.create(params=params, tx=tx)
    imgs = jnp.asarray((rng.rand(BATCH, TILE, TILE) * 255).astype(np.uint8))
    masks = jnp.asarray((rng.rand(BATCH, TILE, TILE) > 0.5).astype(np.uint8))

    for _ in range(2):
        state, metrics = step(state, imgs, masks, key, mean, std)
        _ = float(metrics["loss"])

    trace_dir = "/tmp/unet_train_trace2"
    jax.profiler.start_trace(trace_dir)
    state, metrics = step(state, imgs, masks, key, mean, std)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()
    time.sleep(1)

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    print("trace:", files[-1])
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    durs = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            nm = ev.get("name", "")
            durs[nm] = durs.get(nm, 0.0) + ev["dur"] / 1e3
    total = 0.0
    shown = 0
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1]):
        if name.startswith(("jit_", "Pjit", "$", "copy-start", "copy-done",
                            "PythonRefManager", "ParseArguments", "PJRT",
                            "np.asarray", "DevicePut")):
            continue
        total += ms
        if ms >= 2.0 and shown < 45:
            shown += 1
            print(f"{ms:8.2f} ms  {name}")
    print(f"TOTAL device ≈ {total:.1f} ms "
          f"-> {BATCH / total * 1000:.1f} tiles/s")


if __name__ == "__main__":
    main()
