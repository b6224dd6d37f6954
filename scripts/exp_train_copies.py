"""One-off: what are the ~95 ms of copy.* ops in the b8 train step?

Compiles the real fused train step (lane_pad=0, softmax head — the config
that trains) and prints every `copy` / `copy-start` instruction in the
optimized HLO with its shape, layout, and size, so the 2026-08-18 trace's
copy.68..copy.97 + *.remat_{compressed,uncompressed} family can be
attributed to concrete buffers.

Usage: python scripts/exp_train_copies.py   (TPU, serialized)
"""
import re


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

    lowered = step.tuned.lower(state, imgs, masks, key, mean, std)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print("HLO chars:", len(txt))

    def nbytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.groups()
        sz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
              "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8}
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * sz.get(dt, 4)

    total = 0
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]*copy[\w.\-]*) = (\S+?\{[^}]*\}|\S+) copy\(",
                     ls)
        if not m:
            continue
        name, shape = m.groups()
        b = nbytes(shape)
        total += b
        rows.append((b, name, shape))
    rows.sort(reverse=True)
    for b, name, shape in rows[:40]:
        print(f"{b/1e6:9.1f} MB  {name:40s} {shape}")
    print(f"copies: {len(rows)}, total {total/1e9:.2f} GB "
          f"(~{total*2/820e9*1e3:.1f} ms at 820 GB/s r+w)")

    # memory stats
    try:
        ms = compiled.memory_analysis()
        print("temp_size:", getattr(ms, "temp_size_in_bytes", None),
              "argument_size:", getattr(ms, "argument_size_in_bytes", None),
              "output_size:", getattr(ms, "output_size_in_bytes", None))
    except Exception as e:
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()
