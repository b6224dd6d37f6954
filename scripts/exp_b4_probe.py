"""Minimal-repro probe for the b4(-b7) train-compile crash (VERDICT r3 #4).

At 1024² the fused train step compiles at b2 and b8 but the remote
tpu_compile_helper dies (SIGKILL — compile-time OOM; earlier runs reported
20.8 GB of HLO temps) at b4, b5, b6, b7 — with or without remat /
remat_level1 / lane_pad (exp_b4_fixes.py, exp_remat_level1.py). This script
bisects WHERE: grad-compiles of progressively larger model prefixes and of
the isolated suspect convs, all at b4 1024².

Each probe is its own tiny program; a probe that compiles prints its step
time, one that crashes prints the failure — the smallest crashing probe is
the repro. Also measures the one remaining workaround candidate: duplicate
the 4 real tiles to fill a b8 step. This is an approximation, not the exact
b4 gradient: the fused step draws per-sample augmentations, so the two
copies get different draws and the grad averages two augmentation draws per
tile (arguably lower-variance). Measures effective real-tiles/s against the
8.1 full-remat fallback.

Usage: python scripts/exp_b4_probe.py   (TPU, serialized)
"""
import time

import numpy as np


def main():
    import sys as _sys

    from adipose_tpu.core import watchdog

    if not watchdog.probe_device(180):  # cold tunnel init alone can take ~2 min
        _sys.exit("TPU tunnel wedged (probe_device timeout); not starting")
    watchdog.arm(900, "b4 probe: device wedged during import/init")

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet, FusedUpsampleConv

    print("backend:", jax.devices())
    B, S = 4, 1024
    key = key_for("b4probe")
    rng = np.random.RandomState(0)

    def probe(name, make_fn, *shapes):
        """Compile grad of sum(fn(params, *xs)) over the given input shapes."""
        # re-arm per probe: each remote compile is 1-5 min on its own, and a
        # single whole-run budget would let a healthy-but-slow run be killed
        watchdog.arm(900, f"b4 probe[{name}]: device wedged")
        try:
            model, apply = make_fn()
            xs = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in shapes]
            params = model.init(key, *xs)

            def loss(p, *a):
                out = apply(model, p, *a)
                out = out[0] if isinstance(out, tuple) else out
                return jnp.sum(out.astype(jnp.float32))

            g = jax.jit(jax.grad(loss))
            t0 = time.perf_counter()
            r = g(params, *xs)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = g(params, *xs)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
            print(f"{name}: ok (compile {dt:.0f}s, step "
                  f"{(time.perf_counter() - t0) * 1e3:.0f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: CRASH {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

    bf = jnp.bfloat16

    class Enc1(nn.Module):        # down1 block alone, full res
        @nn.compact
        def __call__(self, x):
            x = x.astype(bf)
            x = nn.relu(nn.Conv(44, (3, 3), dtype=bf)(x))
            return nn.relu(nn.Conv(44, (3, 3), dtype=bf)(x))

    class Enc2(nn.Module):        # + pool + down2 (44→88 at 512²)
        @nn.compact
        def __call__(self, x):
            x = Enc1()(x)
            p = nn.max_pool(x, (2, 2), strides=(2, 2))
            p = nn.relu(nn.Conv(88, (3, 3), dtype=bf)(p))
            return nn.relu(nn.Conv(88, (3, 3), dtype=bf)(p))

    class Dec1(nn.Module):        # up1 stage alone from (skip, y512)
        @nn.compact
        def __call__(self, skip, y):
            skip, y = skip.astype(bf), y.astype(bf)
            y = nn.relu(FusedUpsampleConv(44, bf)(y))
            y = jnp.concatenate([skip, y], axis=-1)
            y = nn.relu(nn.Conv(44, (3, 3), dtype=bf)(y))
            return nn.relu(nn.Conv(44, (3, 3), dtype=bf)(y))

    class MiniUNet(nn.Module):    # two-level U-Net, full res, 44/88 channels
        @nn.compact
        def __call__(self, x):
            x = x.astype(bf)
            d1 = Enc1()(x)
            p = nn.max_pool(d1, (2, 2), strides=(2, 2))
            d2 = nn.relu(nn.Conv(88, (3, 3), dtype=bf)(p))
            u = Dec1()(d1, d2)
            return nn.Conv(2, (1, 1), dtype=bf)(u)

    mk = lambda cls: (lambda: (cls(), lambda m, p, *a: m.apply(p, *a)))
    probe("enc1 (2 convs @1024²×44)", mk(Enc1), (B, S, S, 1))
    probe("enc2 (+pool+down2)", mk(Enc2), (B, S, S, 1))
    probe("dec1 (upconv+concat+2 convs)", mk(Dec1),
          (B, S, S, 44), (B, S // 2, S // 2, 88))
    probe("mini-unet (2-level)", mk(MiniUNet), (B, S, S, 1))

    def mk_full():
        m = DilatedUNet(init_nb=44, compute_dtype=bf, lane_pad=0,
                        fast_head=False)
        return m, (lambda mdl, p, x: mdl.apply(p, x))

    probe("full model fwd+bwd (no opt/loss)", mk_full, (B, S, S))

    # ---- workaround: pad b4→b8 with masked loss, measure effective rate
    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.train.state import (
        TrainState, make_optimizer, unet_loss_from_config)
    from adipose_tpu.train.trainer_unet import _make_fused_train_step

    cfg = TrainConfig()
    model = DilatedUNet(init_nb=44, compute_dtype=bf, lane_pad=0,
                        fast_head=False)
    step = _make_fused_train_step(model, unet_loss_from_config(cfg),
                                  cfg.augment_level, cfg.normalization_method,
                                  cfg.percentile_low, cfg.percentile_high)
    params = model.init(key_for("bench.init"), jnp.zeros((1, S, S)))
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    state = TrainState.create(params=params, tx=tx)
    watchdog.arm(900, "b4 probe[duplicated-b8]: device wedged")
    imgs4 = (rng.rand(4, S, S) * 255).astype(np.uint8)
    masks4 = (rng.rand(4, S, S) > 0.5).astype(np.uint8)
    # duplicate the 4 real tiles to fill b8 — an approximation: per-sample
    # augmentation keys differ between the copies, so the grad is a 2-draw
    # average per tile rather than the exact b4 grad (see module docstring)
    imgs8 = jnp.asarray(np.concatenate([imgs4, imgs4]))
    masks8 = jnp.asarray(np.concatenate([masks4, masks4]))
    mean, std = jnp.float32(200.99), jnp.float32(25.26)
    t0 = time.perf_counter()
    state, m = step(state, imgs8, masks8, key, mean, std)
    _ = float(m["loss"])
    print(f"b4-as-duplicated-b8: compile {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        state, m = step(state, imgs8, masks8, key, mean, std)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 4
    print(f"b4-as-duplicated-b8: {4 / dt:.2f} REAL tiles/s "
          f"({dt * 1e3:.0f} ms/step; fallback-remat b4 is 8.1)", flush=True)
    watchdog.disarm()


if __name__ == "__main__":
    main()
