"""Stage-3 b4 minimal-repro probe (follows exp_b4_probe / exp_b4_flags).

Stage 2 found the crash threshold is between 2 and 3 U-Net levels at b4
1024²: the 2-level mini (44/88ch, FusedUpsampleConv) compiles, the 3-level
plain net (resize-upsample) crashes. This stage isolates WHICH added piece
crashes, using the model's own blocks (FusedUpsampleConv, not resize):

  enc3   — encoder through level 3 (adds pool + 176ch double conv @256²)
  dec2   — level-2 decoder stage alone (skip 88@512², y 176@256²)
  dec12  — two-stage decoder chain from given features
  mini3  — full 3-level U-Net, model-idiom blocks
  mini3-opt1 — if mini3 crashes: retry with xla_backend_optimization_level=1

The smallest crasher is the pinned repro for BASELINE.md.
Usage: python scripts/exp_b4_min.py (TPU, serialized)
"""
import time

import numpy as np


def main():
    import sys as _sys

    from adipose_tpu.core import watchdog

    if not watchdog.probe_device(180):
        _sys.exit("TPU tunnel wedged (probe_device timeout); not starting")
    watchdog.arm(900, "b4 min probe: device wedged during init")

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import FusedUpsampleConv

    print("backend:", jax.devices())
    B, S = 4, 1024
    key = key_for("b4min")
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def dconv(x, nb):
        x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
        return nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))

    class Enc2(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x[..., None].astype(bf) if x.ndim == 3 else x.astype(bf)
            d1 = dconv(x, 44)
            d2 = dconv(nn.max_pool(d1, (2, 2), strides=(2, 2)), 88)
            return d1, d2

    class Enc3(nn.Module):
        @nn.compact
        def __call__(self, x):
            d1, d2 = Enc2()(x)
            d3 = dconv(nn.max_pool(d2, (2, 2), strides=(2, 2)), 176)
            return d1, d2, d3

    class Dec2(nn.Module):        # 256²→512² stage alone
        @nn.compact
        def __call__(self, skip, y):
            skip, y = skip.astype(bf), y.astype(bf)
            y = nn.relu(FusedUpsampleConv(88, bf)(y))
            return dconv(jnp.concatenate([skip, y], axis=-1), 88)

    class Dec12(nn.Module):       # both decoder stages from given features
        @nn.compact
        def __call__(self, d1, d2, d3):
            u2 = Dec2()(d2, d3)
            u1 = nn.relu(FusedUpsampleConv(44, bf)(u2))
            u1 = dconv(jnp.concatenate([d1.astype(bf), u1], axis=-1), 44)
            return nn.Conv(2, (1, 1), dtype=bf)(u1)

    class Mini3(nn.Module):       # full 3-level, model-idiom blocks
        @nn.compact
        def __call__(self, x):
            d1, d2, d3 = Enc3()(x)
            return Dec12()(d1, d2, d3)

    def probe(name, model, shapes, options=None):
        watchdog.arm(900, f"b4 min[{name}]: device wedged")
        try:
            xs = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in shapes]
            params = model.init(key, *xs)

            def loss(p, *a):
                out = model.apply(p, *a)
                out = out[-1] if isinstance(out, tuple) else out
                return jnp.sum(out.astype(jnp.float32))

            g = (jax.jit(jax.grad(loss), compiler_options=options)
                 if options else jax.jit(jax.grad(loss)))
            t0 = time.perf_counter()
            r = g(params, *xs)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
            print(f"{name}: OK (compile {time.perf_counter() - t0:.0f}s)",
                  flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"{name}: CRASH {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return False

    probe("enc3 (3-level encoder)", Enc3(), [(B, S, S)])
    probe("dec2 (one decoder stage @512²)", Dec2(),
          [(B, S // 2, S // 2, 88), (B, S // 4, S // 4, 176)])
    probe("dec12 (decoder chain from features)", Dec12(),
          [(B, S, S, 44), (B, S // 2, S // 2, 88), (B, S // 4, S // 4, 176)])
    ok = probe("mini3 (3-level, model blocks)", Mini3(), [(B, S, S)])
    if not ok:
        probe("mini3 + opt-level 1", Mini3(), [(B, S, S)],
              options={"xla_backend_optimization_level": "1"})
    watchdog.disarm()


if __name__ == "__main__":
    main()
