"""U-Net epoch-loop shape: augment consumed immediately vs 1-deep pipeline.

The classifier benchmarks (BASELINE.md r3) showed the axon runtime
intermittently blocks for seconds when a just-dispatched program's output is
consumed by the very next dispatch — the trainer loop's augment→train chain
is exactly that shape (`trainer_unet.py` epoch loop). This measures, with
device-resident u8 batches and pre-split keys (both r3 bench lessons):

  serial     aug k → train k immediately (the current trainer loop)
  pipelined  aug k+1 dispatched BEFORE train k is consumed (1-deep)

b8 1024², the training config (lane_pad=0, softmax head), forced per-step
scalar sync. TPU, serialized. Result decides whether trainer_unet adopts
the pipeline.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.config import TrainConfig
    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train.state import TrainState, make_optimizer, unet_loss_from_config
    from adipose_tpu.train.trainer_unet import _make_fused_train_step, make_augment_step

    print("backend:", jax.devices())
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    TILE = 1024
    cfg = TrainConfig()
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr_phase1, cfg.weight_decay)
    step = _make_fused_train_step(model, unet_loss_from_config(cfg),
                                  cfg.augment_level, cfg.normalization_method,
                                  cfg.percentile_low, cfg.percentile_high)
    augment = make_augment_step(cfg.augment_level)

    rng = np.random.RandomState(865)
    batches = [
        (jnp.asarray((rng.rand(batch, TILE, TILE) * 255).astype(np.uint8)),
         jnp.asarray((rng.rand(batch, TILE, TILE) > 0.7).astype(np.uint8)))
        for _ in range(3)
    ]
    mean, std = jnp.float32(200.99), jnp.float32(25.26)
    n = iters + 4
    keys = [(key_for("bench.aug", i), key_for("bench.step", i)) for i in range(n)]
    for a, b in keys:
        a.block_until_ready()

    def fresh_state():
        params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
        return TrainState.create(params=params, tx=tx)

    def run(label, loop_fn, flush=None):
        state = fresh_state()
        state = loop_fn(state, 0)
        state = loop_fn(state, 1)
        t0 = time.perf_counter()
        for i in range(iters):
            state = loop_fn(state, 2 + i)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": label,
                          "tiles_per_s": round(batch * iters / dt, 2),
                          "ms_per_step": round(dt / iters * 1e3, 1)}))

    def serial(state, i):
        imgs, masks = batches[i % 3]
        ai, am = augment(keys[i][0], imgs, masks)
        state, m = step(state, ai, am, keys[i][1], mean, std)
        return state

    class Pipe:
        pending = None

    def pipelined(state, i):
        imgs, masks = batches[i % 3]
        ai, am = augment(keys[i][0], imgs, masks)
        if Pipe.pending is not None:
            state, m = step(state, *Pipe.pending)
        Pipe.pending = (ai, am, keys[i][1], mean, std)
        return state

    run("discard (process warmup, ignore)", serial)
    run("serial    (aug k -> train k)", serial)
    Pipe.pending = None
    run("pipelined (aug k+1 ahead of train k)", pipelined)


if __name__ == "__main__":
    main()
