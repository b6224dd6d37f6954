"""Classifier FULL train-step throughput: u8 1024² tiles → percentile →
augment → resize 299² → fwd+bwd+adam+BN — fused vs split vs pipelined.

VERDICT r2 item 4: the old FUSED u8→norm→aug→resize→train program measured
~360 imgs/s vs the 1 165 imgs/s 299² core step (BASELINE.md r2). This
measures the trainer's new split (_make_preprocess_step + _make_train_step)
serialized vs 1-deep software-pipelined (the trainer loop's semantics), plus
prep-only and core-only bounds, on DEVICE-resident u8 batches — the tunnel's
~3.6 MB/s host→device path would otherwise dominate every variant (measured
13.6 s/step); upload overlap is a claim this link cannot honestly measure.

TPU only; serialize with other TPU scripts.
Usage: python scripts/bench_classifier_full_train.py [batch=32] [iters=8]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.inception import InceptionV3Classifier
    from adipose_tpu.train.state import TrainState
    from adipose_tpu.train.trainer_classifier import (
        _make_preprocess_step,
        _make_train_step,
    )

    print("backend:", jax.devices())
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    model = InceptionV3Classifier(dtype=jnp.bfloat16)
    variables = model.init(key_for("bench.clf.full"), jnp.zeros((1, 299, 299, 3)),
                           train=False)
    tx = optax.adam(1e-3)

    rng = np.random.RandomState(865)
    # DEVICE-resident u8 batches (CLAUDE.md: a 33.5 MB host upload rides the
    # tunnel at ~3.6 MB/s on bad days — 9+ s/step of pure transfer that a
    # real PCIe-attached host never sees; measured 13.6 s/step before this
    # change). Rotating 3 distinct buffers keeps per-iter inputs fresh.
    host_batches = [
        jnp.asarray((rng.rand(batch, 1024, 1024) * 255).astype(np.uint8))
        for _ in range(3)
    ]
    labels = jnp.asarray((rng.rand(batch) > 0.5).astype(np.float32))
    class_w = jnp.asarray([1.0, 1.0], jnp.float32)

    # master copy is never donated; each variant trains on ITS OWN device
    # copy (train_step donates its state — reusing the same arrays across
    # variants poisons them: "TPU backend error (InvalidArgument)")
    master = jax.tree.map(jnp.copy, variables)

    def fresh_state():
        v = jax.tree.map(jnp.copy, master)
        return TrainState.create(params=v["params"], tx=tx,
                                 batch_stats=v["batch_stats"])

    train_step = _make_train_step(model, 0.1, None)
    prep_step = _make_preprocess_step(True, 1.0, 99.0)

    # Pre-split ALL rng keys outside the timed loops: key_for dispatches a
    # tiny device program, and on the axon runtime every extra dispatch in a
    # tight producer->consumer chain costs a visible round-trip (the r2
    # 1 165 imgs/s core bench reused ONE key for the same reason).
    n_keys = iters + 4
    keys = [jax.random.split(key_for("bench.clf.keys", i))
            for i in range(n_keys)]
    for a, d in keys:
        a.block_until_ready()

    def run(label, loop_fn):
        state = fresh_state()
        state = loop_fn(state, 0)  # warmup/compile
        state = loop_fn(state, 1)
        t0 = time.perf_counter()
        for i in range(iters):
            state = loop_fn(state, 2 + i)
        # forced hard sync (axon block_until_ready unreliable on small pulls)
        _ = float(jnp.sum(state.params["adipose_score"]["bias"]))
        dt = time.perf_counter() - t0
        print(f"{label}: {batch * iters / dt:.1f} imgs/s "
              f"({dt / iters * 1e3:.1f} ms/step)")

    # --- (B) split, serialized: prep then train, consumed immediately ---
    def split_serial(state, i):
        aug_key, drop_key = keys[i]
        x = prep_step(host_batches[i % 3], aug_key)
        state, m = train_step(state, x, labels, class_w, drop_key)
        return state

    # --- (C) split + 1-deep pipeline (the trainer's loop) ---
    class Pipe:
        pending = None

    def split_pipelined(state, i):
        aug_key, drop_key = keys[i]
        x = prep_step(host_batches[i % 3], aug_key)
        if Pipe.pending is not None:
            state, m = train_step(state, *Pipe.pending)
        Pipe.pending = (x, labels, class_w, drop_key)
        return state

    # --- (A) old fused single program (r2 behavior), same-day comparison ---
    from functools import partial

    from adipose_tpu.core.jitopts import infer_jit
    from adipose_tpu.data.augment import batched_classification
    from adipose_tpu.train.trainer_classifier import _percentile_norm_255

    @partial(infer_jit, donate_argnums=(0,))
    def fused_step(state, images_u8, labels, class_w, rng_key):
        imgs = images_u8.astype(jnp.float32)
        imgs = _percentile_norm_255(imgs, 1.0, 99.0)
        aug_key, drop_key = jax.random.split(rng_key)
        imgs = batched_classification(aug_key, imgs)
        x = jax.image.resize(imgs[..., None], (imgs.shape[0], 299, 299, 1),
                             "bilinear")
        x = jnp.tile(x, (1, 1, 1, 3)) / 127.5 - 1.0
        return _train_core(state, x, labels, class_w, drop_key)

    # the un-jitted core body (infer_jit dispatchers are trace-aware: plain
    # inside another jit), reused so fused vs split compare the same math
    _train_core = train_step

    fused_keys = [key_for("bench.clf.fused", i) for i in range(iters + 4)]
    for k in fused_keys:
        k.block_until_ready()

    def fused(state, i):
        state, m = fused_step(state, host_batches[i % 3], labels, class_w,
                              fused_keys[i])
        return state

    # the FIRST measured variant in a process reads 4-60× slow regardless of
    # which it is (deferred runtime warmup on top of the 2 in-run warmups;
    # observed fused-first 1 381 ms vs serial-second 370 ms AND
    # serial-first 5.2-30 s vs pipelined-second 130-250 ms) — sacrifice one
    run("discard (process warmup, ignore)", fused)
    run("fused (r2 single program)", fused)
    run("split serial   (prep | train)", split_serial)
    Pipe.pending = None
    run("split pipelined (prep k+1 ahead of train k)", split_pipelined)

    # --- (E) megabatched prep: K train-batches per prep dispatch (r4) ---
    def run_mega(K):
        prep_mb = _make_preprocess_step(True, 1.0, 99.0, batch_size=batch)
        mega = jnp.concatenate([host_batches[i % 3] for i in range(K)])
        mega_keys = [
            jnp.stack([keys[(i * K + k) % n_keys][0] for k in range(K)])
            for i in range(iters + 3)
        ]

        def one(i, state, pending):
            xs = prep_mb(mega, mega_keys[i])
            if pending is not None:
                for k, x in enumerate(pending):
                    state, _m = train_step(state, x, labels, class_w,
                                           keys[(i * K + k) % n_keys][1])
            return state, xs

        state = fresh_state()
        state, pending = one(0, state, None)  # warmup/compile
        state, pending = one(1, state, pending)
        t0 = time.perf_counter()
        for i in range(iters):
            state, pending = one(2 + i, state, pending)
        _ = float(jnp.sum(state.params["adipose_score"]["bias"]))
        dt = time.perf_counter() - t0
        print(f"split pipelined megabatch K={K}: "
              f"{K * batch * iters / dt:.1f} imgs/s "
              f"({dt / iters * 1e3:.1f} ms per {K}-batch mega)")

    run_mega(4)
    run_mega(8)

    # --- core step alone for reference (299² inputs resident) ---
    x299 = prep_step(host_batches[0], key_for("bench.clf.x299"))

    def core_only(state, i):
        state, m = train_step(state, x299, labels, class_w, keys[i][1])
        return state

    # --- (D) pipelined + augment AFTER resize (opt-in, PARITY.md #15) ---
    prep_lr = _make_preprocess_step(True, 1.0, 99.0, augment_low_res=True)

    def split_pipelined_lr(state, i):
        aug_key, drop_key = keys[i]
        x = prep_lr(host_batches[i % 3], aug_key)
        if Pipe.pending is not None:
            state, m = train_step(state, *Pipe.pending)
        Pipe.pending = (x, labels, class_w, drop_key)
        return state

    Pipe.pending = None
    run("split pipelined + aug@299 (opt-in)", split_pipelined_lr)

    run("core only      (299² resident)", core_only)

    # --- prep alone ---
    def prep_only(state, i):
        x = prep_step(host_batches[i % 3], keys[i][0])
        x.block_until_ready()
        return state

    state = fresh_state()
    prep_only(state, 0)
    t0 = time.perf_counter()
    for i in range(iters):
        prep_only(state, 1 + i)
    _ = float(jnp.sum(prep_step(host_batches[0],
                                key_for("bench.clf.prepsync"))[0, 0, 0]))
    dt = time.perf_counter() - t0
    print(f"prep only      (norm/aug/resize, resident u8): "
          f"{batch * iters / dt:.1f} imgs/s ({dt / iters * 1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
