"""Classifier (InceptionV3) train-step throughput + spatial-forward TPU
compile check, one serialized TPU run.

Usage: python scripts/bench_classifier_train.py   (TPU, serialized)
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.inception import InceptionV3Classifier
    from adipose_tpu.train.state import TrainState, make_classifier_train_step

    print("backend:", jax.devices())

    # --- classifier train step at 299² (the model's native input) ---
    BATCH = 32
    model = InceptionV3Classifier(dtype=jnp.bfloat16)
    variables = model.init(key_for("bench.clf"), jnp.zeros((1, 299, 299, 3)),
                           train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables["batch_stats"])
    step = make_classifier_train_step(model)
    rng = np.random.RandomState(865)
    imgs = jnp.asarray(rng.rand(BATCH, 299, 299, 3).astype(np.float32) * 2 - 1)
    labels = jnp.asarray((rng.rand(BATCH) > 0.5).astype(np.float32))
    key = key_for("bench.clf.step")

    state, m = step(state, imgs, labels, key)
    _ = float(m["loss"])
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, imgs, labels, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "inceptionv3_train_imgs_per_sec_299px_b32",
        "value": round(BATCH * iters / dt, 1),
        "unit": "imgs/s/chip (fwd+bwd+adam+BN)",
    }))

    # --- spatial (CP) forward compiles + runs on real TPU (1-device mesh) ---
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.parallel.mesh import make_mesh
    from adipose_tpu.parallel.spatial_unet import spatial_unet_predict

    unet = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    params = unet.init(key_for("bench.init"), jnp.zeros((1, 1024, 1024)))
    mesh = make_mesh(1)
    x = jnp.asarray(rng.rand(1, 1024, 1024).astype(np.float32))
    want = unet.apply(params, x, train=False)
    got = spatial_unet_predict(params, x, mesh)
    err = float(jnp.max(jnp.abs(got - want)))
    print(json.dumps({"metric": "spatial_cp_forward_tpu_err", "value": err}))
    assert err < 5e-3


if __name__ == "__main__":
    main()
