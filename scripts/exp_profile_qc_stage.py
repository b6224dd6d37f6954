"""Profile the WSI pipeline's QC+classify stage (VERDICT r2 weak #3).

At 4096²/25 tiles the stage measured 0.53 s while its core compute is ~16 ms
(classify at 1 530 imgs/s) — ~30× overhead. This breaks the stage into its
pieces to find the dominant term before changing pipeline.py:

  A  extract_tiles gather only (dispatch, no download)
  B  + f32 cast
  C  + QC (classify_tiles_batch)
  D  + classifier forward
  E  full loop exactly as pipeline.run does it (incl. per-chunk device
     slicing r[:n] and the end-of-loop per-chunk np.asarray downloads)
  F  same but ONE fused jit per chunk and ONE stacked download at the end

Each variant is timed over the whole 25-tile/2-chunk stage, median of 3,
forced sync via scalar download. TPU, serialized.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.inception import InceptionV3Classifier
    from adipose_tpu.ops.blend import extract_tiles, sliding_window_positions
    from adipose_tpu.ops.qc import classify_tiles_batch

    slide_px = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print("backend:", jax.devices())

    t = 1024
    b = 16
    qc_args = (235.0, 0.70, 7.5)

    clf = InceptionV3Classifier(dtype=jnp.bfloat16)
    clf_vars = clf.init(key_for("bench.clf"), jnp.zeros((1, 299, 299, 3)),
                        train=False)

    @jax.jit
    def cls_predict(variables, tiles):
        x = tiles / 127.5 - 1.0
        x = jax.image.resize(x[..., None], (x.shape[0], 299, 299, 1),
                             method="bilinear")
        x = jnp.tile(x, (1, 1, 1, 3))
        return clf.apply(variables, x, train=False)

    rng = np.random.RandomState(865)
    slide = (rng.rand(slide_px, slide_px) * 180 + 20).astype(np.uint8)
    positions = np.asarray(sliding_window_positions(slide.shape, t, 0.25), np.int32)
    n_tiles = len(positions)
    slide_dev = jnp.asarray(slide)
    slide_dev.block_until_ready()
    print(f"{n_tiles} tiles, chunks of {b}")

    def chunk_indices():
        for i in range(0, n_tiles, b):
            idx = np.arange(n_tiles)[i : i + b]
            n = len(idx)
            yield np.pad(idx, (0, b - n), mode="edge"), n

    def timeit(label, fn, reps=3):
        fn()  # warmup/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"variant": label, "s": round(sorted(ts)[1], 4),
                          "all": [round(x, 4) for x in ts]}))

    def sync(x):
        _ = float(jnp.sum(x))

    # A: gather only
    def a():
        outs = []
        for idx, n in chunk_indices():
            outs.append(extract_tiles(slide_dev, jnp.asarray(positions[idx]), t))
        sync(outs[-1][0, :8, :8])

    # B: + cast
    def bfn():
        outs = []
        for idx, n in chunk_indices():
            c = extract_tiles(slide_dev, jnp.asarray(positions[idx]), t)
            outs.append(c.astype(jnp.float32))
        sync(outs[-1][0, :8, :8])

    # C: + qc
    def c():
        outs = []
        for idx, n in chunk_indices():
            cf = extract_tiles(slide_dev, jnp.asarray(positions[idx]), t).astype(jnp.float32)
            outs.append(classify_tiles_batch(cf, *qc_args)["is_good"])
        sync(outs[-1].astype(jnp.float32))

    # D: + classifier
    def d():
        outs = []
        for idx, n in chunk_indices():
            cf = extract_tiles(slide_dev, jnp.asarray(positions[idx]), t).astype(jnp.float32)
            outs.append((classify_tiles_batch(cf, *qc_args)["is_good"],
                         cls_predict(clf_vars, cf)))
        sync(outs[-1][1])

    # E: the pipeline's current loop, downloads included
    def e():
        dev_outs = []
        for idx, n in chunk_indices():
            cf = extract_tiles(slide_dev, jnp.asarray(positions[idx]), t).astype(jnp.float32)
            r = (classify_tiles_batch(cf, *qc_args)["is_good"],
                 cls_predict(clf_vars, cf))
            dev_outs.append([x[:n] for x in r])
        good = np.concatenate([np.asarray(o[0]) for o in dev_outs])
        probs = np.concatenate([np.asarray(o[1]) for o in dev_outs])
        return good, probs

    # F: one fused program per chunk + one stacked download
    @jax.jit
    def fused(slide_d, pos):
        cf = extract_tiles(slide_d, pos, t).astype(jnp.float32)
        return jnp.stack([
            classify_tiles_batch(cf, *qc_args)["is_good"].astype(jnp.float32),
            cls_predict(clf_vars, cf).astype(jnp.float32),
        ])

    def f():
        outs = []
        for idx, n in chunk_indices():
            outs.append(fused(slide_dev, jnp.asarray(positions[idx])))
        flat = np.asarray(jnp.concatenate(outs, axis=1))  # ONE download
        good = flat[0, :n_tiles] > 0.5
        probs = flat[1, :n_tiles]
        return good, probs

    timeit("A gather", a)
    timeit("B +cast", bfn)
    timeit("C +qc", c)
    timeit("D +classify", d)
    timeit("E pipeline loop (per-chunk downloads)", e)
    timeit("F fused + single download", f)

    # cross-check identical decisions
    ge, pe = e()
    gf, pf = f()
    assert np.array_equal(ge, gf), "QC mismatch"
    print("max prob delta e vs f:", float(np.abs(pe - pf).max()))


if __name__ == "__main__":
    main()
