#!/usr/bin/env python
"""Measure the REFERENCE implementation's segmentation throughput on this host.

The reference publishes no numbers (BASELINE.md); bench.py's ``vs_baseline``
divides by a documented 5 tiles/s GPU *estimate*. With tf_keras in-env the
reference's actual eval loop can finally be timed — on CPU (no CUDA here), so
the result is a measured CPU floor, reported separately from the GPU estimate.

Measures, at the production operating point (init_nb=44, 1024² tiles):
  * per-tile ``model.predict`` loop — the reference's eval path
    (``full_evaluation_enhanced.py:1319-1327`` predicts one tile per call);
  * batched ``model(x)`` forward at b=4 — the kindest-to-TF comparison;
  * ``train_on_batch`` at batch 2 with the production compile (Adam lr=1e-4,
    OHEM ratio 0.7) — the reference's fit step
    (``train_adipose_unet_v3.py:1316-1324``, production batch sizes 2–4 per
    ``:1471-1487``) — the measured TRAIN denominator (VERDICT r3 item 3).

Writes scripts/reference_tf_bench.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from tf_oracle_util import load_reference_unet_module

    ref = load_reference_unet_module()
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cwd = os.getcwd()
        os.chdir(td)
        try:
            m = ref.AdiposeUNetV3(checkpoint_name="bench", use_deep_supervision=False,
                                  build_timestamp="20260101_000000")
            net = m.build_model(init_nb=44)
        finally:
            os.chdir(cwd)

    rs = np.random.RandomState(0)
    tile = rs.standard_normal((1, 1024, 1024)).astype(np.float32)

    # per-tile predict loop (reference eval path)
    net.predict(tile, verbose=0)  # warmup/trace
    n = 4
    t0 = time.time()
    for _ in range(n):
        net.predict(tile, verbose=0)
    predict_s = (time.time() - t0) / n

    # batched direct call
    batch = np.repeat(tile, 4, axis=0)
    net(batch, training=False)  # warmup
    t0 = time.time()
    for _ in range(2):
        out = net(batch, training=False)
    _ = np.asarray(out)
    batched_s = (time.time() - t0) / 2

    # train step at batch 2, production compile (Adam lr=1e-4, OHEM 0.7)
    m.unfreeze_encoder()
    m.compile_model(lr=1e-4, use_hard_mining=True, hard_example_ratio=0.7)
    xb = np.repeat(tile, 2, axis=0)
    yb = (rs.rand(2, 1024, 1024) > 0.7).astype(np.float32)
    net.train_on_batch(xb, yb)  # warmup/trace
    n = 3
    t0 = time.time()
    for _ in range(n):
        net.train_on_batch(xb, yb)
    train_s = (time.time() - t0) / n

    result = {
        "host": "cpu (no CUDA in env)",
        "model": "AdiposeUNetV3 init_nb=44, 1024², non-DS",
        "predict_per_tile_s": round(predict_s, 3),
        "predict_tiles_per_s": round(1.0 / predict_s, 3),
        "batched4_s": round(batched_s, 3),
        "batched4_tiles_per_s": round(4.0 / batched_s, 3),
        "train_b2_step_s": round(train_s, 3),
        "train_b2_tiles_per_s": round(2.0 / train_s, 3),
        "tf": __import__("tensorflow").__version__,
    }
    out_path = os.path.join(os.path.dirname(__file__), "reference_tf_bench.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
