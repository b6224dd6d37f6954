"""Classifier inference throughput: the `classify` hot path on TPU.

Measures the full device program the CLI runs per batch — inception
preprocessing (exact u8 percentile norm via the Pallas CDF kernel -> resize
299² -> 3-channel tile -> scaling) fused with the InceptionV3 forward.

Timing: results are forced with a scalar-sum download per call. On the axon
tunnel ``block_until_ready`` does NOT reliably block for small programs
(preprocess-only timings read 0.05 ms for a 512 MB-input program); forcing a
download is the only honest clock. Cross-checked: for the big U-Net forward
both methods agree within 5%.

Usage: python scripts/bench_classifier_infer.py   (TPU, serialized)
"""

import json
import time

import jax
import jax.numpy as jnp

from adipose_tpu.core.jitopts import infer_jit
from adipose_tpu.core.seeding import key_for
from adipose_tpu.models.inception import InceptionV3Classifier
from adipose_tpu.train.trainer_classifier import make_inception_preprocess


def main() -> None:
    print("backend:", jax.devices())
    model = InceptionV3Classifier(dtype=jnp.bfloat16)
    variables = model.init(key_for("bench.cls"), jnp.zeros((1, 299, 299, 3)),
                           train=False)
    params = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    pre = make_inception_preprocess(percentile_norm=True)

    @infer_jit
    def predict(vars_, tiles):
        return model.apply(
            {"params": vars_["params"], "batch_stats": vars_["batch_stats"]},
            pre(tiles), train=False,
        )

    results = {}
    for batch in (64, 128, 256):
        # integer-valued operands generated ON DEVICE (tunnel uploads stall)
        gen = jax.jit(
            lambda k, b=batch: jnp.floor(jax.random.uniform(k, (b, 1024, 1024)) * 256)
        )
        xs = [gen(jax.random.PRNGKey(batch + i)) for i in range(5)]
        for x in xs:
            x.block_until_ready()
        float(jnp.sum(predict(params, xs[0])))  # compile + warm
        ts = []
        for x in xs:
            t0 = time.time()
            float(jnp.sum(predict(params, x)))  # forced download
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        results[batch] = batch / med
        print(f"batch {batch}: {results[batch]:.0f} imgs/s "
              f"(1024² gray -> pallas percentile -> 299² IV3)")

    best = max(results, key=results.get)
    print(json.dumps({
        "metric": "classifier_infer_imgs_per_sec",
        "value": round(results[best], 1),
        "unit": "imgs/s/chip",
        "batch": best,
    }))


if __name__ == "__main__":
    main()
