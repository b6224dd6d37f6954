"""End-to-end WSI pipeline benchmark: synthetic slide through the real
dual-model cascade (QC -> InceptionV3 gate -> U-Net -> Gaussian blend).

Fills the BASELINE.md "end-to-end WSI seconds" row. Run on TPU, serialized:

    python scripts/bench_wsi.py [slide_px] [overlap] [transfer_dtype]

transfer_dtype: uint8 (default; exact PNG payload, smallest download),
float16, or float32.

Note: host->device transfers here ride the axon tunnel (~80 MB/s); on a
directly-attached TPU host the transfer share shrinks ~100x.
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
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.wsi.pipeline import DualModelWSIPipeline

    # 'multichunk' = 2×2 chunks of 6144² (the reference chunker's primary
    # tile size, large_wsi_to_small_wsi_MS.py:486-514) run back-to-back
    # through one pipeline instance — the gigapixel operating point.
    multichunk = len(sys.argv) > 1 and sys.argv[1] == "multichunk"
    gigapixel = len(sys.argv) > 1 and sys.argv[1] == "gigapixel"
    slide_px = (6144 if (multichunk or gigapixel) else
                int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
    overlap = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    transfer_dtype = sys.argv[3] if len(sys.argv) > 3 else "uint8"
    print("backend:", jax.devices())

    unet = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    seg_params = unet.init(key_for("bench.init"), jnp.zeros((1, 1024, 1024)))
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    @jax.jit
    def seg_predict(params, tiles):
        x = (tiles - mean) / (std + 1e-10)
        return unet.apply(params, x, train=False)

    clf = InceptionV3Classifier(dtype=jnp.bfloat16)
    clf_vars = clf.init(key_for("bench.clf"), jnp.zeros((1, 299, 299, 3)),
                        train=False)

    @jax.jit
    def cls_predict(variables, tiles):
        # 1024 gray -> 299^2 3ch inception input (reference preprocessing)
        x = tiles / 127.5 - 1.0
        x = jax.image.resize(x[..., None], (x.shape[0], 299, 299, 1),
                             method="bilinear")
        x = jnp.tile(x, (1, 1, 1, 3))
        return clf.apply(variables, x, train=False)

    rng = np.random.RandomState(865)
    slide = (rng.rand(slide_px, slide_px) * 180 + 20).astype(np.uint8)

    pipe = DualModelWSIPipeline(
        cls_predict, clf_vars, seg_predict, seg_params,
        tile_size=1024, overlap=overlap, classifier_threshold=0.0,
        transfer_dtype=transfer_dtype,
    )

    res = pipe.run(slide)  # warmup: compiles every stage
    if gigapixel:
        # Full-scale memory-bounded WSI (VERDICT r4 #6): a 4×6 grid of 6144²
        # chunks = 24 576 × 36 864 px = 0.906 GP — past the reference's real
        # ~20k×40k slides (SURVEY §7). Chunks stream through run_many_iter
        # from a LAZY generator; each chunk's probability map is written to
        # disk and dropped as soon as its successors are dispatched, so host
        # RSS stays bounded by ~3 in-flight chunks, not the 3.6 GB full-GP
        # canvas. Peak RSS is reported from ru_maxrss.
        import resource
        import tempfile

        import cv2

        rows, cols = 4, 6
        outdir = tempfile.mkdtemp(prefix="wsi_gp_")

        def chunk_stream():
            for i in range(rows * cols):
                # distinct content per chunk without holding the full slide
                yield np.roll(slide, 97 * i, axis=1)

        t0 = time.perf_counter()
        n_tiles = n_pos = 0
        for i, r in enumerate(pipe.run_many_iter(chunk_stream())):
            pm = np.asarray(r.probability_map)
            img8 = pm if pm.dtype == np.uint8 else \
                np.clip(pm * 255.0 + 0.5, 0, 255).astype(np.uint8)
            cv2.imwrite(f"{outdir}/chunk_{i:02d}.png", img8)
            n_tiles += r.n_tiles
            n_pos += r.n_positive
            del r, pm, img8
        total = time.perf_counter() - t0
        peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        out = {
            "metric": f"wsi_gigapixel_{rows}x{cols}x{slide_px}px_end_to_end_s",
            "transfer_dtype": transfer_dtype,
            "value": round(total, 3),
            "unit": f"s ({rows * cols} chunks, warm programs, run_many_iter)",
            "gigapixels": round(rows * cols * slide_px ** 2 / 1e9, 3),
            "n_tiles": n_tiles,
            "n_positive": n_pos,
            "tiles_per_sec": round(n_tiles / total, 2),
            "peak_host_rss_gb": round(peak_rss_gb, 2),
            "chunk_artifacts": outdir,
        }
        print(json.dumps(out))
        return
    if multichunk:
        # 4 distinct 6144² chunks (one gigapixel-slide quadrant grid),
        # stitched host-side — the multi-chunk flow a real WSI takes after
        # chunk_wsi (each chunk reuses the warmed pipeline programs).
        chunks = [slide,
                  np.ascontiguousarray(slide[::-1]),
                  np.ascontiguousarray(slide[:, ::-1]),
                  np.ascontiguousarray(slide[::-1, ::-1])]
        t0 = time.perf_counter()
        results = [pipe.run(c) for c in chunks]
        serial_total = time.perf_counter() - t0
        # pipelined multi-chunk driver: chunk k+1 dispatches while chunk
        # k's stripe downloads + host assembly drain (wsi/pipeline.run_many)
        t0 = time.perf_counter()
        piped = pipe.run_many(chunks)
        total = time.perf_counter() - t0
        # second serial pass AFTER the pipelined one: the axon runtime's
        # first-measured-variant penalty (CLAUDE.md) would otherwise flatter
        # whichever variant runs second — report serial as the best of the
        # two orderings.
        t0 = time.perf_counter()
        results2 = [pipe.run(c) for c in chunks]
        serial2_total = time.perf_counter() - t0
        for r, r2 in zip(results, results2):
            assert np.array_equal(r.probability_map, r2.probability_map)
        serial_best = min(serial_total, serial2_total)
        for r, p in zip(results, piped):
            assert np.array_equal(r.probability_map, p.probability_map)
        full = np.empty((2 * slide_px, 2 * slide_px), np.float32)
        for i, r in enumerate(piped):
            y, x = divmod(i, 2)
            full[y * slide_px:(y + 1) * slide_px,
                 x * slide_px:(x + 1) * slide_px] = r.probability_map
        n_tiles = sum(r.n_tiles for r in piped)
        out = {
            "metric": f"wsi_multichunk_2x2x{slide_px}px_end_to_end_s",
            "transfer_dtype": transfer_dtype,
            "value": round(total, 3),
            "unit": "s (4 chunks, warm programs, pipelined run_many)",
            "serial_runs_s": round(serial_best, 3),
            "serial_before_after_s": [round(serial_total, 3),
                                      round(serial2_total, 3)],
            "gigapixels": round((2 * slide_px) ** 2 / 1e9, 3),
            "n_tiles": n_tiles,
            "n_positive": sum(r.n_positive for r in piped),
            "tiles_per_sec": round(n_tiles / total, 2),
            "per_chunk_timings": [
                {k: round(v, 3) for k, v in r.timings.items()
                 if k not in ("striped", "pipelined")}
                for r in piped],
        }
        print(json.dumps(out))
        return
    totals = []
    for _ in range(3):  # tunnel transfer throughput swings 2-8x run to run
        t0 = time.perf_counter()
        res = pipe.run(slide)
        totals.append(time.perf_counter() - t0)
    total = sorted(totals)[1]
    out = {
        "metric": f"wsi_{slide_px}px_end_to_end_s",
        "transfer_dtype": transfer_dtype,
        "value": round(total, 3),
        "unit": "s (median of 3)",
        "all_runs_s": [round(t, 3) for t in totals],
        "n_tiles": res.n_tiles,
        "n_positive": res.n_positive,
        "tiles_per_sec": round(res.n_tiles / total, 2),
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
