"""Where does the b8 'moderate' augmentation program spend its time?

History: the original vmap(per-sample-tier) form measured 916 ms/batch
(8.7 tiles/s) at b8 1024² with forced-download timing — 786 ms of it the
rot90/flip stage, because vmapped lax.switch rotations make XLA pick a
batch-minor {0,2,1} layout (B=8 padded into the 128-lane dim, 16×) that
infects every downstream fusion (one ablation couldn't even allocate:
23.5 GB of 512 MB-padded temps). The batched-D4 rewrite
(ops/d4.py:apply_transform_batch) is the fix; this script measures the
production program (make_augment_step — u8 inputs, as the trainer feeds
it) and per-primitive ablations of the new structure.

Usage: python scripts/exp_profile_aug.py   (TPU, serialized)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.data import augment as A
    from adipose_tpu.train.trainer_unet import make_augment_step

    print("backend:", jax.devices())
    B, H = 8, 1024
    rng = np.random.RandomState(865)
    imgs = jnp.asarray((rng.rand(B, H, H) * 255).astype(np.uint8))
    masks = jnp.asarray((rng.rand(B, H, H) > 0.5).astype(np.uint8))
    key = key_for("bench.aug")

    def timed(fn, *args, n=20):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            float(jnp.sum(leaves[0][0]))
        return (time.perf_counter() - t0) / n * 1e3

    identity_rest = lambda key, image, mask: (image, mask)

    variants = {
        "full": {},
        "no_geo": {"apply_transform_batch": lambda x, tids: x},
        "no_elastic": {"_maybe_elastic":
                       lambda key, image, mask, *a, **k: (image, mask)},
        "no_scale": {"random_scale":
                     lambda key, image, mask, *a, **k: (image, mask)},
        "no_photo_blur": {"_maybe": lambda key, fn, image, prob: image,
                          "random_gaussian_blur": lambda key, image, *a, **k: image},
        "nothing": {"apply_transform_batch": lambda x, tids: x,
                    "_rest_moderate": identity_rest},
    }

    results = {}
    for name, patches in variants.items():
        saved = {k: getattr(A, k) for k in patches}
        A.__dict__.update(patches)
        if "_rest_moderate" in patches:
            A._REST_TIERS = dict(A._REST_TIERS, moderate=identity_rest)
        try:
            fn = make_augment_step("moderate")
            ms = timed(fn, key, imgs, masks)
        finally:
            A.__dict__.update(saved)
            if "_rest_moderate" in patches:
                A._REST_TIERS = dict(A._REST_TIERS,
                                     moderate=saved["_rest_moderate"])
        results[name] = ms
        print(f"{name:16s} {ms:8.2f} ms/batch   {B / ms * 1e3:7.1f} tiles/s",
              flush=True)

    full = results["full"]
    print("\nattribution (full - ablated):")
    for name, ms in results.items():
        if name.startswith("no_"):
            print(f"  {name[3:]:14s} {full - ms:8.2f} ms")
    print(f"  residual(nothing) {results['nothing']:8.2f} ms"
          "  (dispatch + u8 convert)")

    # the heavy tier has the widest warp (alpha=15 → 32 shifted copies)
    fn = make_augment_step("heavy")
    ms = timed(fn, key, imgs, masks)
    print(f"\nheavy full       {ms:8.2f} ms/batch   {B / ms * 1e3:7.1f} tiles/s")


if __name__ == "__main__":
    main()
