"""One-off: inspect the optimized HLO of the b8 'moderate' augment program.

Counts instructions still carrying the pathological batch-minor {0,2,1}
layout (16× padded at B=8) after the apply_transform_batch layout pin, and
attributes bytes to op kinds, so the remaining elastic-stage cost can be
diagnosed from data instead of timing roulette.

Usage: python scripts/exp_aug_hlo.py [tier]   (TPU, serialized)
"""
import re
import sys


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.train.trainer_unet import make_augment_step

    tier = sys.argv[1] if len(sys.argv) > 1 else "moderate"
    print("backend:", jax.devices(), "tier:", tier)
    B, H = 8, 1024
    rng = np.random.RandomState(865)
    imgs = jnp.asarray((rng.rand(B, H, H) * 255).astype(np.uint8))
    masks = jnp.asarray((rng.rand(B, H, H) > 0.5).astype(np.uint8))
    key = key_for("bench.aug")

    step = make_augment_step(tier)
    compiled = jax.jit(lambda *a: step(*a)).lower(key, imgs, masks).compile()
    txt = compiled.as_text()
    print("HLO chars:", len(txt))

    bad = re.findall(r"%?([\w.\-]+) = (\S+\{0,2,1[^}]*\})", txt)
    print(f"\ninstructions with {{0,2,1}} batch-minor layout: {len(bad)}")
    kinds = {}
    for name, shape in bad:
        kind = re.sub(r"[.\d]+$", "", name)
        kinds[kind] = kinds.get(kind, 0) + 1
    for k, n in sorted(kinds.items(), key=lambda kv: -kv[1]):
        print(f"  {n:4d}  {k}")
    for name, shape in bad[:15]:
        print("   ", name, shape)

    # biggest fusions by op count tell where time plausibly goes
    convs = re.findall(r"(\S+) = \S+ convolution\(", txt)
    print(f"\nconvolutions: {len(convs)}")
    try:
        mem = compiled.memory_analysis()
        print("temp bytes:", getattr(mem, "temp_size_in_bytes", None))
    except Exception as e:
        print("memory_analysis:", e)


if __name__ == "__main__":
    main()
