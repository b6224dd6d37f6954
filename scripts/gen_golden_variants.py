"""Regenerate tests/golden_unet_variants.npz — forward outputs of every
DilatedUNet config variant at a fixed seed. Run ONLY for deliberate,
documented model changes:

    JAX_PLATFORMS=cpu python scripts/gen_golden_variants.py
"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from pathlib import Path

from adipose_tpu.models.unet import DilatedUNet

CONFIGS = {
    "default": dict(),
    "ds": dict(use_deep_supervision=True),
    "lane_pad0": dict(lane_pad=0),
    "slow_head": dict(fast_head=False),
}

rng = np.random.RandomState(20260818)
x = rng.randn(2, 64, 64).astype(np.float32)
out = {"input": x}
for name, kw in CONFIGS.items():
    model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32, **kw)
    params = model.init(jax.random.PRNGKey(42), jnp.asarray(x))
    y = model.apply(params, jnp.asarray(x))
    if isinstance(y, dict):
        for k, v in y.items():
            out[f"{name}.{k}"] = np.asarray(v)
    else:
        out[f"{name}.main_out"] = np.asarray(y)

path = Path(__file__).parent.parent / "tests" / "golden_unet_variants.npz"
np.savez_compressed(path, **out)
print("wrote", path, "keys:", sorted(out))
