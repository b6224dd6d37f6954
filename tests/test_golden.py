"""Golden regression: the U-Net forward is pinned against a stored fixture.

Guards against silent numerical drift from refactors (e.g. the fused decoder
formulations must stay exactly equivalent to the reference compute graph).
Regenerate the fixture ONLY for deliberate, documented model changes:

    python -c "see tests/test_golden.py docstring"  (script in git history)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.models.unet import DilatedUNet

GOLDEN = Path(__file__).parent / "golden_unet.npz"


def test_unet_forward_matches_golden():
    data = np.load(GOLDEN)
    model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32)
    x = jnp.asarray(data["input"])
    params = model.init(jax.random.PRNGKey(42), x)
    out = np.asarray(model.apply(params, x))
    assert out.shape == data["output"].shape
    assert np.abs(out - data["output"]).max() < 1e-4


GOLDEN_VARIANTS = Path(__file__).parent / "golden_unet_variants.npz"

_VARIANT_CONFIGS = {
    "default": dict(),
    "ds": dict(use_deep_supervision=True),
    "lane_pad0": dict(lane_pad=0),
    "slow_head": dict(fast_head=False),
}


def test_unet_variant_forwards_match_golden():
    """Every config variant (DS heads, lane_pad=0, fast_head=False) is pinned
    by a stored fixture (scripts/gen_golden_variants.py) — a numerical change
    in ANY path fails here, not just the default config."""
    import pytest

    data = np.load(GOLDEN_VARIANTS)
    x = jnp.asarray(data["input"])
    for name, kw in _VARIANT_CONFIGS.items():
        model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32, **kw)
        params = model.init(jax.random.PRNGKey(42), x)
        out = model.apply(params, x)
        if not isinstance(out, dict):
            out = {"main_out": out}
        for head, val in out.items():
            want = data[f"{name}.{head}"]
            got = np.asarray(val)
            assert got.shape == want.shape, (name, head)
            assert np.abs(got - want).max() < 1e-4, (name, head)
