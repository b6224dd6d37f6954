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
