"""Level-1 rematerialization policy: gradients must be bit-identical.

The trainer may wrap the U-Net forward in ``jax.checkpoint`` with
:func:`adipose_tpu.models.unet.level1_remat_policy` (drop the 1024²
activation stashes, recompute them in the backward) to avoid XLA's
layout-transpose/compression-remat copies at b8 1024² (BASELINE.md round-2
profile). Rematerialization replays the same ops on the same inputs, so
grads must match the plain path exactly — any divergence means a tag
landed on the wrong tensor or dropout keys are not replayed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.core.seeding import key_for
from adipose_tpu.models.unet import (
    LEVEL1_CHECKPOINT_NAMES, DilatedUNet, level1_remat_policy)


@pytest.mark.parametrize("lane_pad,fast_head,ds", [
    (0, False, False),          # the config the TPU trainer compiles
    (64, True, True),           # padded + fast head + deep supervision
])
def test_level1_remat_grads_bit_identical(lane_pad, fast_head, ds):
    model = DilatedUNet(init_nb=2, compute_dtype=jnp.float32,
                        lane_pad=lane_pad, fast_head=fast_head,
                        use_deep_supervision=ds)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32).astype("f4"))
    params = model.init(key_for("t"), x)

    def fwd(p, x, k):
        return model.apply(p, x, train=True, rngs={"dropout": k})

    fwd_c = jax.checkpoint(fwd, policy=level1_remat_policy())

    def loss(f):
        def run(p):
            out = f(p, x, key_for("d"))
            main = out["main_out"] if isinstance(out, dict) else out
            return jnp.sum(main ** 2)
        return run

    g_plain = jax.grad(loss(fwd))(params)
    g_ckpt = jax.grad(loss(fwd_c))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_ckpt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tag_set_matches_model():
    """Every declared level-1 tag appears in the traced jaxpr (both decoder
    branches), so the policy actually drops what it promises to drop."""
    for lane_pad in (0, 64):
        model = DilatedUNet(init_nb=2, compute_dtype=jnp.float32,
                            lane_pad=lane_pad, fast_head=lane_pad != 0)
        x = jnp.zeros((1, 32, 32))
        params = model.init(key_for("t"), x)
        jaxpr = jax.make_jaxpr(
            lambda p: model.apply(p, x, train=True,
                                  rngs={"dropout": key_for("d")}))(params)
        txt = str(jaxpr)
        for name in LEVEL1_CHECKPOINT_NAMES:
            assert name in txt, (lane_pad, name)
