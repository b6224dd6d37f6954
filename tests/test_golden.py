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


GOLDEN_TF_ORACLE = Path(__file__).parent / "golden_tf_oracle.npz"


class TestTFOracleGoldens:
    """Expectations computed by the REFERENCE implementation (run under
    tf_keras by scripts/gen_tf_goldens.py), not by this repo — so day-one
    correctness stays pinned even where golden_unet.npz only guards refactor
    drift, and even if TF leaves the environment. The live TF round-trips are
    in tests/test_tf_oracle.py; weight streams are shared via
    tests/tf_oracle_util.py."""

    @staticmethod
    def _data():
        return np.load(GOLDEN_TF_ORACLE)

    def test_unet_forward_vs_reference(self):
        from tf_oracle_util import fill_flax_unet, seeded_unet_weights

        data = self._data()
        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.standard_normal((1, 1024, 1024)).astype(np.float32))
        for ds, tag, seed in ((False, "unet", 123), (True, "unet_ds", 124)):
            model = DilatedUNet(init_nb=8, compute_dtype=jnp.float32,
                                use_deep_supervision=ds)
            variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
            variables = fill_flax_unet(variables, seeded_unet_weights(8, ds, seed))
            out = model.apply(variables, x, train=False)
            if not isinstance(out, dict):
                out = {"main_out": out}
            for head, val in out.items():
                got = np.asarray(val)
                want = data[f"{tag}/{head}/sub"]
                assert np.abs(got[:, ::16, ::16] - want).max() <= 5e-5, (tag, head)
                assert abs(got.mean() - data[f"{tag}/{head}/mean"]) <= 1e-5
                assert abs(got.max() - data[f"{tag}/{head}/max"]) <= 5e-5

    def test_inception_forward_vs_reference(self):
        from tf_oracle_util import fill_flax_inception, seeded_inception_weights

        from adipose_tpu.models import InceptionV3Classifier

        data = self._data()
        rs = np.random.RandomState(11)
        x = jnp.asarray(rs.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32))
        model = InceptionV3Classifier(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        variables = fill_flax_inception(variables, seeded_inception_weights(321))
        probs = np.asarray(model.apply(variables, x, train=False))
        assert np.abs(probs - data["inception/probs"]).max() <= 1e-5

    def test_losses_vs_reference(self):
        from adipose_tpu.ops import losses

        data = self._data()
        y_true = jnp.asarray(data["losses/y_true"])
        y_pred = jnp.asarray(data["losses/y_pred"])
        direct = ("dice_coef", "dice_coef_loss", "jaccard_coef",
                  "jaccard_coef_int", "combined_loss_standard",
                  "combined_loss_with_label_smoothing")
        for name in direct:
            got = float(getattr(losses, name)(y_true, y_pred))
            np.testing.assert_allclose(got, float(data[f"losses/{name}"]),
                                       rtol=2e-5, atol=2e-6, err_msg=name)
        for name in ("ohem_loss", "ohem_loss_with_smoothing"):
            got = float(getattr(losses, name)(y_true, y_pred, keep_ratio=0.7))
            np.testing.assert_allclose(got, float(data[f"losses/{name}"]),
                                       rtol=2e-5, atol=2e-6, err_msg=name)
        for name in ("weighted_bce_dice_loss", "weighted_dice_loss"):
            got = float(getattr(losses, name)(y_true[0:1], y_pred[0:1]))
            np.testing.assert_allclose(got, float(data[f"losses/{name}"]),
                                       rtol=2e-5, err_msg=name)
        yt2 = jnp.stack([1 - y_true, y_true], -1)
        yp2 = jnp.stack([1 - y_pred, y_pred], -1)
        for name in ("precision_onehot", "recall_onehot", "fmeasure_onehot"):
            got = float(getattr(losses, name)(yt2, yp2))
            np.testing.assert_allclose(got, float(data[f"losses/{name}"]),
                                       rtol=2e-5, atol=2e-6, err_msg=name)
