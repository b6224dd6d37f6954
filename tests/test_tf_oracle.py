"""TF-oracle parity: the REAL reference implementation (run in-process under
tf_keras) vs the Flax rebuild — weights round-tripped through actual Keras
``save_weights`` files, not synthetic fixtures.

Covers VERDICT r2 items 1/2/8: both H5 layouts a real Keras writes (legacy
by-name ``.h5`` and generic ``.weights.h5``), U-Net non-DS/DS forward parity,
InceptionV3 classifier forward parity, and the reference loss/metric formulas
from ``src/utils/model.py`` as oracles for ``ops/losses``.

Skipped wholesale when tf_keras is not installed (the committed
``golden_tf_oracle.npz`` fixtures keep TF-generated expectations pinned in
that case — see test_golden.py::TestTFOracleGoldens).
"""

from functools import partial

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tf_oracle_util import (  # noqa: E402
    build_keras_classifier,
    fill_flax_inception,
    fill_flax_unet,
    fill_keras_inception,
    fill_keras_unet,
    load_reference_model_utils,
    load_reference_unet_module,
    seeded_inception_weights,
    seeded_unet_weights,
)


def _tree_allclose(a, b):
    import flax

    fa = flax.traverse_util.flatten_dict(a, sep="/")
    fb = flax.traverse_util.flatten_dict(b, sep="/")
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


@pytest.fixture(scope="module")
def ref_unet_module():
    return load_reference_unet_module()


def _build_ref_unet_with_trainer(ref, tmp_path, ds, init_nb=4,
                                 dropout_rate=0.3):
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)  # constructor mkdirs checkpoints/ under CWD
    try:
        m = ref.AdiposeUNetV3(checkpoint_name="tmp", use_deep_supervision=ds,
                              build_timestamp="20260101_000000")
        return m, m.build_model(init_nb=init_nb, dropout_rate=dropout_rate)
    finally:
        os.chdir(cwd)


def _build_ref_unet(ref, tmp_path, ds, init_nb=4):
    return _build_ref_unet_with_trainer(ref, tmp_path, ds, init_nb)[1]


class TestUNetRealFileRoundtrip:
    @pytest.mark.parametrize("ds", [False, True], ids=["plain", "deep_supervision"])
    def test_forward_parity_both_layouts(self, ref_unet_module, tmp_path, ds):
        """Reference model → real save_weights files → import → |Δ| ≤ 1e-5."""
        from adipose_tpu.models.tf_import import import_unet_weights
        from adipose_tpu.models.unet import DilatedUNet

        init_nb = 4
        net = _build_ref_unet(ref_unet_module, tmp_path, ds, init_nb)
        weights = seeded_unet_weights(init_nb, ds)
        fill_keras_unet(net, weights)

        generic = str(tmp_path / "w.weights.h5")   # tf_keras 2.21 generic layout
        legacy = str(tmp_path / "w_legacy.h5")     # by-layer-name HDF5
        net.save_weights(generic)
        net.save_weights(legacy)

        rs = np.random.RandomState(7)
        x = rs.standard_normal((1, 1024, 1024)).astype(np.float32)
        tf_out = net(x, training=False)
        if ds:
            tf_out = {k: np.asarray(v) for k, v in tf_out.items()}
        else:
            tf_out = {"main_out": np.asarray(tf_out)}

        model = DilatedUNet(init_nb=init_nb, compute_dtype=jnp.float32,
                            use_deep_supervision=ds)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
        imported = import_unet_weights(generic, variables)
        fx_out = model.apply(imported, jnp.asarray(x), train=False)
        if not ds:
            fx_out = {"main_out": fx_out}
        for key, want in tf_out.items():
            got = np.asarray(fx_out[key])
            assert got.shape == want.shape, key
            # 5e-5 on probabilities: 22 f32 conv layers of oneDNN-vs-XLA
            # reassociation noise (trained init_nb=44 weights measure ~2e-7;
            # seeded He weights sit near the sigmoid's steep region)
            assert np.abs(got - want).max() <= 5e-5, (
                f"{key}: max|Δ|={np.abs(got - want).max():.3e}")

        # the legacy by-name file must produce the identical parameter tree
        imported_legacy = import_unet_weights(legacy, variables)
        _tree_allclose(imported["params"], imported_legacy["params"])

    def test_ds_file_into_plain_model_skips_aux(self, ref_unet_module, tmp_path):
        """DS checkpoint into a non-DS model: aux heads skipped, rest mapped
        (reference by-name-with-skip transfer semantics)."""
        from adipose_tpu.models.tf_import import import_unet_weights
        from adipose_tpu.models.unet import DilatedUNet

        net = _build_ref_unet(ref_unet_module, tmp_path, ds=True)
        weights = seeded_unet_weights(4, ds=True)
        fill_keras_unet(net, weights)
        path = str(tmp_path / "ds.weights.h5")
        net.save_weights(path)

        model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
        imported = import_unet_weights(path, variables)
        import flax

        flat = flax.traverse_util.flatten_dict(imported["params"])
        k, b = weights["down1_conv1"]
        key = next(p for p in flat if "down1_conv1" in p and p[-1] == "kernel")
        np.testing.assert_array_equal(np.asarray(flat[key]), k)
        # strict mode refuses nothing here (file ⊇ model); a PLAIN file into a
        # DS model must strictly fail instead
        net2 = _build_ref_unet(ref_unet_module, tmp_path, ds=False)
        fill_keras_unet(net2, seeded_unet_weights(4, ds=False))
        plain = str(tmp_path / "plain.weights.h5")
        net2.save_weights(plain)
        ds_model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32,
                               use_deep_supervision=True)
        ds_vars = ds_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
        with pytest.raises(KeyError):
            import_unet_weights(plain, ds_vars, strict=True)
        # non-strict: loads, reports aux heads as missing
        out = import_unet_weights(plain, ds_vars)
        assert out is not None


class TestInceptionRealFileRoundtrip:
    @pytest.fixture(scope="class")
    def keras_classifier(self):
        model = build_keras_classifier()
        fill_keras_inception(model, seeded_inception_weights())
        return model

    def test_forward_parity_generic_layout(self, keras_classifier, tmp_path):
        """VERDICT r2 #8: Flax InceptionV3 forward vs real Keras ≤ 1e-5 —
        with randomized BN stats so branch mis-pairing cannot hide."""
        from adipose_tpu.models import InceptionV3Classifier
        from adipose_tpu.models.tf_import import import_inception_weights

        path = str(tmp_path / "cls.weights.h5")
        keras_classifier.save_weights(path)

        rs = np.random.RandomState(11)
        x = rs.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
        tf_prob = np.asarray(keras_classifier(x, training=False))[:, 0]

        model = InceptionV3Classifier(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        imported = import_inception_weights(path, variables)
        fx_prob = np.asarray(model.apply(imported, jnp.asarray(x), train=False))
        assert np.abs(fx_prob - tf_prob).max() <= 1e-5, (
            f"max|Δ|={np.abs(fx_prob - tf_prob).max():.3e}")

    def test_legacy_layout_matches_generic(self, keras_classifier, tmp_path):
        from adipose_tpu.models import InceptionV3Classifier
        from adipose_tpu.models.tf_import import import_inception_weights

        generic = str(tmp_path / "cls.weights.h5")
        legacy = str(tmp_path / "cls_legacy.h5")
        keras_classifier.save_weights(generic)
        keras_classifier.save_weights(legacy)

        model = InceptionV3Classifier(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        a = import_inception_weights(generic, variables, strict=True)
        b = import_inception_weights(legacy, variables, strict=True)
        _tree_allclose(a["params"], b["params"])
        _tree_allclose(a["batch_stats"], b["batch_stats"])

    def test_direct_seeded_fill_matches_import(self, keras_classifier, tmp_path):
        """The golden-fixture weight path (fill_flax_inception) must agree
        with the H5 import path — ties the TF-less fixture tests to reality."""
        from adipose_tpu.models import InceptionV3Classifier
        from adipose_tpu.models.tf_import import import_inception_weights

        path = str(tmp_path / "cls.weights.h5")
        keras_classifier.save_weights(path)
        model = InceptionV3Classifier(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        imported = import_inception_weights(path, variables)
        filled = fill_flax_inception(variables, seeded_inception_weights())
        _tree_allclose(imported["params"], filled["params"])
        _tree_allclose(imported["batch_stats"], filled["batch_stats"])


class TestImportFailsLoudly:
    """The r2 silent-random-init hazard: zero-match imports must raise."""

    def test_unet_wrong_conv_count_raises(self, tmp_path):
        import h5py

        from adipose_tpu.models.tf_import import import_unet_weights
        from adipose_tpu.models.unet import DilatedUNet

        path = tmp_path / "bogus.weights.h5"
        with h5py.File(path, "w") as f:
            for i in range(5):  # neither 22 nor 24 convs
                nm = "conv2d" if i == 0 else f"conv2d_{i}"
                g = f.create_group(f"layers/{nm}/vars")
                g.create_dataset("0", data=np.zeros((3, 3, 4, 4), np.float32))
                g.create_dataset("1", data=np.zeros((4,), np.float32))
        model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32)))
        with pytest.raises(ValueError, match="conv layers"):
            import_unet_weights(path, variables)

    def test_unet_no_names_match_raises(self, tmp_path):
        """A legacy file with foreign layer names: nothing matches → error,
        never a silent random-init return."""
        import h5py

        from adipose_tpu.models.tf_import import import_unet_weights
        from adipose_tpu.models.unet import DilatedUNet

        path = tmp_path / "foreign.h5"
        with h5py.File(path, "w") as f:
            g = f.create_group("model_weights/some_layer/some_layer")
            g.create_dataset("kernel:0", data=np.zeros((3, 3, 1, 4), np.float32))
        model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32)))
        with pytest.raises(ValueError, match="no weights matched"):
            import_unet_weights(path, variables)

    def test_inception_wrong_file_raises(self, tmp_path):
        import h5py

        from adipose_tpu.models import InceptionV3Classifier
        from adipose_tpu.models.tf_import import import_inception_weights

        path = tmp_path / "notinception.weights.h5"
        with h5py.File(path, "w") as f:
            g = f.create_group("layers/conv2d/vars")
            g.create_dataset("0", data=np.zeros((3, 3, 3, 32), np.float32))
        model = InceptionV3Classifier(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        with pytest.raises(ValueError, match="not an InceptionV3"):
            import_inception_weights(path, variables)


class TestReferenceLossOracles:
    """ops/losses vs the formulas in /root/reference/src/utils/model.py,
    executed under tf_keras — expectations come from the reference
    implementation itself, not from this repo."""

    @pytest.fixture(scope="class")
    def ref_model_utils(self):
        return load_reference_model_utils()

    @pytest.fixture(scope="class")
    def masks(self):
        rs = np.random.RandomState(99)
        y_true = (rs.rand(2, 96, 96) > 0.6).astype(np.float32)
        y_pred = rs.rand(2, 96, 96).astype(np.float32)
        return y_true, y_pred

    @pytest.mark.parametrize("name", [
        "dice_coef", "dice_coef_loss", "jaccard_coef", "jaccard_coef_int",
        "mean_diff", "act_mean", "act_min", "act_max", "act_std",
    ])
    def test_scalar_formulas(self, ref_model_utils, masks, name):
        import tensorflow as tf

        from adipose_tpu.ops import losses, metrics

        y_true, y_pred = masks
        want = float(getattr(ref_model_utils, name)(
            tf.constant(y_true), tf.constant(y_pred)))
        if hasattr(losses, name):
            got = float(getattr(losses, name)(jnp.asarray(y_true), jnp.asarray(y_pred)))
        elif name == "mean_diff":
            got = float(jnp.mean(jnp.asarray(y_pred)) - jnp.mean(jnp.asarray(y_true)))
        else:
            got = float(metrics.activation_stats(jnp.asarray(y_pred))[name])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("name", [
        "precision_onehot", "recall_onehot", "fmeasure_onehot",
    ])
    def test_onehot_metrics(self, ref_model_utils, masks, name):
        import tensorflow as tf

        from adipose_tpu.ops import losses

        y_true, y_pred = masks
        yt2 = np.stack([1 - y_true, y_true], -1)
        yp2 = np.stack([1 - y_pred, y_pred], -1)
        want = float(getattr(ref_model_utils, name)(tf.constant(yt2), tf.constant(yp2)))
        got = float(getattr(losses, name)(jnp.asarray(yt2), jnp.asarray(yp2)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("name", ["weighted_bce_dice_loss", "weighted_dice_loss"])
    def test_weighted_losses(self, ref_model_utils, masks, name):
        """Per-image border-weighted losses. The reference is called (H, W, 1)
        — its intended per-image semantics; calling it with a BATCHED (B,H,W)
        mask makes its expand_dims(0) pool over (batch, height) with width as
        channels (PARITY.md deviation 14), which we deliberately don't copy."""
        from adipose_tpu.ops import losses

        y_true, y_pred = masks
        want = float(getattr(ref_model_utils, name)(
            y_true[0][..., None], y_pred[0][..., None]))
        got = float(getattr(losses, name)(
            jnp.asarray(y_true[0:1]), jnp.asarray(y_pred[0:1])))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    @pytest.mark.parametrize("name,ours,kwargs", [
        ("combined_loss_standard", "combined_loss_standard", {}),
        ("combined_loss_with_label_smoothing", "combined_loss_with_label_smoothing", {}),
        ("online_hard_example_mining_loss", "ohem_loss", {"keep_ratio": 0.7}),
        ("online_hard_example_mining_loss_with_smoothing", "ohem_loss_with_smoothing",
         {"keep_ratio": 0.7}),
    ])
    def test_v3_trainer_losses(self, ref_unet_module, masks, name, ours, kwargs):
        """The losses the v3 trainer actually compiles with
        (train_adipose_unet_v3.py:217-360) — reference values computed by the
        reference functions themselves."""
        import tensorflow as tf

        from adipose_tpu.ops import losses

        y_true, y_pred = masks
        want = float(tf.reduce_mean(
            getattr(ref_unet_module, name)(y_true, y_pred, **kwargs)))
        got = float(getattr(losses, ours)(
            jnp.asarray(y_true), jnp.asarray(y_pred), **kwargs))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-6)


class TestManifestsMatchLiveGraphs:
    """The hardcoded generic-layout manifests in models/tf_import.py must
    match what tf_keras's saving actually does — rederive them from the live
    models (scripts/gen_tf_manifests.py logic) and compare."""

    def test_unet_conv_orders(self, ref_unet_module, tmp_path):
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        from gen_tf_manifests import simulate_save_names

        from adipose_tpu.models.tf_import import (
            UNET_GENERIC_CONV_ORDER,
            UNET_GENERIC_CONV_ORDER_DS,
        )

        for ds, expected in ((False, UNET_GENERIC_CONV_ORDER),
                             (True, UNET_GENERIC_CONV_ORDER_DS)):
            net = _build_ref_unet(ref_unet_module, tmp_path, ds)
            order = {}
            for h5name, layer in simulate_save_names(net):
                if h5name.startswith("conv2d"):
                    rest = h5name[len("conv2d"):]
                    order[0 if not rest else int(rest[1:])] = layer.name
            assert tuple(order[k] for k in sorted(order)) == expected, ds

    def test_inception_perm(self):
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        from gen_tf_manifests import inception_perm

        from adipose_tpu.models.tf_import import INCEPTION_TOPO_PERM

        assert inception_perm() == INCEPTION_TOPO_PERM


class TestFrozenBNOracle:
    """VERDICT r3 item 2: Keras special-cases BatchNormalization under
    ``layer.trainable = False`` — during ``fit`` the layer runs in INFERENCE
    mode (normalizes with moving statistics, no update). The reference's
    ``freeze_backbone`` / ``unfreeze_from_layer``
    (train_adipose_classifier_v0.py:356-367) therefore make frozen backbone
    BNs normalize with MOVING stats in phase 1 (all of them) and below the
    unfreeze boundary in phase 2. The rebuild reproduces that with the
    ``frozen_below`` argument; this class drives the REFERENCE's own
    freeze functions on the live tf_keras graph and pins both the forward
    values and the exact unfreeze boundary.

    Ordering note: tests run top-to-bottom within the class; the class-scoped
    Keras model's moving stats are only mutated by the LAST test (phase-2
    training-mode forward updates the unfrozen BNs in place), so earlier
    tests see pristine stats.
    """

    @pytest.fixture(scope="class")
    def ref_cls_module(self):
        from tf_oracle_util import load_reference_classifier_module

        return load_reference_classifier_module()

    @pytest.fixture(scope="class")
    def frozen_pair(self):
        # dropout_rate=0 so training-mode forwards are deterministic (Keras
        # Dropout ignores `trainable` and would still drop under fit —
        # mirrored by the rebuild, which doesn't special-case Dropout either)
        model, base = build_keras_classifier(dropout_rate=0.0, return_base=True)
        fill_keras_inception(model, seeded_inception_weights())
        return model, base

    @pytest.fixture(scope="class")
    def flax_pair(self):
        from adipose_tpu.models import InceptionV3Classifier

        model = InceptionV3Classifier(dropout_rate=0.0, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        variables = fill_flax_inception(variables, seeded_inception_weights())
        return model, variables

    def _flax_train_forward(self, flax_pair, x, frozen_below):
        model, variables = flax_pair
        out, _ = model.apply(
            variables, jnp.asarray(x), train=True, frozen_below=frozen_below,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        return np.asarray(out)

    def test_phase1_frozen_training_forward(self, ref_cls_module, frozen_pair,
                                            flax_pair):
        """freeze_backbone ⇒ a training-mode forward equals the rebuild's
        train=True, frozen_below=NUM_CONVS forward — and differs materially
        from the unfrozen (batch-stats) forward, so the test has teeth."""
        from adipose_tpu.models.inception import NUM_CONVS

        model, base = frozen_pair
        ref_cls_module.freeze_backbone(base)
        rs = np.random.RandomState(7)
        x = rs.uniform(-1, 1, (4, 299, 299, 3)).astype(np.float32)
        tf_prob = np.asarray(model(x, training=True))[:, 0]

        fx_frozen = self._flax_train_forward(flax_pair, x, NUM_CONVS)
        assert np.abs(fx_frozen - tf_prob).max() <= 5e-5, (
            f"max|Δ|={np.abs(fx_frozen - tf_prob).max():.3e}")

        fx_batchstats = self._flax_train_forward(flax_pair, x, 0)
        assert np.abs(fx_batchstats - tf_prob).max() > 1e-3, (
            "frozen and batch-stats forwards coincide — oracle has no teeth")

    def test_phase2_unfreeze_boundary(self, ref_cls_module, frozen_pair):
        """unfreeze_from_layer('mixedK') walks base.layers topologically and
        flips at the CONCATENATE layer named mixedK — the block's own convs
        (created before it) stay frozen. Pin unfreeze_conv_start against the
        live graph for every block."""
        from adipose_tpu.models.inception import (
            NUM_CONVS,
            unfreeze_conv_start,
        )

        def suffix(name, prefix):
            rest = name[len(prefix):]
            return 0 if rest == "" else int(rest.lstrip("_"))

        model, base = frozen_pair
        convs = sorted(
            (l for l in base.layers if l.__class__.__name__ == "Conv2D"),
            key=lambda l: suffix(l.name, "conv2d"),
        )
        assert len(convs) == NUM_CONVS
        for k in range(11):
            ref_cls_module.unfreeze_from_layer(base, f"mixed{k}")
            # mixed10 is the backbone's final layer: no conv follows its
            # concat, so unfreezing from it leaves every conv frozen
            # (boundary == NUM_CONVS).
            first = next(
                (i for i, l in enumerate(convs) if l.trainable), NUM_CONVS)
            assert first == unfreeze_conv_start(f"mixed{k}"), f"mixed{k}"

    def test_phase2_frozen_training_forward(self, ref_cls_module, frozen_pair,
                                            flax_pair):
        """Phase-2 semantics: convs below the mixed7 boundary normalize with
        moving stats, at/after with batch stats. MUST RUN LAST — the Keras
        training-mode forward updates the unfrozen BNs' moving stats."""
        from adipose_tpu.models.inception import unfreeze_conv_start

        model, base = frozen_pair
        ref_cls_module.freeze_backbone(base)
        ref_cls_module.unfreeze_from_layer(base, "mixed7")
        rs = np.random.RandomState(8)
        x = rs.uniform(-1, 1, (4, 299, 299, 3)).astype(np.float32)
        tf_prob = np.asarray(model(x, training=True))[:, 0]

        fx = self._flax_train_forward(flax_pair, x, unfreeze_conv_start("mixed7"))
        assert np.abs(fx - tf_prob).max() <= 5e-5, (
            f"max|Δ|={np.abs(fx - tf_prob).max():.3e}")


class TestTrainingOracle:
    """VERDICT r3 item 1: training is the last numerical surface. Pin the
    rebuild's TRAIN step against the reference trainer run in-process:
    (a) full-graph gradients of the compiled loss, (b) one Adam optimizer step
    (Keras Adam's exact update form — see ``train.state.scale_by_keras_adam``),
    (c) a 25-step loss trajectory through ``train_on_batch`` on identical
    synthetic batches. Reference: ``train_adipose_unet_v3.py:780-879``
    (compile), ``:1316-1421`` (fit loops).

    dropout_rate=0 on both sides: framework RNGs can't be aligned, and dropout
    is the only stochastic layer in the graph. Plain-model tests run 256²
    tiles via ``build_ref_unet_at_size`` (the reference's own layer stack,
    only the hardcoded 1024 input size patched) to keep TF-CPU runtime sane;
    the DS graph can't be rebuilt small (its aux-resize Lambdas re-trace at
    fit time with the hardcoded 1024), so its gradient test runs native 1024².
    """

    SIZE, NB, B, LR = 256, 4, 2, 1e-4

    @pytest.fixture(scope="class")
    def ref_unet_module(self):
        from tf_oracle_util import load_reference_unet_module

        return load_reference_unet_module()

    def _synth_batches(self, n, size=None):
        """Deterministic blob-mask batches; images correlated with masks so
        training has signal."""
        rs = np.random.RandomState(5)
        S, B = size or self.SIZE, self.B
        yy, xx = np.mgrid[0:S, 0:S]
        out = []
        for _ in range(n):
            x = rs.standard_normal((B, S, S)).astype(np.float32)
            masks = []
            for _ in range(B):
                cx, cy = rs.randint(40, S - 40), rs.randint(40, S - 40)
                r = rs.randint(20, 60)
                masks.append(((xx - cx) ** 2 + (yy - cy) ** 2 < r * r))
            y = np.stack(masks).astype(np.float32)
            out.append(((x * 0.3 + y * 2.0 - 1.0).astype(np.float32), y))
        return out

    def _ref_pair(self, ref_unet_module, tmp_path, ds=False):
        from tf_oracle_util import (
            build_ref_unet_at_size,
            fill_keras_unet,
            seeded_unet_weights,
        )

        if ds:  # DS graph is 1024-only (aux-resize Lambdas; see class doc)
            trainer, net = _build_ref_unet_with_trainer(
                ref_unet_module, tmp_path, ds=True, init_nb=self.NB,
                dropout_rate=0.0)
        else:
            trainer, net = build_ref_unet_at_size(
                ref_unet_module, tmp_path, self.SIZE, self.NB,
                dropout_rate=0.0)
        trainer.unfreeze_encoder()
        fill_keras_unet(net, seeded_unet_weights(self.NB, ds=ds))
        return trainer, net

    def _flax_pair(self, ds=False):
        from tf_oracle_util import fill_flax_unet, seeded_unet_weights

        from adipose_tpu.models.unet import DilatedUNet

        model = DilatedUNet(init_nb=self.NB, compute_dtype=jnp.float32,
                            dropout_rate=0.0, use_deep_supervision=ds)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
        return model, fill_flax_unet(variables, seeded_unet_weights(self.NB, ds=ds))

    @pytest.mark.parametrize("ds", [False, True], ids=["plain", "deep_supervision"])
    def test_gradient_parity(self, ref_unet_module, tmp_path, ds):
        """∂loss/∂θ for every layer of the full (unfrozen) graph, under the
        loss the reference compiles with (OHEM ratio 0.7 main; DS adds
        1.0/0.4/0.3-weighted aux combined losses)."""
        import tensorflow as tf

        from tf_oracle_util import flax_unet_grads_by_layer, keras_grads_by_layer

        from adipose_tpu.ops import losses as L

        _, net = self._ref_pair(ref_unet_module, tmp_path, ds)
        (x, y), = self._synth_batches(1, size=1024 if ds else None)

        if ds:
            def tf_loss(yt, pred):
                return (
                    1.0 * tf.reduce_mean(
                        ref_unet_module.online_hard_example_mining_loss(
                            yt, pred["main_out"], 0.7))
                    + 0.4 * tf.reduce_mean(
                        ref_unet_module.combined_loss_standard(yt, pred["aux_out1"]))
                    + 0.3 * tf.reduce_mean(
                        ref_unet_module.combined_loss_standard(yt, pred["aux_out2"]))
                )

            def jx_loss(yt, out):
                return L.deep_supervision_loss(
                    yt, out, partial(L.ohem_loss, keep_ratio=0.7),
                    L.combined_loss_standard, 1.0, 0.4, 0.3)
        else:
            def tf_loss(yt, pred):
                return tf.reduce_mean(
                    ref_unet_module.online_hard_example_mining_loss(yt, pred, 0.7))

            def jx_loss(yt, out):
                return L.ohem_loss(yt, out, keep_ratio=0.7)

        tf_loss_val, tf_grads = keras_grads_by_layer(net, tf_loss, x, y)

        model, variables = self._flax_pair(ds)

        def compute(params):
            out = model.apply({"params": params}, jnp.asarray(x), train=True)
            return jx_loss(jnp.asarray(y), out)

        jx_loss_val, jx_grads = jax.value_and_grad(compute)(variables["params"])
        assert abs(float(jx_loss_val) - tf_loss_val) <= 2e-5, (
            f"loss Δ={abs(float(jx_loss_val) - tf_loss_val):.3e}")

        fx = flax_unet_grads_by_layer(jx_grads)
        assert set(tf_grads) == set(fx)
        for key, ref_g in tf_grads.items():
            got = fx[key]
            rel = np.abs(ref_g - got).max() / (np.abs(ref_g).max() + 1e-12)
            # observed ≤6e-4 (f32 oneDNN-vs-XLA reassociation through 22
            # convs); 3e-3 bound keeps real mapping bugs (≫1) loud
            assert rel <= 3e-3, f"{key}: max rel grad Δ={rel:.3e}"

    def test_one_adam_step_parity(self, ref_unet_module, tmp_path):
        """train_on_batch (compiled Adam lr=1e-4, OHEM loss) vs the rebuild's
        train step: parameter UPDATES must agree elementwise wherever the
        gradient is significant. (Near-zero-gradient elements are excluded:
        Adam's first-step update there is ±lr·sign(g), and sign(g) is exactly
        the f32 noise the gradient test bounds.)"""
        import tensorflow as tf

        from tf_oracle_util import keras_grads_by_layer

        from adipose_tpu.ops import losses as L
        from adipose_tpu.train.state import (
            TrainState,
            make_optimizer,
            make_unet_train_step,
        )

        trainer, net = self._ref_pair(ref_unet_module, tmp_path)
        trainer.compile_model(lr=self.LR, use_hard_mining=True,
                              hard_example_ratio=0.7)
        (x, y), = self._synth_batches(1)

        w_before = {l.name: l.get_weights() for l in net.layers
                    if len(l.get_weights()) == 2}
        _, tf_grads = keras_grads_by_layer(
            net, lambda yt, yp: tf.reduce_mean(
                ref_unet_module.online_hard_example_mining_loss(yt, yp, 0.7)),
            x, y)
        logs = net.train_on_batch(x, y, return_dict=True)
        w_after = {l.name: l.get_weights() for l in net.layers
                   if len(l.get_weights()) == 2}

        model, variables = self._flax_pair()
        tx = make_optimizer("adam", lr=self.LR)
        state = TrainState.create({"params": variables["params"]}, tx)
        step = make_unet_train_step(
            model, lambda yt, out: L.ohem_loss(yt, out, keep_ratio=0.7))
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(y),
                              jax.random.PRNGKey(0))
        assert abs(float(metrics["loss"]) - float(logs["loss"])) <= 2e-5

        import flax

        flat = flax.traverse_util.flatten_dict(state.params["params"])
        for path, v in flat.items():
            layer, leaf = path[-2], path[-1]
            idx = 0 if leaf == "kernel" else 1
            ref_delta = w_after[layer][idx] - w_before[layer][idx]
            got_delta = np.asarray(v) - w_before[layer][idx]
            g = tf_grads[(layer, leaf)]
            sig = np.abs(g) > 1e-3 * (np.abs(g).max() + 1e-12)
            assert sig.any(), (layer, leaf)
            d = np.abs(ref_delta - got_delta)[sig].max()
            # updates are ~lr=1e-4 elementwise; 5e-6 = 5% of a full step
            assert d <= 5e-6, f"{layer}/{leaf}: max|Δupdate|={d:.3e}"

    def test_trajectory_parity_25_steps(self, ref_unet_module, tmp_path):
        """25 train_on_batch steps vs 25 rebuild steps on identical batches:
        per-step losses track to ≤5e-4 and final params agree — the compiled
        loss, gradients, and Keras-form Adam compose identically over a real
        trajectory."""
        from adipose_tpu.ops import losses as L
        from adipose_tpu.train.state import (
            TrainState,
            make_optimizer,
            make_unet_train_step,
        )

        trainer, net = self._ref_pair(ref_unet_module, tmp_path)
        trainer.compile_model(lr=self.LR, use_hard_mining=True,
                              hard_example_ratio=0.7)
        batches = self._synth_batches(25)

        tf_losses = [
            float(net.train_on_batch(x, y, return_dict=True)["loss"])
            for x, y in batches
        ]

        model, variables = self._flax_pair()
        tx = make_optimizer("adam", lr=self.LR)
        state = TrainState.create({"params": variables["params"]}, tx)
        step = make_unet_train_step(
            model, lambda yt, out: L.ohem_loss(yt, out, keep_ratio=0.7))
        key = jax.random.PRNGKey(0)
        jx_losses = []
        for x, y in batches:
            state, m = step(state, jnp.asarray(x), jnp.asarray(y), key)
            jx_losses.append(float(m["loss"]))

        tf_l, jx_l = np.asarray(tf_losses), np.asarray(jx_losses)
        assert np.abs(tf_l - jx_l).max() <= 5e-4, (
            f"per-step loss divergence: max|Δ|={np.abs(tf_l - jx_l).max():.3e}")

        import flax

        w_final = {l.name: l.get_weights() for l in net.layers
                   if len(l.get_weights()) == 2}
        flat = flax.traverse_util.flatten_dict(state.params["params"])
        for path, v in flat.items():
            layer, leaf = path[-2], path[-1]
            ref = w_final[layer][0 if leaf == "kernel" else 1]
            rel = np.abs(np.asarray(v) - ref).max() / (np.abs(ref).max() + 1e-12)
            # observed ≤3e-4 after 25 steps
            assert rel <= 2e-3, f"{layer}/{leaf}: rel param Δ={rel:.3e}"


class TestClassifierTrainingOracle:
    """VERDICT r3 item 7: two-phase classifier TRAINING dynamics vs the
    reference — the reference's own ``freeze_backbone``/``unfreeze_from_layer``
    + ``compile_model`` (Adam, BCE label_smoothing=0.1,
    ``train_adipose_classifier_v0.py:356-378``) driven through
    ``train_on_batch``, against the rebuild's masked-optimizer +
    ``frozen_below`` train step, on identical seeded weights and batches.
    Phase-1 and phase-2 loss trajectories must track. Preprocessing is
    bypassed (shared raw 299² tensors): the input pipeline has its own
    oracles; this pins the *training* surface."""

    B, STEPS = 4, 6

    @pytest.fixture
    def ref_cls_module(self):
        from tf_oracle_util import load_reference_classifier_module

        return load_reference_classifier_module()

    def _batches(self, n):
        rs = np.random.RandomState(21)
        pattern = rs.uniform(-1, 1, (299, 299, 3)).astype(np.float32)
        out = []
        for _ in range(n):
            y = (np.arange(self.B) % 2).astype(np.float32)
            x = rs.uniform(-1, 1, (self.B, 299, 299, 3)).astype(np.float32)
            x = x + y[:, None, None, None] * 0.3 * pattern
            out.append((x, y))
        return out

    def test_two_phase_loss_trajectories(self, ref_cls_module):
        from tf_oracle_util import (
            build_keras_classifier,
            fill_flax_inception,
            fill_keras_inception,
            seeded_inception_weights,
        )

        from adipose_tpu.models import InceptionV3Classifier
        from adipose_tpu.models.inception import (
            NUM_CONVS,
            backbone_param_mask,
            unfreeze_conv_start,
        )
        from adipose_tpu.train.state import (
            TrainState,
            classifier_stats_mask,
            make_classifier_train_step,
            make_optimizer,
        )

        weights = seeded_inception_weights()
        keras_model, base = build_keras_classifier(dropout_rate=0.0,
                                                   return_base=True)
        fill_keras_inception(keras_model, weights)

        model = InceptionV3Classifier(dropout_rate=0.0, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 75, 75, 3)))
        variables = fill_flax_inception(variables, weights)

        batches = self._batches(2 * self.STEPS)

        def run_keras_phase(lr, steps_slice):
            ref_cls_module.compile_model(keras_model, lr=lr,
                                         label_smoothing=0.1)
            return [
                float(keras_model.train_on_batch(x, y, return_dict=True)["loss"])
                for x, y in steps_slice
            ]

        def make_flax_phase(params, batch_stats, lr, unfreeze):
            pmask = backbone_param_mask(params, unfreeze)
            smask = classifier_stats_mask(batch_stats, pmask)
            fb = NUM_CONVS if unfreeze is None else unfreeze_conv_start(unfreeze)
            tx = make_optimizer("adam", lr=lr, trainable_mask=pmask)
            state = TrainState.create(params, tx, batch_stats=batch_stats)
            step = make_classifier_train_step(model, 0.1, smask,
                                              frozen_below=fb)
            return state, step

        # ---- phase 1: frozen backbone, head-only, lr 1e-3 (:479-488)
        ref_cls_module.freeze_backbone(base)
        tf_p1 = run_keras_phase(1e-3, batches[: self.STEPS])

        state, step = make_flax_phase(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables["batch_stats"]),
            1e-3, None)
        key = jax.random.PRNGKey(3)
        jx_p1 = []
        for x, y in batches[: self.STEPS]:
            state, m = step(state, jnp.asarray(x), jnp.asarray(y), key)
            jx_p1.append(float(m["loss"]))
        d1 = np.abs(np.asarray(tf_p1) - np.asarray(jx_p1)).max()
        assert d1 <= 5e-4, f"phase-1 loss divergence {d1:.2e}\n{tf_p1}\n{jx_p1}"

        # ---- phase 2: unfreeze from mixed7, lr 1e-4 (:490-503), continuing
        # from each side's own phase-1 weights/stats
        ref_cls_module.unfreeze_from_layer(base, "mixed7")
        tf_p2 = run_keras_phase(1e-4, batches[self.STEPS :])

        state2, step2 = make_flax_phase(state.params, state.batch_stats,
                                        1e-4, "mixed7")
        jx_p2 = []
        for x, y in batches[self.STEPS :]:
            state2, m = step2(state2, jnp.asarray(x), jnp.asarray(y), key)
            jx_p2.append(float(m["loss"]))
        d2 = np.abs(np.asarray(tf_p2) - np.asarray(jx_p2)).max()
        # looser: unfrozen-BN batch statistics and their moving updates
        # compound across steps
        assert d2 <= 5e-3, f"phase-2 loss divergence {d2:.2e}\n{tf_p2}\n{jx_p2}"
