"""Model architecture tests: shapes, parameter counts, head contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.models import DilatedUNet, InceptionV3Classifier
from adipose_tpu.models.inception import (
    MIXED_CONV_START,
    backbone_param_mask,
    preprocess_tiles,
    unfreeze_conv_start,
)
from adipose_tpu.models.unet import encoder_param_mask, upsample_nearest_2x


SIZE = 128  # small tiles for CPU tests; architecture is size-agnostic


class TestUNet:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = DilatedUNet(init_nb=8, compute_dtype=jnp.float32)
        x = jnp.zeros((1, SIZE, SIZE))
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params

    def test_output_shape_and_range(self, model_and_params, rng):
        model, params = model_and_params
        x = jnp.asarray(rng.randn(2, SIZE, SIZE).astype(np.float32))
        out = model.apply(params, x)
        assert out.shape == (2, SIZE, SIZE)
        o = np.asarray(out)
        assert (o >= 0).all() and (o <= 1).all()  # softmax slice is a probability

    def test_deep_supervision_heads(self, rng):
        model = DilatedUNet(init_nb=8, use_deep_supervision=True, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.randn(1, SIZE, SIZE).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert set(out) == {"main_out", "aux_out1", "aux_out2"}
        for v in out.values():
            assert v.shape == (1, SIZE, SIZE)

    @pytest.mark.parametrize("lane_pad", [0, 64], ids=["lp0", "lp64"])
    def test_remat_level1_exact(self, rng, lane_pad):
        """remat_level1 (block-local recompute of the down1 block and the
        up1 tail + head) must be a pure scheduling change: identical param
        tree, forward, and gradients (f32 recompute is deterministic)."""
        base = DilatedUNet(init_nb=8, compute_dtype=jnp.float32,
                           dropout_rate=0.0, lane_pad=lane_pad)
        rl = base.clone(remat_level1=True)
        x = jnp.asarray(rng.randn(2, SIZE, SIZE).astype(np.float32))
        v1 = base.init(jax.random.PRNGKey(0), x)
        v2 = rl.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v1)
                == jax.tree_util.tree_structure(v2))
        np.testing.assert_array_equal(
            np.asarray(base.apply(v1, x)), np.asarray(rl.apply(v1, x)))

        def loss(params, model):
            out = model.apply(params, x, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean((out - 0.3) ** 2)

        g1 = jax.grad(loss)(v1, base)
        g2 = jax.grad(loss)(v1, rl)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fast_head_matches_softmax_head(self, rng):
        """sigmoid(logit-diff) head == softmax-slice head on the SAME params
        (exact reformulation; trainers run fast_head=False for its better
        backward memory layout, inference runs True — checkpoints must
        interchange freely)."""
        x = jnp.asarray(rng.randn(1, SIZE, SIZE).astype(np.float32))
        kw = dict(init_nb=8, use_deep_supervision=True, lane_pad=0,
                  compute_dtype=jnp.float32)
        fast = DilatedUNet(fast_head=True, **kw)
        slow = DilatedUNet(fast_head=False, **kw)
        params = fast.init(jax.random.PRNGKey(0), x)
        of = fast.apply(params, x)
        os_ = slow.apply(params, x)  # identical param tree
        for k in of:
            np.testing.assert_allclose(np.asarray(of[k]), np.asarray(os_[k]),
                                       atol=2e-6)

    def test_param_count_matches_reference_formula(self, model_and_params):
        """Conv param count is architecture-determined; verify against a
        hand-computed oracle for init_nb=8 (reference arch :660-758)."""
        _, params = model_and_params
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

        def conv(cin, cout, k=3):
            return cin * cout * k * k + cout

        f = 8
        want = 0
        want += conv(1, f) + conv(f, f)                     # down1
        want += conv(f, 2 * f) + conv(2 * f, 2 * f)         # down2
        want += conv(2 * f, 4 * f) + conv(4 * f, 4 * f)     # down3
        want += conv(4 * f, 8 * f) + 5 * conv(8 * f, 8 * f)  # dilate1..6
        want += conv(8 * f, 4 * f) + conv(8 * f, 4 * f) + conv(4 * f, 4 * f)  # up3
        want += conv(4 * f, 2 * f) + conv(4 * f, 2 * f) + conv(2 * f, 2 * f)  # up2
        want += conv(2 * f, f) + conv(2 * f, f) + conv(f, f)                  # up1
        want += conv(f, 2, 1)                               # output softmax
        assert n == want

    def test_encoder_mask_freezes_only_encoder(self, model_and_params):
        _, params = model_and_params
        mask = encoder_param_mask(params["params"])
        import flax

        flat = flax.traverse_util.flatten_dict(mask)
        frozen = {p for p, v in flat.items() if not v}
        assert frozen  # some layers frozen
        for path in frozen:
            assert any("down" in seg for seg in path)
        trainable = {p for p, v in flat.items() if v}
        assert any("dilate" in seg for p in trainable for seg in p)

    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        up = np.asarray(upsample_nearest_2x(x))[0, :, :, 0]
        want = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
        assert np.array_equal(up, want)

    def test_fused_upconv_equals_upsample_then_conv(self, rng):
        """The fused lhs-dilated decoder conv must exactly equal
        nearest-×2 upsample followed by a SAME 3×3 conv (f32)."""
        from adipose_tpu.models.unet import FusedUpsampleConv

        x = jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))
        mod = FusedUpsampleConv(4, jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(params, x)
        kernel = params["params"]["kernel"]
        bias = params["params"]["bias"]
        up = upsample_nearest_2x(x)
        want = jax.lax.conv_general_dilated(
            up, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        assert got.shape == want.shape == (2, 32, 32, 4)
        assert float(jnp.abs(got - want).max()) < 1e-4

    def test_lane_pad_bit_exact_same_tree(self, rng):
        """MXU-lane channel padding must be BIT-exact (zero products, same
        accumulation order) and must not change the param tree, so padded and
        unpadded models share checkpoints."""
        import flax

        from adipose_tpu.models.unet import DilatedUNet

        x = jnp.asarray(rng.rand(2, 64, 64).astype(np.float32) * 255)
        m0 = DilatedUNet(init_nb=4, compute_dtype=jnp.float32, lane_pad=0)
        mp = DilatedUNet(init_nb=4, compute_dtype=jnp.float32, lane_pad=16)
        p0 = m0.init(jax.random.PRNGKey(0), x)
        pp = mp.init(jax.random.PRNGKey(0), x)
        f0 = flax.traverse_util.flatten_dict(p0)
        fp = flax.traverse_util.flatten_dict(pp)
        assert set(f0) == set(fp)
        for k in f0:
            assert f0[k].shape == fp[k].shape
            assert np.array_equal(np.asarray(f0[k]), np.asarray(fp[k]))
        out0 = np.asarray(m0.apply(p0, x))
        outp = np.asarray(mp.apply(p0, x))
        assert np.array_equal(out0, outp)

    def test_dropout_inactive_in_eval(self, model_and_params, rng):
        model, params = model_and_params
        x = jnp.asarray(rng.randn(1, SIZE, SIZE).astype(np.float32))
        o1 = model.apply(params, x)
        o2 = model.apply(params, x)
        assert np.array_equal(np.asarray(o1), np.asarray(o2))


class TestInception:
    def test_classifier_shapes(self, rng):
        model = InceptionV3Classifier(compute_dtype=jnp.float32) if False else InceptionV3Classifier(dtype=jnp.float32)
        x = jnp.asarray(rng.rand(1, 299, 299, 3).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        probs = model.apply(params, x)
        assert probs.shape == (1,)
        assert 0.0 <= float(probs[0]) <= 1.0

    def test_backbone_conv_count(self, rng):
        model = InceptionV3Classifier(dtype=jnp.float32)
        x = jnp.zeros((1, 299, 299, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        convs = {
            k for k in params["params"]["backbone"] if k.startswith("cbn_")
        }
        assert len(convs) == 94  # Keras InceptionV3 has 94 conv layers

    def test_param_count_close_to_keras(self, rng):
        """Keras InceptionV3(include_top=False) has 21,802,784 params."""
        model = InceptionV3Classifier(dtype=jnp.float32)
        x = jnp.zeros((1, 299, 299, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        import flax

        flat = flax.traverse_util.flatten_dict(variables["params"])
        backbone = sum(
            int(np.prod(v.shape)) for p, v in flat.items() if p[0] == "backbone"
        )
        # flax BatchNorm with use_scale=False stores bias only in params;
        # moving mean/var live in batch_stats. Keras counts gamma-less BN as
        # bias + moving stats. Compare conv+bias totals:
        stats = flax.traverse_util.flatten_dict(variables["batch_stats"])
        stats_n = sum(int(np.prod(v.shape)) for v in stats.values())
        assert backbone + stats_n == 21802784

    def test_mask_phase1_freezes_backbone(self):
        model = InceptionV3Classifier(dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
        import flax

        mask = flax.traverse_util.flatten_dict(backbone_param_mask(params, None))
        assert all(not v for p, v in mask.items() if p[0] == "backbone")
        assert all(v for p, v in mask.items() if p[0] != "backbone")

    def test_mask_phase2_unfreezes_from_mixed7(self):
        model = InceptionV3Classifier(dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
        import flax

        mask = flax.traverse_util.flatten_dict(backbone_param_mask(params, "mixed7"))
        # Keras's unfreeze_from_layer flips at the CONCAT layer named
        # 'mixed7', which comes after mixed7's own convs — so the first
        # trainable conv is mixed8's (pinned to the live tf_keras graph by
        # test_tf_oracle.py::TestFrozenBNOracle::test_phase2_unfreeze_boundary)
        start = unfreeze_conv_start("mixed7")
        assert start == MIXED_CONV_START["mixed8"]
        for path, v in mask.items():
            if path[0] != "backbone":
                assert v
                continue
            seg = next((s for s in path if s.startswith("cbn_")), None)
            idx = int(seg.split("_")[1])
            assert v == (idx >= start), path

    def test_preprocess_tiles(self, rng):
        g = jnp.asarray((rng.rand(2, 64, 64) * 255).astype(np.float32))
        out = preprocess_tiles(g)
        assert out.shape == (2, 299, 299, 3)
        o = np.asarray(out)
        assert o.min() >= -1.0 - 1e-5 and o.max() <= 1.0 + 1e-5
        # channels identical (grayscale tiling)
        assert np.array_equal(o[..., 0], o[..., 1])
