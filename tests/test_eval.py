"""Eval-layer tests: TTA equivalence, sliding window, threshold optimization,
bootstrap CIs, boundary metrics, end-to-end evaluator artifacts."""

import json

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adipose_tpu.eval.boundary import BoundaryRefiner, calculate_boundary_metrics
from adipose_tpu.eval.bootstrap import bootstrap_confidence_interval, safe_bootstrap_ci
from adipose_tpu.eval.sliding_window import SlidingWindowInference
from adipose_tpu.eval.threshold import (
    extract_slide_id,
    optimize_threshold_adaptive,
    optimize_threshold_f1,
    optimize_threshold_f1_slide_level,
)
from adipose_tpu.eval.tta import make_classifier_tta_predict, make_tta_predict


class TestTTA:
    def test_tta_on_equivariant_model_equals_plain(self, rng):
        """For a D4-equivariant predictor, TTA must equal a single pass."""

        def predict(params, images):  # mean-pool smoothing: rotation-equivariant
            k = jnp.ones((3, 3)) / 9.0
            pad = jnp.pad(images, ((0, 0), (1, 1), (1, 1)), mode="wrap")
            return jax.lax.conv_general_dilated(
                pad[:, None], k[None, None], (1, 1), "VALID"
            )[:, 0]

        x = jnp.asarray(rng.rand(2, 16, 16).astype(np.float32))
        for mode in ("minimal", "basic", "full"):
            tta = make_tta_predict(predict, mode)
            got = np.asarray(tta(None, x))
            want = np.asarray(predict(None, x))
            assert np.abs(got - want).max() < 1e-5, mode

    def test_tta_averages_views(self, rng):
        """For an orientation-SENSITIVE model, TTA must differ from plain and
        equal the hand-computed de-augmented mean."""
        from adipose_tpu.ops import d4

        def predict(params, images):  # top-half detector: not equivariant
            out = jnp.zeros_like(images)
            return out.at[:, : images.shape[1] // 2].set(1.0) * images

        x = jnp.asarray(rng.rand(1, 8, 8).astype(np.float32))
        tta = make_tta_predict(predict, "full")
        got = np.asarray(tta(None, x))[0]
        views = [np.asarray(d4.apply_transform(x[0], t)) for t in range(8)]
        preds = [np.asarray(predict(None, jnp.asarray(v[None])))[0] for v in views]
        want = np.mean(
            [np.asarray(d4.invert_transform(jnp.asarray(p), t)) for t, p in enumerate(preds)],
            axis=0,
        )
        assert np.abs(got - want).max() < 1e-6

    def test_classifier_tta_logit_space(self, rng):
        def predict(variables, images):
            return jnp.clip(jnp.mean(images, axis=(1, 2)), 0.01, 0.99)

        x = jnp.asarray(rng.rand(3, 8, 8).astype(np.float32))
        tta = make_classifier_tta_predict(predict, "full")
        got = np.asarray(tta(None, x))
        # mean over D4 views of a mean-pool is the same mean → sigmoid(logit(p))=p
        want = np.asarray(predict(None, x))
        assert np.abs(got - want).max() < 1e-5


class TestSlidingWindow:
    def test_identity_model_reconstructs_input(self, rng):
        sw = SlidingWindowInference(tile_size=32, overlap=0.5, batch_size=4)
        img = rng.rand(80, 96).astype(np.float32)
        out = sw.predict(lambda p, t: t, None, img)
        assert out.shape == img.shape
        assert np.abs(out - img).max() < 1e-5

    def test_small_image_padded(self, rng):
        sw = SlidingWindowInference(tile_size=64, overlap=0.5)
        img = rng.rand(40, 50).astype(np.float32)
        out = sw.predict(lambda p, t: t, None, img)
        assert out.shape == (40, 50)
        assert np.abs(out - img).max() < 1e-5

    def test_overlap_clamped(self):
        sw = SlidingWindowInference(tile_size=64, overlap=0.9)
        assert sw.overlap == 0.75

    def test_positions_empty_is_rank2(self):
        from adipose_tpu.ops.blend import sliding_window_positions

        pos = sliding_window_positions((40, 50), 64, 0.5)
        assert pos.shape == (0, 2)  # degenerate case must stay indexable


class TestThreshold:
    def test_extract_slide_id(self):
        assert (
            extract_slide_id("6 BEEF Shoulder -1_grid_5x5_r1_c2_r0_c1.jpg")
            == "6 BEEF Shoulder -1_grid_5x5_r1_c2"
        )
        assert extract_slide_id("plain_name.jpg") == "plain_name"

    def test_optimal_threshold_found(self, rng):
        # predictions well-separated at 0.6: GT positives ~0.8, negatives ~0.3
        preds, trues, paths = [], [], []
        for i in range(6):
            t = (rng.rand(32, 32) > 0.5).astype(np.float32)
            p = np.where(t > 0, 0.8, 0.3) + rng.randn(32, 32) * 0.02
            preds.append(p.astype(np.float32))
            trues.append(t)
            paths.append(f"slide{i % 2}_r{i}_c0.jpg")
        thr, scores = optimize_threshold_f1_slide_level(preds, trues, paths)
        assert 0.3 < thr < 0.8
        thr2, _ = optimize_threshold_f1(preds, trues)
        assert 0.3 < thr2 < 0.8
        thr3, _ = optimize_threshold_adaptive(preds, trues, paths)
        assert 0.3 < thr3 < 0.8

    def test_mixed_shape_predictions(self, rng):
        """Sliding-window datasets mix image sizes; the device F1 sweep must
        group per shape instead of np.stack-crashing (r5 review fix)."""
        preds, trues, paths = [], [], []
        for i, shape in enumerate([(32, 32), (48, 64), (32, 32), (48, 64)]):
            t = (rng.rand(*shape) > 0.5).astype(np.float32)
            preds.append(np.where(t > 0, 0.8, 0.3).astype(np.float32))
            trues.append(t)
            paths.append(f"slide{i % 2}_r{i}_c0.jpg")
        thr, scores = optimize_threshold_f1_slide_level(preds, trues, paths)
        assert 0.3 < thr < 0.8
        # result must equal the uniform-shape computation done pairwise
        from adipose_tpu.eval.threshold import _f1_matrix

        grid = np.arange(0.1, 0.95, 0.05)
        mixed = _f1_matrix(preds, trues, grid)
        for i in range(4):
            solo = _f1_matrix(preds[i : i + 1], trues[i : i + 1], grid)
            np.testing.assert_allclose(mixed[i], solo[0], rtol=1e-6)

    def test_threshold_grid_matches_reference(self):
        grid = np.arange(0.1, 0.95, 0.05)
        assert len(grid) == 17
        assert grid[0] == pytest.approx(0.1)
        assert grid[-1] == pytest.approx(0.9)


class TestBootstrap:
    def test_ci_contains_mean(self, rng):
        data = rng.randn(50) * 2 + 10
        point, lo, hi = bootstrap_confidence_interval(data)
        assert lo < point < hi
        assert point == pytest.approx(data.mean(), abs=1e-4)
        # 95% CI of mean of N(10,2)/sqrt(50) ≈ ±0.55
        assert 0.2 < (hi - lo) < 1.6

    def test_safe_handles_nan(self):
        data = np.array([1.0, np.nan, 2.0, np.inf, 3.0])
        point, (lo, hi) = safe_bootstrap_ci(data)
        assert point == pytest.approx(2.0)
        assert np.isfinite(lo) and np.isfinite(hi)

    def test_all_nan(self):
        point, (lo, hi) = safe_bootstrap_ci(np.array([np.nan]))
        assert np.isnan(point)

    def test_deterministic(self, rng):
        data = rng.rand(20)
        a = bootstrap_confidence_interval(data, n_bootstrap=500)
        b = bootstrap_confidence_interval(data, n_bootstrap=500)
        assert a == b


class TestBoundary:
    def test_identical_masks_zero_distance(self):
        m = np.zeros((64, 64))
        m[20:40, 20:40] = 1.0
        bm = calculate_boundary_metrics(m, m)
        assert bm["hausdorff95"] == pytest.approx(0.0, abs=1.0)
        assert bm["assd"] == pytest.approx(0.0, abs=0.5)

    def test_both_empty_zero(self):
        z = np.zeros((32, 32))
        bm = calculate_boundary_metrics(z, z)
        assert bm == {"hausdorff95": 0.0, "assd": 0.0}

    def test_one_empty_inf(self):
        z = np.zeros((32, 32))
        o = np.ones((32, 32))
        bm = calculate_boundary_metrics(o, z)
        assert np.isinf(bm["hausdorff95"])

    def test_shifted_square_distance(self):
        a = np.zeros((64, 64)); a[10:30, 10:30] = 1.0
        b = np.zeros((64, 64)); b[15:35, 10:30] = 1.0  # shifted 5 rows
        bm = calculate_boundary_metrics(a, b)
        assert 1.0 < bm["assd"] < 5.0
        assert bm["hausdorff95"] <= 5.0 + 1e-6

    def test_refiner_preserves_solid_mask(self):
        m = np.zeros((64, 64), np.float32)
        m[16:48, 16:48] = 1.0
        out = BoundaryRefiner().refine(m)
        # interior intact, result still ~binary
        assert out[30, 30] > 0.9
        assert out[5, 5] < 0.1


@pytest.fixture
def eval_fixture(tmp_path, rng):
    """Train-free evaluator fixture: random-init small net + tiny test set +
    checkpoint dir with the artifact contract."""
    from adipose_tpu.core.config import EvalConfig, UNetConfig
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.train import checkpoint as ckpt

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    model = DilatedUNet(init_nb=4, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
    ckpt.save_params(ckpt_dir, "weights_best_overall", params)
    ckpt.save_normalization_stats(ckpt_dir, 127.0, 50.0)
    ckpt.write_training_settings(ckpt_dir, {"use_deep_supervision": False})

    data = tmp_path / "test"
    (data / "images").mkdir(parents=True)
    (data / "masks").mkdir()
    for i in range(4):
        img = (rng.rand(64, 64) * 255).astype(np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[10:30, 10:30] = 255
        cv2.imwrite(str(data / "images" / f"s{i % 2}_r{i}_c0.jpg"), img)
        cv2.imwrite(str(data / "masks" / f"s{i % 2}_r{i}_c0.tif"), mask)
    return ckpt_dir, data


class TestEvaluator:
    def test_end_to_end_artifacts(self, eval_fixture, tmp_path):
        from adipose_tpu.core.config import EvalConfig, UNetConfig
        from adipose_tpu.eval.evaluator import PublicationEvaluator

        ckpt_dir, data = eval_fixture
        cfg = EvalConfig(n_bootstrap=200, batch_size=4)
        ev = PublicationEvaluator(ckpt_dir, cfg, UNetConfig(tile_size=64, init_nb=4, compute_dtype="float32"))
        results = ev.evaluate(data, dataset_name="test")
        assert results["n_tiles"] == 4
        assert results["n_slides"] == 2
        assert 0.1 <= results["optimal_threshold"] <= 0.9
        out = ckpt_dir / "evaluation" / "test_original"
        assert (out / "metrics.json").exists()
        assert (out / "predictions.csv").exists()
        assert (out / "test_comprehensive_results.csv").exists()
        loaded = json.loads((out / "metrics.json").read_text())
        assert set(loaded["metrics"]) == {
            "dice_score", "jaccard_index", "sensitivity", "specificity",
            "precision", "f1_score", "accuracy", "roc_auc", "pr_auc",
            "hausdorff95", "assd",
        }

    def test_tta_deflates_tile_batch(self, eval_fixture):
        """batch_size is the EFFECTIVE device batch: the TTA views fold into
        the forward batch, so the tile chunk must shrink by the view count
        (full 8-view TTA at batch 16 would otherwise push b=128 at 1024² and
        overflow HBM)."""
        from adipose_tpu.core.config import EvalConfig, UNetConfig
        from adipose_tpu.eval.evaluator import PublicationEvaluator

        ckpt_dir, _ = eval_fixture
        mcfg = UNetConfig(tile_size=64, init_nb=4, compute_dtype="float32")
        for mode, views in (("minimal", 2), ("basic", 4), ("full", 8)):
            ev = PublicationEvaluator(
                ckpt_dir, EvalConfig(use_tta=True, tta_mode=mode, batch_size=16),
                mcfg,
            )
            assert ev.n_views == views
            assert ev.tile_batch == 16 // views
        ev = PublicationEvaluator(
            ckpt_dir, EvalConfig(use_tta=False, batch_size=16), mcfg
        )
        assert ev.tile_batch == 16

    def test_tta_and_sliding_window_modes(self, eval_fixture):
        from adipose_tpu.core.config import EvalConfig, UNetConfig
        from adipose_tpu.eval.evaluator import PublicationEvaluator, build_output_dir

        ckpt_dir, data = eval_fixture
        cfg = EvalConfig(
            use_tta=True, tta_mode="minimal", use_sliding_window=True,
            sliding_overlap=0.5, n_bootstrap=100, batch_size=4,
        )
        ev = PublicationEvaluator(ckpt_dir, cfg, UNetConfig(tile_size=64, init_nb=4, compute_dtype="float32"))
        results = ev.evaluate(data, dataset_name="test", optimize_threshold=False)
        assert results["optimal_threshold"] == 0.5
        out = build_output_dir(ckpt_dir, data, cfg)
        assert out.name == "test_original_tta_minimal_sw_gaussian"


def test_boundary_metrics_threaded_matches_serial(rng):
    """The thread-pool path (≥16 tiles) returns per-tile values identical to
    the serial loop."""
    from adipose_tpu.eval.evaluator import _boundary_metrics_all

    preds = [rng.rand(32, 32).astype(np.float32) for _ in range(18)]
    trues = [(rng.rand(32, 32) > 0.6).astype(np.float32) for _ in range(18)]
    got = _boundary_metrics_all(preds, trues, 0.5)
    want = [calculate_boundary_metrics(p, t, 0.5) for p, t in zip(preds, trues)]
    assert got == want
