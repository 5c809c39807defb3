"""Evaluation metrics: analytic cases + cv2 oracle for the remap."""
import numpy as np
import pytest

from dvs_of_training_framework_tpu.evaluation import (
    estimate_corresponding_gt_flow, flow_error_dense)
from dvs_of_training_framework_tpu.evaluation.flow_metrics import \
    _remap_nearest


def test_flow_error_dense_analytic():
    H, W = 20, 30
    gt = np.ones((H, W, 2), np.float32)
    pred = np.zeros((H, W, 2), np.float32)
    events = np.zeros((H, W))
    events[5:10, 5:10] = 3  # only these pixels count
    AEE, pct, n = flow_error_dense(gt, pred, events)
    assert n == 25
    np.testing.assert_allclose(AEE, np.sqrt(2), rtol=1e-6)
    assert pct == pytest.approx(1.0, abs=1e-4)  # sqrt(2) < 3 px

    # invalid GT (inf / zero) pixels are excluded
    gt2 = gt.copy()
    gt2[6, 6] = np.inf
    gt2[7, 7] = 0
    _, _, n2 = flow_error_dense(gt2, pred, events)
    assert n2 == 23

    # car crop: only top 190 rows evaluated
    H2 = 260
    gt3 = np.ones((H2, W, 2), np.float32)
    ev3 = np.zeros((H2, W))
    ev3[0, 0] = 1
    ev3[200, 0] = 1
    _, _, n3 = flow_error_dense(gt3, np.zeros_like(gt3), ev3, is_car=True)
    assert n3 == 1


def test_remap_matches_cv2():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(0)
    src = rng.normal(size=(40, 50)).astype(np.float32)
    mapx = rng.uniform(-5, 55, size=(40, 50)).astype(np.float32)
    mapy = rng.uniform(-5, 45, size=(40, 50)).astype(np.float32)
    ours = _remap_nearest(src, mapx, mapy)
    theirs = cv2.remap(src, mapx, mapy, cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, theirs)


def test_gt_flow_short_window_scales_linearly():
    H, W = 8, 10
    gt_ts = np.array([0.0, 1.0, 2.0])
    x_flow = np.ones((2, H, W), np.float32) * 4
    y_flow = np.ones((2, H, W), np.float32) * 2
    # window inside one GT interval -> linear scaling
    xs, ys = estimate_corresponding_gt_flow(x_flow, y_flow, gt_ts,
                                            0.0, 0.5)
    np.testing.assert_allclose(xs, 2.0)
    np.testing.assert_allclose(ys, 1.0)


def test_gt_flow_propagation_accumulates():
    H, W = 16, 16
    gt_ts = np.array([0.0, 1.0, 2.0, 3.0])
    # uniform unit shift per GT interval
    x_flow = np.ones((3, H, W), np.float32)
    y_flow = np.ones((3, H, W), np.float32)
    xs, ys = estimate_corresponding_gt_flow(x_flow, y_flow, gt_ts,
                                            0.0, 2.0)
    # interior pixels accumulate two unit steps
    np.testing.assert_allclose(xs[:-3, :-3], 2.0)
    np.testing.assert_allclose(ys[:-3, :-3], 2.0)


def test_evaluate_with_zero_flow_predictor():
    """End-to-end evaluate(): zero-flow predictor -> AEE == mean |GT|."""
    import importlib
    from dvs_of_training_framework_tpu.evaluation import evaluate
    plugin = importlib.import_module('DummyFlowNet')
    H, W = 32, 48
    of = plugin.OpticalFlow((H, W), event_capacity=4096)
    rng = np.random.default_rng(1)
    n = 600
    t = np.sort(rng.uniform(0, 3.0, n))
    events = [rng.integers(0, W, n).astype(np.float64),
              rng.integers(0, H, n).astype(np.float64),
              t,
              rng.choice([-1.0, 1.0], n)]
    frames = [(0.2, 0.4), (0.5, 0.7)]
    gt = {'timestamps': np.arange(0, 4.0, 0.25),
          'x_flow_dist': np.full((16, H, W), 1.0, np.float32),
          'y_flow_dist': np.zeros((16, H, W), np.float32)}
    mAEE, mpAEE = evaluate(of, events, frames, gt)
    # GT displacement over a 0.2s window inside a 0.25s GT interval is
    # 1 * 0.2/0.25 = 0.8 px; zero prediction -> AEE 0.8 everywhere
    assert mAEE == pytest.approx(0.8, rel=1e-3)
    assert mpAEE == pytest.approx(1.0, abs=1e-3)


def test_evaluate_batched_matches_single():
    """batch_windows > 1 (batched device inference) must reproduce the
    window-at-a-time AEE/%AEE exactly, including a partial final block."""
    import importlib
    from dvs_of_training_framework_tpu.evaluation import evaluate
    plugin = importlib.import_module('EVFlowNet')
    H, W = 32, 32
    of = plugin.OpticalFlow((H, W), event_capacity=4096)
    rng = np.random.default_rng(3)
    n = 900
    t = np.sort(rng.uniform(0, 3.0, n))
    events = [rng.integers(0, W, n).astype(np.float64),
              rng.integers(0, H, n).astype(np.float64),
              t,
              rng.choice([-1.0, 1.0], n)]
    frames = [(0.1 + 0.3 * i, 0.3 + 0.3 * i) for i in range(5)]
    gt = {'timestamps': np.arange(0, 4.0, 0.25),
          'x_flow_dist': rng.uniform(-1, 1, (16, H, W)).astype(np.float32),
          'y_flow_dist': rng.uniform(-1, 1, (16, H, W)).astype(np.float32)}
    a = evaluate(of, events, frames, gt, batch_windows=1)
    b = evaluate(of, events, frames, gt, batch_windows=3)
    np.testing.assert_allclose(b, a, rtol=1e-6)
