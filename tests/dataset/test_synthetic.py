"""The varied-motion synthetic generator: GT exactness and spatial variation.

Round-4 accuracy evidence rests on scripts/make_synthetic_mvsec.py
``--motion varied`` producing spatially-varying flow FIELDS whose GT is
analytically exact; these tests pin (a) the GT/frame consistency (warping
frame i+1 by the GT reconstructs frame i far better than identity or the
wrong sign), (b) genuine spatial variation (a constant 2-vector cannot fit
a frame pair), and (c) the constant-flow-oracle machinery that turns (b)
into the benchmark's skeptic row (VERDICT round 3, item 1).
"""
import importlib.util
from pathlib import Path

import numpy as np
import pytest

from dvs_of_training_framework_tpu.evaluation.flow_metrics import (
    constant_flow_oracle, flow_error_dense, geometric_median, masked_gt)

REPO = Path(__file__).resolve().parents[2]


@pytest.fixture(scope='module')
def generator():
    spec = importlib.util.spec_from_file_location(
        'make_synthetic_mvsec', REPO / 'scripts' / 'make_synthetic_mvsec.py')
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope='module')
def varied(generator):
    rng = np.random.default_rng(7)
    return generator.simulate_varied(rng, 1.0, 0.0, speed=0.35)


def test_varied_events_well_formed(varied):
    events, frames, frame_ts, gt = varied
    assert events.shape[0] > 10_000
    assert np.all(np.diff(events[:, 2]) >= 0)
    assert events[:, 0].min() >= 0 and events[:, 0].max() <= 345
    assert events[:, 1].min() >= 0 and events[:, 1].max() <= 259
    assert set(np.unique(events[:, 3])) <= {-1.0, 1.0}
    assert gt['x_flow_dist'].shape == (frames.shape[0] - 1, 260, 346)


def test_varied_gt_is_spatially_varying(varied):
    _, _, _, gt = varied
    u, v = gt['x_flow_dist'], gt['y_flow_dist']
    std = np.sqrt(u.std(axis=(1, 2)) ** 2 + v.std(axis=(1, 2)) ** 2)
    # every frame pair carries at least 1 px of cross-frame flow variation
    assert std.min() > 1.0, std.min()


def test_varied_gt_warp_consistency(varied):
    """frame_{i+1}(p + gt(p)) ~ frame_i(p): the GT convention and axes are
    right iff warping with the GT beats identity AND the negated GT."""
    from scipy.ndimage import map_coordinates
    events, frames, frame_ts, gt = varied
    ys, xs = np.mgrid[0:260, 0:346].astype(np.float64)
    sl = (slice(20, 240), slice(20, 326))
    for i in (0, 10):
        f0 = frames[i].astype(np.float64)
        f1 = frames[i + 1].astype(np.float64)
        u, v = gt['x_flow_dist'][i], gt['y_flow_dist'][i]
        warped = map_coordinates(f1, [ys + v, xs + u], order=1,
                                 mode='nearest')
        wrong = map_coordinates(f1, [ys - v, xs - u], order=1,
                                mode='nearest')
        err = np.abs(warped - f0)[sl].mean()
        assert err < 0.5 * np.abs(f1 - f0)[sl].mean()
        assert err < 0.33 * np.abs(wrong - f0)[sl].mean()


def test_oracle_has_residual_on_varied_gt(varied):
    """A single 2-vector cannot fit a varied-motion frame pair: the best
    constant predictor keeps >= 0.5 px AEE even with a dense mask."""
    _, _, _, gt = varied
    flow = np.dstack([gt['x_flow_dist'][0], gt['y_flow_dist'][0]])
    counts = np.ones(flow.shape[:2])
    aee, _, n, vec = constant_flow_oracle(flow, counts)
    assert n == flow.shape[0] * flow.shape[1]
    assert aee > 0.5, aee
    # ... and the oracle vector is the best constant: nudging it is worse
    for delta in ([0.5, 0], [0, -0.5]):
        worse, _, _ = flow_error_dense(
            flow, np.broadcast_to(vec + np.array(delta, np.float32),
                                  flow.shape), counts)
        assert worse > aee


def test_oracle_is_exact_on_constant_gt():
    """On rounds-2/3-style constant GT the oracle scores ~0 — which is why
    that data could not demonstrate flow-field estimation."""
    flow = np.full((40, 60, 2), 3.25, np.float32)
    counts = np.ones((40, 60))
    aee, paee, n, vec = constant_flow_oracle(flow, counts)
    assert aee == pytest.approx(0.0, abs=1e-5)
    assert paee == pytest.approx(1.0, abs=1e-4)
    np.testing.assert_allclose(vec, [3.25, 3.25], atol=1e-5)


def test_geometric_median_beats_mean_on_skewed():
    pts = np.array([[0.0, 0.0]] * 9 + [[10.0, 0.0]])
    med = geometric_median(pts)
    np.testing.assert_allclose(med, [0.0, 0.0], atol=1e-3)
    aee_med = np.linalg.norm(pts - med, axis=1).mean()
    aee_mean = np.linalg.norm(pts - pts.mean(axis=0), axis=1).mean()
    assert aee_med < aee_mean


def test_masked_gt_matches_flow_error_dense():
    """The exposed mask is THE metric's mask: scoring through masked_gt
    reproduces flow_error_dense bit-for-bit."""
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 70, 2)).astype(np.float32)
    gt[3, 4] = np.inf
    gt[5, 6] = 0
    pred = rng.normal(size=(50, 70, 2)).astype(np.float32)
    counts = (rng.uniform(size=(50, 70)) > 0.6).astype(np.int64)
    ref = flow_error_dense(gt, pred, counts, is_car=True)
    gt_m, apply = masked_gt(gt, counts, is_car=True)
    ee = np.linalg.norm(gt_m - apply(pred), axis=-1)
    assert ref[0] == pytest.approx(ee.mean())
    assert ref[2] == ee.shape[0]
