"""Flow rendering: HSV conversion parity against cv2, panel assembly."""
import numpy as np
import pytest

from dvs_of_training_framework_tpu.utils.visualization import flow2img


def test_flow2img_shape_and_range():
    rng = np.random.default_rng(0)
    fx = rng.normal(size=(32, 40)).astype(np.float32)
    fy = rng.normal(size=(32, 40)).astype(np.float32)
    img = flow2img(fx, fy)
    assert img.shape == (32, 40, 3)
    assert img.dtype == np.uint8


def test_flow2img_matches_cv2():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(1)
    fx = rng.normal(size=(24, 30)).astype(np.float32)
    fy = rng.normal(size=(24, 30)).astype(np.float32)

    ours = flow2img(fx, fy)

    flows = np.stack((fx, fy), axis=2)
    mag = np.linalg.norm(flows, axis=2)
    ang = np.arctan2(fy, fx)
    ang += np.pi
    ang *= 180. / np.pi / 2.
    hsv = np.zeros([fx.shape[0], fx.shape[1], 3], dtype=np.uint8)
    hsv[:, :, 0] = ang.astype(np.uint8)
    hsv[:, :, 1] = 255
    hsv[:, :, 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    # integer rounding differs by at most 1-2 LSB between implementations
    diff = np.abs(ours.astype(int) - want.astype(int))
    assert diff.max() <= 2, diff.max()


def test_visualize_prediction_panel():
    from visualize import visualize_prediction
    from DummyFlowNet.test import vis_flow
    rng = np.random.default_rng(2)
    flows = [rng.normal(size=(2, s, s)).astype(np.float32)
             for s in (8, 16, 32, 64)]
    panel = visualize_prediction(flows, vis_flow)
    # finest scale on top, smaller scales in a strip below
    assert panel.shape == (64 + 32, 64, 3)
    assert panel.dtype == np.uint8


def test_prepare_text_statistics():
    from types import SimpleNamespace
    from visualize import prepare_text
    batch = {
        'events': {'element_index': np.zeros(100, np.int64)},
        'augmentation_params': {'sequence_length': np.array([1])},
    }
    args = SimpleNamespace(prefix_length=0, suffix_length=0)
    parts = [(0.1,), (0.2,), (0.3,)]
    text, stats = prepare_text(args, batch, 0.45, parts, [0.5, 1, 1])
    assert 'loss: 0.4500' in text
    assert stats['pred_size'] == 100
    assert stats['smoothness'] == [0.1]
