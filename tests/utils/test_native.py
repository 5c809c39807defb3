"""Native C++ event_map kernel: correctness against the NumPy reference."""
import numpy as np

from dvs_of_training_framework_tpu import native


def test_native_library_loads():
    assert native._load() is not None, 'C++ kernel must build in CI'


def _random_case(rng, h=32, w=48, n=500):
    events = np.stack([
        rng.integers(0, w, n).astype(np.float32),
        rng.integers(0, h, n).astype(np.float32),
        rng.uniform(0, 1, n).astype(np.float32),
        rng.choice([-1.0, 1.0], n).astype(np.float32),
        rng.integers(0, 3, n).astype(np.float32),
    ], axis=1)
    # random partial permutation of pixels
    n_map = (h * w) // 2
    src = rng.choice(h * w, size=n_map, replace=False).astype(np.uint64)
    dst = rng.permutation(h * w)[:n_map].astype(np.uint64)
    return events, (h, w), src, dst


def test_matches_numpy_fallback():
    rng = np.random.default_rng(7)
    for _ in range(5):
        events, shape, src, dst = _random_case(rng)
        out_native = native.event_map(events, shape, src, dst)
        out_numpy = native._event_map_numpy(events, shape, src, dst)
        assert out_native.shape == out_numpy.shape
        assert np.array_equal(out_native, out_numpy)


def test_identity_map_keeps_all_events():
    rng = np.random.default_rng(3)
    h, w = 16, 16
    events = np.stack([
        rng.integers(0, w, 100).astype(np.float32),
        rng.integers(0, h, 100).astype(np.float32),
        rng.uniform(0, 1, 100).astype(np.float32),
        rng.choice([-1.0, 1.0], 100).astype(np.float32),
    ], axis=1)
    idx = np.arange(h * w, dtype=np.uint64)
    out = native.event_map(events, (h, w), idx, idx)
    assert np.array_equal(out, events)


def test_unmapped_pixels_drop_events():
    events = np.array([[0, 0, 0.1, 1], [5, 5, 0.2, -1]], dtype=np.float32)
    # only pixel (0,0) is mapped, to (2,3) -> x=3, y=2 on an 8x8 grid
    src = np.array([0], dtype=np.uint64)
    dst = np.array([2 * 8 + 3], dtype=np.uint64)
    out = native.event_map(events, (8, 8), src, dst)
    assert out.shape == (1, 4)
    assert out[0, 0] == 3 and out[0, 1] == 2
    assert out[0, 2] == np.float32(0.1) and out[0, 3] == 1
