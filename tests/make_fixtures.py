"""Generate deterministic synthetic test fixtures.

Creates ``tests/data/seq/00000{0..9}.hdf5`` with the per-element schema the
framework consumes (events float64[N,4] (x,y,t,p), image1/image2 uint8
[260,346], scalar start/stop), mimicking the structure of MVSEC-derived
per-element files, plus ``tests/data/pred/*.hdf5`` golden flow predictions
(flow float32 [260,346,2]).

Consecutive elements chain: stop_i == start_{i+1} and image2_i == image1_{i+1}
(the dataset asserts both when merging elements).  All data is synthetic and
seeded — fixtures regenerate bit-identically.

Run: python tests/make_fixtures.py
"""
from pathlib import Path

import h5py
import numpy as np

HERE = Path(__file__).resolve().parent
SEQ_DIR = HERE / 'data' / 'seq'
PRED_DIR = HERE / 'data' / 'pred'

H, W = 260, 346
NUM_ELEMENTS = 10
FRAME_DT = 0.05  # seconds between frames
BASE_TS = 10.0   # non-zero start => exercises timestamp alignment


def smooth_image(rng, shape, num_blobs=40):
    """A smooth-ish random grayscale image (so warping is informative)."""
    img = np.zeros(shape, dtype=np.float64)
    ys, xs = np.mgrid[0:shape[0], 0:shape[1]]
    for _ in range(num_blobs):
        cy, cx = rng.uniform(0, shape[0]), rng.uniform(0, shape[1])
        sigma = rng.uniform(5, 40)
        amp = rng.uniform(20, 120)
        img += amp * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2)
                            / (2 * sigma ** 2))
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-6)
    return img.astype(np.uint8)


def drift_image(img, rng, shift):
    """Shift an image by an integer offset (simulating camera motion)."""
    dy, dx = shift
    out = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    return out


def make_events(rng, n, start, stop):
    x = rng.integers(0, W, size=n).astype(np.float64)
    y = rng.integers(0, H, size=n).astype(np.float64)
    t = np.sort(rng.uniform(start, stop, size=n))
    p = rng.choice([-1.0, 1.0], size=n)
    return np.stack([x, y, t, p], axis=1)


def main():
    SEQ_DIR.mkdir(parents=True, exist_ok=True)
    PRED_DIR.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260816)

    image = smooth_image(rng, (H, W))
    ts = BASE_TS
    for i in range(NUM_ELEMENTS):
        start, stop = ts, ts + FRAME_DT
        next_image = drift_image(image, rng,
                                 (int(rng.integers(-2, 3)),
                                  int(rng.integers(-2, 3))))
        n_events = int(rng.integers(150, 400))
        events = make_events(rng, n_events, start, stop)
        with h5py.File(SEQ_DIR / f'{i:06d}.hdf5', 'w') as f:
            f.create_dataset('events', data=events)
            f.create_dataset('image1', data=image)
            f.create_dataset('image2', data=next_image)
            f.create_dataset('start', data=np.float64(start))
            f.create_dataset('stop', data=np.float64(stop))
        # golden "prediction": a smooth synthetic flow field
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        flow = np.stack([
            2.0 * np.sin(2 * np.pi * ys / H + i),
            2.0 * np.cos(2 * np.pi * xs / W + i)], axis=2)
        with h5py.File(PRED_DIR / f'{i:06d}.hdf5', 'w') as f:
            f.create_dataset('flow', data=flow.astype(np.float32))
        image = next_image
        ts = stop
    print(f'wrote {NUM_ELEMENTS} fixture elements to {SEQ_DIR}')


if __name__ == '__main__':
    main()
