"""Pin the reference framework's published numeric loss anchors.

``tests/data/reference_{seq,pred}/000001.hdf5`` are the reference
repository's own committed test DATA files (a real MVSEC-derived element
and its golden flow prediction; same on-disk schema as our fixtures).  The
constants below are the hard-coded golden values of the reference
test-suite (reference tests/loss/test_loss.py:41,63): reproducing them
within the reference's own 5e-6 tolerance proves the TPU loss implements
the reference objective bit-comparably on real data magnitudes — not just
on this repo's synthetic fixtures.
"""
from pathlib import Path

import h5py
import numpy as np

from tests.loss.test_loss import _evaluate

DATA = Path(__file__).resolve().parents[1] / 'data'

# reference tests/loss/test_loss.py crop + anchors
BOX_H, BOX_W = 246, 340
REFERENCE_ZERO_FLOW = (0.002, 0.622660, 0.0)
REFERENCE_PRED_FLOW = (0.002120, 0.652659, 0.007802)


def _load_reference_case(read_pred):
    with h5py.File(DATA / 'reference_seq' / '000001.hdf5', 'r') as f:
        start = float(f['start'][()])
        stop = float(f['stop'][()])
        image1 = np.asarray(f['image1'])[:BOX_H, :BOX_W]
        image2 = np.asarray(f['image2'])[:BOX_H, :BOX_W]
    images = np.stack([image1, image2])[:, None].astype(np.float32)
    timestamps = np.array([0, stop - start], np.float32)
    if read_pred:
        with h5py.File(DATA / 'reference_pred' / '000001.hdf5', 'r') as f:
            flow = np.asarray(f['flow'])[:BOX_H, :BOX_W]
        flow = flow.transpose(2, 0, 1)[None].astype(np.float32)
    else:
        flow = np.zeros((1, 2, BOX_H, BOX_W), np.float32)
    return images, timestamps, flow


def test_reference_zero_flow_anchor():
    images, timestamps, flow = _load_reference_case(read_pred=False)
    got = _evaluate(images, timestamps, flow)
    for i, (value, anchor) in enumerate(zip(got, REFERENCE_ZERO_FLOW)):
        assert abs(value - anchor) < 5e-6, f'[{i}] {value} vs {anchor}'


def test_reference_pred_flow_anchor():
    images, timestamps, flow = _load_reference_case(read_pred=True)
    got = _evaluate(images, timestamps, flow)
    for i, (value, anchor) in enumerate(zip(got, REFERENCE_PRED_FLOW)):
        assert abs(value - anchor) < 5e-6, f'[{i}] {value} vs {anchor}'
