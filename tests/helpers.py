"""Shared test helpers: fixture loading, event concat, structural compare."""
from pathlib import Path

import h5py
import numpy as np

test_path = Path(__file__).resolve().parent
data_path = test_path / 'data' / 'seq'
pred_path = test_path / 'data' / 'pred'

from dvs_of_training_framework_tpu.data.augmentation import (  # noqa: E402
    EventCrop, ImageCrop)


def read_test_elem(i,
                   element_index=None,
                   box=(0, 0, np.inf, np.inf),
                   read_pred=False):
    """Load fixture element ``i`` cropped to ``box`` as an event dict."""
    filename = f'{i:06d}.hdf5'
    with h5py.File(data_path / filename, 'r') as f:
        events = np.array(f['events'])
        start = float(f['start'][()])
        stop = float(f['stop'][()])
        image1 = np.array(f['image1'])
        image2 = np.array(f['image2'])
    images = (image1, image2)
    if read_pred:
        with h5py.File(pred_path / filename, 'r') as f:
            images = (*images, np.array(f['flow']))
    box = np.array(box)
    shape = np.array(images[0].shape[:2])
    box[:2] = np.minimum(box[:2], shape)
    box[2:] = np.minimum(shape - box[:2], box[2:])
    box = box.astype(int)
    events = EventCrop(box=box)(events)
    events = {'x': events[:, 0].astype(np.int64),
              'y': events[:, 1].astype(np.int64),
              'timestamp': events[:, 2],
              'polarity': events[:, 3].astype(np.int64)}
    if element_index is not None:
        events['element_index'] = np.full_like(events['x'], element_index,
                                               dtype=np.int_)
    image_crop = ImageCrop(box=box, return_box=False, channel_first=False)
    images = tuple(map(image_crop, images))
    return (events, start, stop, *images)


def concat_events(*argv):
    keys = {'x', 'y', 'polarity', 'timestamp', 'element_index'}
    if len(argv) == 0:
        return {k: [] for k in keys}
    return {k: np.hstack([x[k] for x in argv]) for k in keys}


def compare(computed, groundtruth, prefix=''):
    """Deep exact-equality structural diff over nested dict/tuple/arrays."""
    if isinstance(computed, np.ndarray):
        assert isinstance(groundtruth, np.ndarray), prefix
        assert computed.shape == groundtruth.shape, \
            f'{prefix}: {computed.shape} vs {groundtruth.shape}'
        assert (computed == groundtruth).all(), prefix
        return
    if isinstance(computed, (int, np.integer)):
        assert isinstance(groundtruth, (int, np.integer)), prefix
        assert computed == groundtruth, prefix
        return
    if isinstance(computed, tuple):
        assert isinstance(groundtruth, tuple), prefix
        computed = {f'{i}': v for i, v in enumerate(computed)}
        groundtruth = {f'{i}': v for i, v in enumerate(groundtruth)}
    assert isinstance(computed, dict) and isinstance(groundtruth, dict), prefix
    assert len(computed) == len(groundtruth), \
        f'{prefix}: {computed.keys()} {groundtruth.keys()}'
    for k in computed.keys():
        assert k in groundtruth, f'{prefix}.{k}'
        compare(computed[k], groundtruth[k], prefix=prefix + f'.{k}')
