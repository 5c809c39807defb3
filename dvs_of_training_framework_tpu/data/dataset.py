"""Raw per-element dataset and sample assembly (host-side NumPy).

Reads the per-element HDF5 schema produced by ``scripts/sequence2samples.py``
(one file per inter-frame window: ``events float64[N,4]``, ``image1``,
``image2``, scalar ``start``/``stop``) and assembles samples of
``seq_length`` consecutive elements with collapse-k merging, flip/rotation/
crop augmentation, and fp32 timestamp alignment.

Parity target: reference utils/dataset.py:600-796 (DatasetImpl), 551-597
(IterableDataset/Dataset), with the same injectable augmentation parameters
(idx, k, is_flip, angle, box, seq_length) that make augmentation samplable in
production but deterministic in tests.
"""
from pathlib import Path
import random

import h5py
import numpy as np

from .augmentation import (EventCrop, ImageCentralCrop, ImageRandomCrop,
                           RandomRotation)


def read_info(filename):
    """Read ``{sequence_name: start_time}`` from an info HDF5 file."""
    with h5py.File(filename, 'r') as f:
        sets = [x.decode() for x in f['set_name']]
        start_times = list(f['start_time'])
    return dict(zip(sets, start_times))


def add_sample_index(events, i):
    """Append an element-index column to an ``[N, 4]`` event array."""
    return np.hstack((events, np.full_like(events[:, [0]], i)))


class DatasetImpl:
    """Assembles training samples from per-element HDF5 files."""

    def __init__(self,
                 path,                 # path to the dataset directory
                 shape,                # (H, W) of images to produce
                 augmentation=False,   # apply augmentation
                 collapse_length=6,    # max elements merged per flow target
                 min_seq_length=1,     # min flow predictions per sample
                 max_seq_length=1,     # max flow predictions per sample
                 is_static_seq_length=True,
                 is_raw=True,          # raw events vs event images
                 is_align=True,        # shift timestamps to start at 0
                 angle=30,             # max rotation angle (degrees)
                 event_image_fn=None):  # events -> dense image converter
        self.path = Path(path)
        self.files = sorted(self.path.glob('*.hdf5'),
                            key=lambda x: int(x.stem))
        assert len(self.files) > 0, f"No hdf5 files found in {self.path}"
        assert min_seq_length <= max_seq_length
        assert min_seq_length >= 1
        assert not is_static_seq_length or min_seq_length == max_seq_length
        self.augmentation = augmentation
        self.shape = shape
        self.collapse_length = collapse_length
        self.min_seq_length = min_seq_length
        self.max_seq_length = max_seq_length
        self.is_static_seq_length = is_static_seq_length
        self.is_raw = is_raw
        self.is_align = is_align
        self.angle = angle
        self.random_rotation = None  # built lazily once image shape is known
        self.event_image_fn = event_image_fn

        self.event_crop_fun = EventCrop(box=None)
        kwargs = dict(shape=shape, return_box=True, channel_first=True)
        if self.augmentation:
            self.img_crop_fun = ImageRandomCrop(**kwargs)
        else:
            self.img_crop_fun = ImageCentralCrop(**kwargs)

    def __len__(self):
        n = len(self.files)
        if self.is_static_seq_length:
            return n - self.max_seq_length + 1
        return n

    def _get_k_elems(self, idx, k):
        """Read and merge k consecutive elements into one flow window."""
        events = []
        stop = -1
        image1 = start = image2 = None
        for i in range(k):
            with h5py.File(self.files[idx + i], 'r') as f:
                events.append(np.array(f['events']))
                if i == 0:
                    image1 = np.array(f['image1'])
                    start = float(f['start'][()])
                else:
                    assert stop == float(f['start'][()])
                image2 = np.array(f['image2'])
                stop = float(f['stop'][()])
        events = np.vstack(events)
        return events, start, stop, image1, image2

    def _rotate(self, images, events, angle):
        if self.random_rotation is None:
            self.random_rotation = RandomRotation(self.angle,
                                                  images.shape[-2:])
        return self.random_rotation(images, events, angle)

    def __getitem__(self,
                    idx,
                    k=None,
                    is_flip=None,
                    angle=None,
                    box=None,
                    seq_length=None):
        """Return ``(events, image_ts, images, augmentation_params)``.

        Keyword overrides pin every random augmentation choice, keeping the
        production API samplable but tests deterministic (the technique the
        reference test-suite relies on).
        """
        if seq_length is None:
            if self.augmentation:
                if self.is_static_seq_length:
                    seq_length = self.max_seq_length
                else:
                    choices = min(len(self.files) - idx, self.max_seq_length)
                    seq_length = np.random.randint(choices) + 1
            else:
                seq_length = self.min_seq_length

        if k is None:
            if self.augmentation:
                max_k = (len(self.files) - idx) // seq_length
                choices = min(self.collapse_length, max_k)
                k = np.random.randint(choices) + 1
            else:
                k = 1

        assert idx + k * seq_length <= len(self.files)

        events = None
        image_ts = None
        images = None
        for i in range(seq_length):
            _events, _start, _stop, _image1, _image2 = \
                self._get_k_elems(idx + i * k, k)
            assert _image1.ndim == _image2.ndim
            assert _image1.shape == _image2.shape
            if _image1.ndim == 2:
                _image1 = _image1[None]
                _image2 = _image2[None]
            else:
                assert _image1.ndim == 3
                _image1 = np.rollaxis(_image1, 2, 0)
                _image2 = np.rollaxis(_image2, 2, 0)
            _events = add_sample_index(_events, i)
            if events is None:
                events = [_events]
                image_ts = [_start, _stop]
                images = [_image1, _image2]
            else:
                events.append(_events)
                image_ts.append(_stop)
                images.append(_image2)
        events = np.vstack(events)
        image_ts = np.array(image_ts)
        images = np.concatenate(images, axis=0)

        # Align timestamps to 0 before the float32 cast: MVSEC epoch
        # timestamps do not survive fp32 rounding.
        if self.is_align:
            start_ts = image_ts[0]
            events[:, 2] -= start_ts
            image_ts = image_ts - start_ts

        events = events.astype(np.float32)

        if self.augmentation:
            is_flip = np.random.rand() < 0.5 if is_flip is None else is_flip
            if is_flip:
                images = images[..., ::-1]
                events[:, 0] = images.shape[-1] - events[:, 0] - 1
            images, events, angle = self._rotate(images, events, angle)
        else:
            is_flip = False
            angle = 0

        # crop (box=None lets the crop policy choose)
        images, box = self.img_crop_fun(images, box=box)
        events = self.event_crop_fun(events, box=box)

        images = images.astype(np.float32)
        assert all(events[:, 2] >= image_ts[0])
        assert all(events[:, 2] <= image_ts[-1])

        if self.is_raw:
            elements = {'x': events[:, 0].astype(np.int64),
                        'y': events[:, 1].astype(np.int64),
                        'timestamp': events[:, 2],
                        'polarity': events[:, 3].astype(np.int64),
                        'element_index': events[:, 4].astype(np.int64)}
        else:
            assert self.event_image_fn is not None, \
                'event_image_fn is required when is_raw=False (--ev_images)'
            elements = self.event_image_fn(events,
                                           image_ts[:-1],
                                           image_ts[1:],
                                           self.shape)

        box = np.array(box, dtype=int)
        is_flip = np.array([is_flip], dtype=bool)
        return (elements,
                image_ts,
                images,
                (idx, seq_length, k, box, angle, is_flip))


class Dataset:
    """Finite map-style dataset."""

    def __init__(self, **kwargs):
        self._dataset = DatasetImpl(**kwargs)

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[idx]


class IterableDataset:
    """Infinite reshuffled iterator over a DatasetImpl."""

    def __init__(self, **kwargs):
        self._shuffle = kwargs.pop('shuffle', False)
        self._dataset = DatasetImpl(**kwargs)

    @property
    def impl(self):
        return self._dataset

    def index_stream(self):
        """Infinite stream of (re)shuffled dataset indices."""
        shuffle_fun = random.shuffle if self._shuffle else (lambda x: None)
        order = list(range(len(self._dataset)))
        shuffle_fun(order)
        i = 0
        while True:
            yield order[i]
            i += 1
            if i == len(order):
                i = 0
                shuffle_fun(order)

    def __iter__(self):
        return (self._dataset[i] for i in self.index_stream())
