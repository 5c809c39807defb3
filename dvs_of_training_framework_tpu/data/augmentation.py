"""Host-side event/image augmentation primitives (NumPy).

Behavioural parity targets in the reference: utils/data.py (EventCrop 24-42,
image crops 45-117, RandomRotation 155-220, get_count_image 120-136,
frame_generator 139-152, central_shift 14-21).  Semantics are pinned by
tests/dataset/test_dataset.py in both repos.  Rotation uses the native C++
``event_map`` kernel (see ``..native``).
"""
import math

import numpy as np

from ..native import event_map


def prod(iterable):
    out = 1
    for value in iterable:
        out *= value
    return out


def central_shift(in_shape, out_shape):
    """Top-left corner of the centered ``out_shape`` box inside ``in_shape``."""
    return tuple((x - y) // 2 for x, y in zip(in_shape, out_shape))


class EventCrop:
    """Keep only events inside box ``[y0, x0, h, w]`` and shift coordinates."""

    def __init__(self, box):
        self.box = box

    def __call__(self, events, box=None):
        if box is None:
            box = self.box
        x = events[:, 0]
        y = events[:, 1]
        mask = ((x >= box[1]) & (x < box[1] + box[3])
                & (y >= box[0]) & (y < box[0] + box[2]))
        events = events[mask]
        events[:, [1, 0]] -= np.array(box[:2]).reshape(1, -1)
        return events


def crop_images(img, box, channel_first):
    """Crop ``img`` to box ``[y0, x0, h, w]``.

    Handles channel-last IO by moving the channel axis next to the spatial
    axes for the slice and back afterwards; 2-D images are treated as
    channel-first.
    """
    moved = img.ndim > 2 and not channel_first
    if moved:
        # (..., H, W, C) -> (..., C, H, W)
        img = np.rollaxis(img, img.ndim - 1, img.ndim - 3)
    y0, x0, h, w = box[0], box[1], box[2], box[3]
    res = img[..., y0:y0 + h, x0:x0 + w]
    if moved:
        res = np.rollaxis(res, img.ndim - 3, img.ndim)
    return res


class _CropPolicy:
    """Callable crop with a box-choice policy (subclasses pick the box)."""

    def __init__(self, return_box=False, channel_first=False):
        self.return_box = return_box
        self.channel_first = channel_first

    def _choose_box(self, img):
        raise NotImplementedError

    def __call__(self, img, box=None):
        channel_first = self.channel_first or img.ndim == 2
        if box is None:
            # choose on the channel-first view so shape[-2:] is spatial
            view = img if channel_first else \
                np.rollaxis(img, img.ndim - 1, img.ndim - 3)
            box = self._choose_box(view)
        res = crop_images(img, box, channel_first)
        return (res, box) if self.return_box else res


class ImageCrop(_CropPolicy):
    """Crop with a fixed box."""

    def __init__(self, box, return_box=False, channel_first=False):
        super().__init__(return_box, channel_first)
        self.box = box

    def _choose_box(self, _):
        return self.box


class ImageCentralCrop(_CropPolicy):
    """Crop the centered ``shape`` region."""

    def __init__(self, shape, return_box=False, channel_first=False):
        super().__init__(return_box, channel_first)
        self.shape = shape

    def _choose_box(self, img):
        return list(central_shift(img.shape[-2:], self.shape)) \
            + list(self.shape)


class ImageRandomCrop(_CropPolicy):
    """Crop a uniformly random ``shape`` region."""

    def __init__(self, shape, return_box=False, channel_first=False):
        super().__init__(return_box, channel_first)
        self.shape = shape

    def _choose_box(self, img):
        slack = [x - y for x, y in zip(img.shape[-2:], self.shape)]
        start = [np.random.randint(s) if s else 0 for s in slack]
        return start + list(self.shape)


def get_count_image(events, imsize):
    """Per-pixel event counts.

    Args:
        events: sequence ``[x, y, t, p]`` of equal-length arrays.
        imsize: ``(height, width)``.
    """
    x, y = [np.asarray(v).astype(int) for v in events[:2]]
    idx = np.ravel_multi_index([y, x], imsize)
    res = np.zeros(imsize, dtype=np.uint64).ravel()
    np.add.at(res, idx, np.ones(idx.size))
    return res.reshape(imsize)


def frame_generator(events, frames):
    """Yield ``(events_in_window, start, stop)`` per timestamp pair."""
    frames = np.array(frames)
    t = events[2]
    idx = np.searchsorted(t, frames.ravel(), side='right').reshape(-1, 2)
    for (start, stop), (i_start, i_stop) in zip(frames, idx):
        yield [p[i_start:i_stop] for p in events], start, stop


def RandomRotation(interval, shape):
    """Build a rotation closure with precomputed index maps.

    Returned callable: ``rotation(images, events, angle=None) ->
    (rotated_images, rotated_events, angle)``.  ``images`` is ``[C, H, W]``;
    ``events`` rows are ``(x, y, t, p, ...)``.  Rotation is performed as a
    pixel-index permutation so events and images co-rotate exactly; the event
    remap runs through the native C++ kernel.
    """
    x, y = np.meshgrid(range(shape[1]), range(shape[0]))
    x, y = x.ravel(), y.ravel()
    idx = np.ravel_multi_index([y, x], shape)

    xc = x.astype(float) - shape[1] / 2
    yc = y.astype(float) - shape[0] / 2

    if not hasattr(interval, '__len__'):
        interval = abs(interval)
        interval = (-interval, interval)
    assert len(interval) == 2, 'Specify at most two angles'
    assert interval[0] <= interval[1]

    def extend_indices(index, num_samples, im_shape):
        channel_size = prod(im_shape)
        sample_shift = np.arange(num_samples).reshape(-1, 1) * channel_size
        return (sample_shift + index.reshape(1, -1)).reshape(-1)

    def rotation(images, events, angle=None):
        if angle is None:
            angle = (np.random.rand() * (interval[1] - interval[0])
                     + interval[0])
        rad = angle * math.pi / 180
        cos_a, sin_a = math.cos(rad), math.sin(rad)
        # source pixel of each destination pixel, rotated about the center
        x1 = np.rint(cos_a * xc - sin_a * yc + shape[1] / 2)
        y1 = np.rint(sin_a * xc + cos_a * yc + shape[0] / 2)
        x1, y1 = x1.astype(int), y1.astype(int)

        mask = (x1 >= 0) & (x1 < shape[1]) & (y1 >= 0) & (y1 < shape[0])
        cur_idx = idx[mask]                                   # destination
        cur_ridx = np.ravel_multi_index([y1[mask], x1[mask]], shape)  # source

        num_channels = images.shape[0]
        multi_cur_idx = extend_indices(cur_idx, num_channels, shape)
        multi_cur_ridx = extend_indices(cur_ridx, num_channels, shape)

        # image[dst] = image[src]
        rimages = np.zeros_like(images).ravel()
        rimages[multi_cur_idx] = images.ravel()[multi_cur_ridx]
        rimages = rimages.reshape(images.shape)

        # events at src move to dst (native kernel)
        revents = event_map(events.astype(np.float32).copy(),
                            images.shape[1:],
                            cur_ridx.astype(np.uint64),
                            cur_idx.astype(np.uint64))
        return rimages, revents, angle

    return rotation
