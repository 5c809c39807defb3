"""Minimal conforming model plugin: zero-flow predictions at 4 scales.

The TPU analogue of the reference's DummyNet plugin (DummyNet/net.py:42-80):
it demonstrates the plugin contract (multi-scale flows + per-prediction
timestamps/sample indices) with a trivially jittable computation.  A single
learnable (2,) bias — initialised to zero so the first forward still returns
exact zeros — keeps the end-to-end training smoke test exercising real
gradients.
"""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dvs_of_training_framework_tpu.ops import segment_starts


class Model(nn.Module):
    prefix_length: int = 0
    suffix_length: int = 0
    max_sequence_length: int = 1

    def quantize(self, events, timestamps, sample_idx, imsize):
        """Trivial dense representation (the plugin contract's optional
        quantize head; this model ignores events, so it is all zeros)."""
        num_timestamps = self.max_sequence_length + 1
        batch_size = timestamps.shape[0] // num_timestamps
        H, W = imsize
        return jnp.zeros((batch_size, self.max_sequence_length, H, W),
                         jnp.float32)

    @nn.compact
    def __call__(self,
                 events,
                 timestamps: jnp.ndarray,
                 sample_idx: jnp.ndarray,
                 imsize: Tuple[int, int],
                 raw: bool = True,
                 intermediate: bool = False):
        num_elements = self.max_sequence_length
        num_timestamps = num_elements + 1
        assert timestamps.shape[0] % num_timestamps == 0, \
            'timestamps must hold (sequence_length + 1) entries per sample'
        batch_size = timestamps.shape[0] // num_timestamps

        # scales imsize // 2^i for i = 3..0 (smallest first)
        outsize = [tuple(x // 2 ** i for x in imsize)
                   for i in range(4)][::-1]

        flow_bias = self.param('flow_bias', nn.initializers.zeros, (2,))
        flows = tuple(
            jnp.zeros((batch_size, 2, h, w), jnp.float32)
            + flow_bias[None, :, None, None]
            for h, w in outsize)

        # timestamps of the predicted element: local indices
        # [prefix_length, prefix_length + 1] inside each sample's block
        starts = segment_starts(sample_idx, batch_size)
        flow_ts = jnp.stack(
            [timestamps[starts + self.prefix_length],
             timestamps[starts + self.prefix_length + 1]], axis=1)
        flow_sample_idx = jnp.arange(batch_size, dtype=jnp.int32)

        if intermediate:
            return flows, flow_ts, flow_sample_idx, tuple()
        return flows, flow_ts, flow_sample_idx


def compute_event_image(events, start_ts, stop_ts, shape, depth=9,
                        **_ignored):
    """Host-side event->image conversion for the --ev_images pipeline
    (plugin contract point 4, reference utils/dataset.py:11,783-789).

    The dummy representation is the signed per-element event count image,
    broadcast over ``depth`` channels.

    Args:
        events: float32 ``[N, 5]`` rows ``(x, y, t, p, element_index)``.
        start_ts, stop_ts: per-element window bounds, each ``[L]``.
        shape: (H, W).
        depth: channels per element.

    Returns:
        float32 ``[L, depth, H, W]`` dense representation.
    """
    H, W = shape
    L = len(start_ts)
    counts = np.zeros((L, H, W), np.float32)
    if events.shape[0]:
        x = events[:, 0].astype(np.int64)
        y = events[:, 1].astype(np.int64)
        p = events[:, 3].astype(np.float32)
        e = events[:, 4].astype(np.int64)
        np.add.at(counts, (e, y, x), p)
    return np.repeat(counts[:, None], depth, axis=1)
