"""RecurrentFlowNet — ConvGRU recurrent model plugin.

Covers the recurrent model family of the reference ecosystem (its
``recurrent_flownet`` plugin, referenced at reference .dockerignore:14):
per-element voxel grids are folded through a convolutional GRU over the
sample's element sequence, and the flow for the predicted element is
decoded from the recurrent state.  The recurrence runs as ``lax.scan``
over the (static) sequence axis — XLA-friendly, no Python loops.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvs_of_training_framework_tpu.ops import segment_starts
from EVFlowNet.net import (Predictor, QuantizationLayer, get_activation)


class ConvGRUCell(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        inp = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.channels, (3, 3),
                                   dtype=self.dtype, name='update')(inp))
        r = jax.nn.sigmoid(nn.Conv(self.channels, (3, 3),
                                   dtype=self.dtype, name='reset')(inp))
        cand = jnp.tanh(nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                                name='candidate')(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * cand


class Model(nn.Module):
    """Recurrent plugin model (same contract as EVFlowNet.Model)."""
    prefix_length: int = 0
    suffix_length: int = 0
    max_sequence_length: int = 2
    dynamic_sample_length: bool = False
    event_representation_depth: int = 9
    activation: str = 'relu'
    base_channels: int = 32
    hidden_channels: int = 32
    dtype: str = 'float32'

    def setup(self):
        dtype = jnp.dtype(self.dtype)
        self.quantization_layer = QuantizationLayer(
            depth=self.event_representation_depth, dtype=dtype)
        self.encoder = nn.Conv(self.hidden_channels, (3, 3), dtype=dtype,
                               name='embed')
        self.gru = ConvGRUCell(self.hidden_channels, dtype=dtype)
        self.predictor = Predictor(base_channels=self.base_channels,
                                   activation=self.activation,
                                   dtype=dtype)

    def _batch_size(self, timestamps):
        num_timestamps = self.max_sequence_length + 1
        assert timestamps.shape[0] % num_timestamps == 0
        return timestamps.shape[0] // num_timestamps

    def quantize(self, events, timestamps, sample_idx, imsize):
        batch_size = self._batch_size(timestamps)
        grid = self.quantization_layer(events, timestamps, sample_idx,
                                       tuple(imsize),
                                       self.max_sequence_length, batch_size)
        return grid.transpose(0, 3, 1, 2).astype(jnp.float32)

    def __call__(self,
                 events,
                 timestamps: jnp.ndarray,
                 sample_idx: jnp.ndarray,
                 imsize: Tuple[int, int],
                 raw: bool = True,
                 intermediate: bool = False):
        imsize = tuple(imsize)
        batch_size = self._batch_size(timestamps)
        L = self.max_sequence_length
        C = self.event_representation_depth
        H, W = imsize
        act = get_activation(self.activation)

        if raw:
            grid = self.quantization_layer(events, timestamps, sample_idx,
                                           imsize, L, batch_size)
        else:
            grid = jnp.transpose(events, (0, 2, 3, 1)) \
                .astype(jnp.dtype(self.dtype))
        # [B, H, W, L, C] -> scan over the element axis
        grid = grid.reshape(batch_size, H, W, L, C)
        elems = jnp.moveaxis(grid, 3, 0)            # [L, B, H, W, C]

        h = jnp.zeros((batch_size, H, W, self.hidden_channels),
                      jnp.dtype(self.dtype))
        # static unroll over the (small) element axis; parameters are shared
        # across iterations, so this is the scan XLA sees after fusion
        state = h
        for e in range(L):
            x = act(self.encoder(elems[e]))
            h = self.gru(h, x)
            if e == self.prefix_length:
                state = h

        flows_nhwc, features = self.predictor(state)
        flows = tuple(jnp.transpose(f, (0, 3, 1, 2)) for f in flows_nhwc)

        starts = segment_starts(sample_idx, batch_size)
        flow_ts = jnp.stack(
            [timestamps[starts + self.prefix_length],
             timestamps[starts + self.prefix_length + 1]], axis=1)
        flow_sample_idx = jnp.arange(batch_size, dtype=jnp.int32)

        if intermediate:
            return flows, flow_ts, flow_sample_idx, tuple(features)
        return flows, flow_ts, flow_sample_idx


def compute_event_image(events, start_ts, stop_ts, shape, depth=9,
                        **ignored):
    from EVFlowNet.net import compute_event_image as _impl
    return _impl(events, start_ts, stop_ts, shape, depth=depth)
