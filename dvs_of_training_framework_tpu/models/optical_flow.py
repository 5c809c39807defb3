"""Generic inference wrapper shared by model plugins.

Implements the ``OpticalFlow`` inference contract (reference
DummyNet/of.py:18-125): collate raw event windows into the padded device
batch, run the jitted network, return NHWC numpy flow.  Plugins instantiate
it with their Model class; the wrapper handles parameter loading, event
padding with capacity bucketing (one compile per bucket), and timestamp
normalisation.
"""
from pathlib import Path

import jax
import numpy as np

from ..data.schema import (EventBuffer, default_buckets, expand_events,
                           pack_events_wire, round_up_to_bucket)


class BaseOpticalFlow:
    """Compute optical flow for windows of raw events.

    Args:
        imsize: (height, width) of the produced flow.
        model_cls: the plugin's flax Model class.
        model: path to a parameters/checkpoint file (or None for fresh init).
        activation: activation name forwarded to the model.
        event_capacity: maximum events per call (bucketed below this).
        model_kwargs: extra Model construction kwargs.
    """

    def __init__(self,
                 imsize,
                 model_cls,
                 model=None,
                 activation='relu',
                 event_capacity=2 ** 19,
                 **model_kwargs):
        from .loader import filter_kwargs

        self.imsize = tuple(int(v) for v in imsize)
        kwargs = dict(model_kwargs)
        kwargs['activation'] = activation
        self._net = model_cls(**filter_kwargs(model_cls, kwargs))
        self._buckets = default_buckets(event_capacity)
        if model is not None and Path(str(model)).is_file():
            from ..training.serializer import read_params_file
            self._params = read_params_file(model)
        else:
            rng = jax.random.PRNGKey(0)
            ev, ts, si = self._dummy_inputs()
            self._params = self._net.init(rng, ev, ts, si,
                                          self.imsize)['params']
        # expand_events is a no-op for plain EventBuffers and unpacks the
        # 8 B/event wire records on device — inference uploads ride the
        # same compact wire as training (schema.pack_events_wire)
        self._apply = jax.jit(
            lambda p, e, t, s: self._net.apply({'params': p},
                                               expand_events(e), t, s,
                                               self.imsize),
            static_argnames=())

    def _dummy_inputs(self):
        import jax.numpy as jnp
        from ..data.schema import pad_events
        zeros = {k: np.zeros(0) for k in
                 ('x', 'y', 'timestamp', 'polarity', 'element_index',
                  'sample_index')}
        ev = pad_events(zeros, batch_size=1, capacity=self._buckets[0])
        L = getattr(self._net, 'max_sequence_length', 1)
        num_ts = L + 1
        return (ev, jnp.arange(num_ts, dtype=jnp.float32) * 0.04,
                jnp.zeros((num_ts,), jnp.int32))

    def load_state_dict(self, params):
        self._params = params

    def _collate(self, events, start, stop):
        from ..data.schema import pad_events
        rows = []
        sample_index = []
        for i, e in enumerate(events):
            e = np.asarray(e, dtype=np.float64)
            rows.append(e)
            sample_index.append(np.full(e.shape[1], i))
        flat = np.hstack(rows) if rows else np.zeros((4, 0))
        sample_index = (np.hstack(sample_index) if sample_index
                        else np.zeros(0))
        timestamps = np.hstack([[b, e] for b, e in zip(start, stop)])
        sample_idx = np.hstack([[i, i] for i in range(len(start))])
        min_t = timestamps.min()
        ev = {'x': flat[0], 'y': flat[1],
              'timestamp': flat[2] - min_t,
              'polarity': flat[3],
              'element_index': np.zeros_like(sample_index),
              'sample_index': sample_index}
        capacity = round_up_to_bucket(flat.shape[1], self._buckets)
        buf = pad_events(ev, batch_size=len(start), capacity=capacity)
        H, W = self.imsize
        if H <= 1024 and W <= 1024 and len(start) <= 63:
            try:
                # 8 B/event upload instead of 13; unpacked on device by
                # the expand_events wrapped into self._apply
                buf = pack_events_wire(buf)
            except OverflowError:
                pass  # out-of-bound field values: ship the exact wire
        return buf, (timestamps - min_t).astype(np.float32), \
            sample_idx.astype(np.int32)

    def __call__(self, events, start, stop, return_all=False):
        """Predict flow.

        Args:
            events: list of per-window ``(x, y, t, p)`` column stacks
                (``[4, N]`` arrays or 4-tuples of arrays); polarity ±1.
            start, stop: per-window timestamps.
            return_all: return predictions at every scale.

        Returns:
            ``[B, H, W, 2]`` numpy flow (finest scale), or a tuple per scale.
        """
        ev, timestamps, sample_idx = self._collate(events, start, stop)
        out = self._apply(self._params, ev, timestamps, sample_idx)
        flow = out[0]
        return self._postprocess(flow, return_all)

    @staticmethod
    def _postprocess(flow, return_all):
        def back(f):
            return np.transpose(np.asarray(f), (0, 2, 3, 1))
        if return_all:
            return tuple(map(back, flow))
        return back(flow[-1])
