"""Dynamic sample length: uniform-slot layout + end-to-end training.

The reference supports per-sample-random sequence lengths
(--dynamic-sample-length, reference utils/options.py:104-107) through ragged
batches (reference DummyNet/net.py:5-39).  The TPU build re-lays variable
lengths into fixed per-sample timestamp/image slots (schema.
layout_sample_slots) so every length mix shares ONE static shape — and one
XLA compile.
"""
from pathlib import Path

import jax
import numpy as np

from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from dvs_of_training_framework_tpu.data.dataset import DatasetImpl
from dvs_of_training_framework_tpu.data.schema import (layout_sample_slots,
                                                       pad_batch)
from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from dvs_of_training_framework_tpu.losses.loss import combined_loss
from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                  load_model_class)
from tests.helpers import data_path

REPO = Path(__file__).resolve().parents[2]
SHAPE = (64, 64)


def make_collated(lengths, seed=0):
    """Collated batch with per-sample sequence lengths ``lengths``."""
    dataset = DatasetImpl(path=data_path, shape=list(SHAPE),
                          augmentation=False, collapse_length=1,
                          is_raw=True, min_seq_length=1,
                          max_seq_length=max(lengths),
                          is_static_seq_length=False)
    samples = [dataset.__getitem__(i, k=1, seq_length=sl)
               for i, sl in enumerate(lengths)]
    return collate_wrapper(samples)


def test_layout_sample_slots():
    max_len = 3
    collated = make_collated([1, 3, 2])
    out = layout_sample_slots(collated, max_len)
    S = max_len + 1
    B = collated['size']
    assert out['timestamps'].shape == (B * S,)
    assert out['sample_idx'].shape == (B * S,)
    assert out['images'].shape[0] == B * S

    src_sidx = np.asarray(collated['sample_idx'])
    for b, n_ts in zip(range(B), [2, 4, 3]):
        block = slice(b * S, (b + 1) * S)
        # real entries first, in order
        np.testing.assert_array_equal(
            out['timestamps'][block][:n_ts],
            np.asarray(collated['timestamps'])[src_sidx == b])
        assert (out['sample_idx'][block][:n_ts] == b).all()
        # padding marked out-of-range (NOT -1: negative indices wrap in
        # scatter ops like segment_starts)
        assert (out['sample_idx'][block][n_ts:] == B).all()
        assert (out['images'][block.start + n_ts:block.stop] == 0).all()

    # a full-length batch maps to itself
    full = make_collated([3, 3])
    ident = layout_sample_slots(full, 3)
    np.testing.assert_array_equal(ident['timestamps'], full['timestamps'])
    np.testing.assert_array_equal(ident['sample_idx'], full['sample_idx'])
    np.testing.assert_array_equal(ident['images'], full['images'])


def make_model_and_params(max_len, probe_batch):
    module = load_model_class(REPO / 'EVFlowNet')
    kwargs = filter_kwargs(module.Model, dict(
        max_sequence_length=max_len, dynamic_sample_length=True,
        event_representation_depth=3, base_channels=4))
    model = module.Model(**kwargs)
    params = model.init(jax.random.PRNGKey(0), probe_batch.events,
                        probe_batch.timestamps, probe_batch.sample_idx,
                        SHAPE)['params']
    return model, params


def test_dynamic_batches_share_one_shape_and_train():
    max_len = 3
    capacity = 8192
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in SHAPE) for i in range(4)][::-1])

    batches = [make_collated([1, 2]), make_collated([3, 1]),
               make_collated([2, 2])]
    padded = [pad_batch(b, capacity=capacity, sequence_length=max_len)
              for b in batches]
    # every length mix shares the static slotted shape -> one compile
    shapes = {(p.timestamps.shape, p.sample_idx.shape, p.images.shape)
              for p in padded}
    assert len(shapes) == 1

    model, params = make_model_and_params(max_len, padded[0])

    @jax.jit
    def loss_of(params, batch):
        def apply(p, e, t, s, i):
            return model.apply({'params': p}, e, t, s, i)
        out = apply(params, batch.events, batch.timestamps,
                    batch.sample_idx, SHAPE)
        flows, flow_ts, flow_sample_idx = out[:3]
        loss, _ = combined_loss(evaluator, flows, flow_ts, flow_sample_idx,
                                batch.images, batch.timestamps,
                                batch.sample_idx)
        return loss

    losses = [float(loss_of(params, p)) for p in padded]
    assert all(np.isfinite(v) for v in losses)

    # flow_ts of sample b must be its own first element window, not padding
    out = model.apply({'params': params}, padded[1].events,
                      padded[1].timestamps, padded[1].sample_idx, SHAPE)
    flow_ts = np.asarray(out[1])
    ts = np.asarray(padded[1].timestamps).reshape(2, max_len + 1)
    np.testing.assert_allclose(flow_ts, ts[:, :2], rtol=1e-6)


def test_dynamic_full_length_matches_static_path():
    """When every sample has max length the dynamic layout is the identity,
    so the loss must equal the static path bit-for-bit."""
    max_len = 2
    capacity = 8192
    collated = make_collated([2, 2])
    dyn = pad_batch(collated, capacity=capacity, sequence_length=max_len)
    static = pad_batch(collated, capacity=capacity)

    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in SHAPE) for i in range(4)][::-1])
    model, params = make_model_and_params(max_len, dyn)

    def loss_of(batch):
        out = model.apply({'params': params}, batch.events,
                          batch.timestamps, batch.sample_idx, SHAPE)
        loss, _ = combined_loss(evaluator, out[0], out[1], out[2],
                                batch.images, batch.timestamps,
                                batch.sample_idx)
        return float(loss)

    assert loss_of(dyn) == loss_of(static)
