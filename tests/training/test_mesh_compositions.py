"""Mesh composition lifts (round 4): --ev_images and --dynamic-sample-length
under --mesh.

Round 3 asserted these configurations away (train_flownet.py raw-only /
static-length mesh guards); these tests pin the lifted paths against their
single-device references on the virtual CPU mesh:

- dense event-image batches (the offline-quantized training mode, reference
  scripts/quantize_preprocessed.py:59-108 + utils/training.py:50-55) split
  on the sample axis;
- dynamic-length batches are slot-laid (schema.layout_sample_slots) BEFORE
  the shard split, so every shard carries the same static timestamp count.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dvs_of_training_framework_tpu.data.collate import (
    collate_dense_wrapper, collate_wrapper)
from dvs_of_training_framework_tpu.data.dataset import DatasetImpl
from dvs_of_training_framework_tpu.data.schema import pad_batch
from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                  load_model_class)
from dvs_of_training_framework_tpu.parallel import (
    make_mesh, make_sharded_fused_window_step, make_sharded_train_step,
    shard_host_batch, split_batch_for_mesh)
from dvs_of_training_framework_tpu.training.optimizers import \
    construct_optimizer
from dvs_of_training_framework_tpu.training.state import (create_train_state,
                                                          make_train_step)
from dvs_of_training_framework_tpu.training.train import train
from tests.helpers import data_path
from tests.training.test_device_queue import assert_same
from tests.training.test_training import ListLogger, make_args

REPO = Path(__file__).resolve().parents[2]
SHAPE = (64, 64)
DEPTH = 3
TAGS = ['4x4', '8x8', '16x16', '32x32']


def make_dense_setup(n_batches, batch_size=4):
    """Dense (--ev_images) batches + a small EVFlowNet consuming them."""
    module = load_model_class(REPO / 'EVFlowNet')

    def event_image_fn(events, start_ts, stop_ts, shape):
        return module.compute_event_image(events, start_ts, stop_ts, shape,
                                          depth=DEPTH)

    dataset = DatasetImpl(path=data_path, shape=list(SHAPE),
                          augmentation=False, collapse_length=1,
                          is_raw=False, event_image_fn=event_image_fn)
    batches = [collate_dense_wrapper(
        [dataset[(i * batch_size + j) % 10] for j in range(batch_size)])
        for i in range(n_batches)]
    model = module.Model(**filter_kwargs(module.Model, dict(
        event_representation_depth=DEPTH, base_channels=4)))
    probe = pad_batch(batches[0])
    params = model.init(jax.random.PRNGKey(0), probe.data,
                        probe.timestamps, probe.sample_idx, SHAPE,
                        raw=False)['params']
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in SHAPE) for i in range(4)][::-1])
    tx = construct_optimizer(make_args(), params)
    return model, params, tx, evaluator, batches


def make_dynamic_setup(n_batches, max_len=3):
    """Variable-length raw batches + an EVFlowNet sized for max_len."""
    module = load_model_class(REPO / 'EVFlowNet')
    dataset = DatasetImpl(path=data_path, shape=list(SHAPE),
                          augmentation=False, collapse_length=1,
                          is_raw=True, min_seq_length=1,
                          max_seq_length=max_len,
                          is_static_seq_length=False)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(n_batches):
        lengths = rng.integers(1, max_len + 1, size=4)
        samples = [dataset.__getitem__(int(i % 7), k=1, seq_length=int(sl))
                   for i, sl in enumerate(lengths)]
        batches.append(collate_wrapper(samples))
    model = module.Model(**filter_kwargs(module.Model, dict(
        max_sequence_length=max_len, dynamic_sample_length=True,
        event_representation_depth=DEPTH, base_channels=4)))
    probe = pad_batch(batches[0], capacity=4096, sequence_length=max_len)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        SHAPE)['params']
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in SHAPE) for i in range(4)][::-1])
    tx = construct_optimizer(make_args(), params)
    return model, params, tx, evaluator, batches


def run_any(model, params, tx, evaluator, batches, num_steps, *,
            is_raw, sequence_length=None, mesh_devices=0, window=0,
            fused=False):
    """Train on a mesh (mesh_devices > 0) or single-device (== 0)."""
    if mesh_devices:
        mesh = make_mesh(f'data:{mesh_devices}')
        step, n_shards = make_sharded_train_step(
            model, evaluator, tx, [0.5, 1, 1], accumulation_steps=1,
            mesh=mesh, is_raw=is_raw, window=window)
        step_fused = None
        if fused:
            step_fused = make_sharded_fused_window_step(
                model, evaluator, tx, [0.5, 1, 1], accumulation_steps=1,
                mesh=mesh, window=window, is_raw=is_raw)

        def split_only(collated, capacity):
            return split_batch_for_mesh(
                collated, n_shards, capacity_per_shard=2048,
                sequence_length=sequence_length)

        if window > 0:
            prepare_batch = split_only

            def place_window(stacked):
                return shard_host_batch(stacked, mesh, window=True)
        else:
            place_window = None

            def prepare_batch(collated, capacity):
                return shard_host_batch(split_only(collated, capacity),
                                        mesh)
    else:
        step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                               accumulation_steps=1, is_raw=is_raw,
                               window=window)
        step_fused = None
        prepare_batch = None
        place_window = None
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    logger = ListLogger()
    state, samples = train(step, state, list(batches), num_steps,
                           logger=logger, tags=TAGS, is_raw=is_raw,
                           accumulation_steps=1, event_capacity=4096,
                           window=window, metric_flush_steps=2,
                           sequence_length=sequence_length,
                           prepare_batch=prepare_batch,
                           place_window=place_window,
                           train_step_fused=step_fused)
    return state, samples, logger


def test_mesh_dense_matches_single_device():
    """--mesh x --ev_images: sample-axis sharding of dense batches
    reproduces single-device training."""
    setup = make_dense_setup(3)
    assert_same(run_any(*setup, num_steps=3, is_raw=False),
                run_any(*setup, num_steps=3, is_raw=False, mesh_devices=2),
                exact=False)


def test_mesh_dense_fused_window():
    """Dense batches through the mesh device queue + fused scan."""
    setup = make_dense_setup(4)
    assert_same(run_any(*setup, num_steps=4, is_raw=False, mesh_devices=2),
                run_any(*setup, num_steps=4, is_raw=False, mesh_devices=2,
                        window=2, fused=True),
                exact=False)


def test_mesh_dynamic_matches_single_device():
    """--mesh x --dynamic-sample-length: slot layout before the shard
    split reproduces the single-device dynamic path."""
    setup = make_dynamic_setup(3)
    assert_same(run_any(*setup, num_steps=3, is_raw=True,
                        sequence_length=3),
                run_any(*setup, num_steps=3, is_raw=True,
                        sequence_length=3, mesh_devices=2),
                exact=False)


def test_mesh_dynamic_fused_window():
    """Dynamic lengths through the mesh device queue + fused scan (the
    slot layout is static-shaped, so windows stack)."""
    setup = make_dynamic_setup(4)
    assert_same(run_any(*setup, num_steps=4, is_raw=True,
                        sequence_length=3, mesh_devices=2),
                run_any(*setup, num_steps=4, is_raw=True,
                        sequence_length=3, mesh_devices=2,
                        window=2, fused=True),
                exact=False)
