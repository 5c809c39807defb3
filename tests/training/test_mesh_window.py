"""Device-queue composition: windows over the mesh, and accumulation
inside the fused window.

Round-2 left exactly the configurations that scale re-paying per-step
dispatch: the window queue was exclusive with the mesh ``prepare_batch``
and the fused scan required ``accumulation_steps == 1``.  These tests pin
the lifted paths against their per-batch references on the 8-device
virtual CPU mesh (reference accumulation semantics:
utils/training.py:156-167).
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvs_of_training_framework_tpu.parallel import (
    make_mesh, make_sharded_fused_window_step, make_sharded_train_step,
    shard_host_batch, split_batch_for_mesh)
from dvs_of_training_framework_tpu.training.state import (
    create_train_state, make_fused_window_step, make_train_step)
from dvs_of_training_framework_tpu.training.train import train
from tests.training.test_device_queue import assert_same, make_setup
from tests.training.test_training import ListLogger

REPO = Path(__file__).resolve().parents[2]
TAGS = ['4x4', '8x8', '16x16', '32x32']


def run_mesh(model, params, tx, evaluator, batches, window, num_steps,
             n_dev=2, fused=False, accum=1, event_axis=None,
             wire_events='padded'):
    mesh_spec = f'data:{n_dev}' + \
        (f',event:{2}' if event_axis else '')
    mesh = make_mesh(mesh_spec)
    event_shards = 2 if event_axis else 1
    step, n_shards = make_sharded_train_step(
        model, evaluator, tx, [0.5, 1, 1], accumulation_steps=accum,
        mesh=mesh, event_axis=event_axis, window=window)
    step_fused = None
    if fused:
        step_fused = make_sharded_fused_window_step(
            model, evaluator, tx, [0.5, 1, 1], accumulation_steps=accum,
            mesh=mesh, window=window, event_axis=event_axis)

    def split_only(collated, capacity):
        return split_batch_for_mesh(
            collated, n_shards, capacity_per_shard=2048,
            event_shards=event_shards)

    if window > 0:
        prepare_batch = split_only

        def place_window(stacked):
            return shard_host_batch(stacked, mesh, event_axis=event_axis,
                                    window=True)
    else:
        place_window = None

        def prepare_batch(collated, capacity):
            return shard_host_batch(split_only(collated, capacity), mesh,
                                    event_axis=event_axis)

    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    logger = ListLogger()
    state, samples = train(step, state, list(batches), num_steps,
                           logger=logger, tags=TAGS,
                           accumulation_steps=accum,
                           event_capacity=4096, window=window,
                           metric_flush_steps=2,
                           prepare_batch=prepare_batch,
                           place_window=place_window,
                           train_step_fused=step_fused,
                           wire_events=wire_events)
    return state, samples, logger


def test_mesh_window_pooled_wire_matches_padded():
    """The per-shard-cell event pool (schema.pool_packed_wires with
    leading shard axes) is bit-identical to the padded wire under the
    mesh window step."""
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=2, num_steps=4),
                run_mesh(*setup, window=2, num_steps=4,
                         wire_events='pooled'))


def test_mesh_fused_window_pooled_wire():
    """Pooled wire through the sharded fused scan (index-scan branch)
    matches per-batch mesh training."""
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=0, num_steps=4),
                run_mesh(*setup, window=2, num_steps=4, fused=True,
                         wire_events='pooled'),
                exact=False)


def test_mesh_pooled_wire_with_event_axis():
    """Pooled wire composes with 2-D data x event sharding: the pool
    carries two leading shard axes, one cell per (data, event) pair."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=2, num_steps=4,
                         event_axis='event'),
                run_mesh(*setup, window=2, num_steps=4,
                         event_axis='event', wire_events='pooled'))


def test_mesh_window_matches_mesh_per_batch():
    """Window-staged mesh training == per-batch mesh training."""
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=0, num_steps=4),
                run_mesh(*setup, window=2, num_steps=4))


def test_mesh_fused_window_matches_mesh_per_batch():
    """The sharded lax.scan window (one dispatch per K sharded steps)
    matches per-batch mesh training."""
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=0, num_steps=4),
                run_mesh(*setup, window=2, num_steps=4, fused=True),
                exact=False)


def test_mesh_fused_window_with_event_axis():
    """Fused windows compose with 2-D data x event sharding."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=0, num_steps=4,
                         event_axis='event'),
                run_mesh(*setup, window=2, num_steps=4, fused=True,
                         event_axis='event'),
                exact=False)


def test_mesh_window_with_accumulation():
    """Mesh + window + accumulation_steps=2, fused vs per-batch."""
    setup = make_setup(4)
    assert_same(run_mesh(*setup, window=0, num_steps=2, accum=2),
                run_mesh(*setup, window=4, num_steps=2, accum=2,
                         fused=True),
                exact=False)


def run_single(model, params, tx, evaluator, batches, window, num_steps,
               accum, fused=False, wire_events='padded'):
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=accum, window=window)
    step_fused = None
    if fused:
        step_fused = make_fused_window_step(model, evaluator, tx,
                                            [0.5, 1, 1],
                                            accumulation_steps=accum,
                                            window=window)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    logger = ListLogger()
    state, samples = train(step, state, list(batches), num_steps,
                           logger=logger, tags=TAGS,
                           accumulation_steps=accum,
                           event_capacity=4096, window=window,
                           metric_flush_steps=2,
                           train_step_fused=step_fused,
                           wire_events=wire_events)
    return state, samples, logger


def test_fused_window_accum_pooled_wire():
    """Accumulation boundaries stay exact when the window rides the
    pooled event wire (the fused scan's index-scan branch)."""
    setup = make_setup(8)
    assert_same(run_single(*setup, window=4, num_steps=4, accum=2,
                           fused=True),
                run_single(*setup, window=4, num_steps=4, accum=2,
                           fused=True, wire_events='pooled'),
                exact=False)


def test_fused_window_with_accumulation():
    """Single-device fused window with accumulation_steps=2 matches the
    per-batch accumulation loop (reference utils/training.py:156-167)."""
    setup = make_setup(8)
    assert_same(run_single(*setup, window=0, num_steps=4, accum=2),
                run_single(*setup, window=4, num_steps=4, accum=2,
                           fused=True),
                exact=False)


def test_fused_window_accum_partial_tail():
    """Stream not divisible by the window: the per-step fallback must keep
    accumulation boundaries exact."""
    setup = make_setup(6)
    assert_same(run_single(*setup, window=0, num_steps=3, accum=2),
                run_single(*setup, window=4, num_steps=3, accum=2,
                           fused=True),
                exact=False)
