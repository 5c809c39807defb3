"""Device-side input queue: window-staged training == per-batch training.

The queue uploads K batches at once and the jitted step slices batch
``micro_step % K`` on device (data/device_queue.py,
state.make_train_step(window=K)) — values must be bit-identical to the
per-batch path.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from dvs_of_training_framework_tpu.data.dataset import Dataset
from dvs_of_training_framework_tpu.data.schema import pad_batch
from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                  load_model_class)
from dvs_of_training_framework_tpu.training.optimizers import \
    construct_optimizer
from dvs_of_training_framework_tpu.training.state import (
    create_train_state, make_fused_window_step, make_train_step)
from dvs_of_training_framework_tpu.training.train import train
from tests.helpers import data_path
from tests.training.test_training import ListLogger, make_args

REPO = Path(__file__).resolve().parents[2]
SHAPE = (32, 32)


def make_setup(n_batches):
    module = load_model_class(REPO / 'EVFlowNet')
    kwargs = filter_kwargs(module.Model, dict(
        event_representation_depth=3, base_channels=4))
    model = module.Model(**kwargs)
    dataset = Dataset(path=data_path, shape=list(SHAPE),
                      augmentation=False, collapse_length=1, is_raw=True,
                      max_seq_length=1)
    batches = [collate_wrapper([dataset[i], dataset[i + 1]])
               for i in range(n_batches)]
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in SHAPE) for i in range(4)][::-1])
    probe = pad_batch(batches[0], capacity=4096)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        SHAPE)['params']
    tx = construct_optimizer(make_args(), params)
    return model, params, tx, evaluator, batches


def run(model, params, tx, evaluator, batches, window, num_steps,
        fused=False, wire_events='padded'):
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=1, window=window)
    step_fused = None
    if fused:
        step_fused = make_fused_window_step(model, evaluator, tx,
                                            [0.5, 1, 1],
                                            accumulation_steps=1,
                                            window=window)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    logger = ListLogger()
    state, samples = train(step, state, list(batches), num_steps,
                           logger=logger, tags=['4x4', '8x8', '16x16',
                                                '32x32'],
                           event_capacity=4096, window=window,
                           metric_flush_steps=2,
                           train_step_fused=step_fused,
                           wire_events=wire_events)
    return state, samples, logger


def assert_same(res_a, res_b, exact=True):
    state_a, samples_a, log_a = res_a
    state_b, samples_b, log_b = res_b
    assert samples_a == samples_b
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        if exact:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            # scan fuses/reorders float ops slightly differently than the
            # standalone step program: ulp-level drift is expected
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    if exact:
        assert log_a.scalars == log_b.scalars
    else:
        assert len(log_a.scalars) == len(log_b.scalars)
        for (tag_a, val_a, s_a), (tag_b, val_b, s_b) in \
                zip(log_a.scalars, log_b.scalars):
            assert (tag_a, s_a) == (tag_b, s_b)
            np.testing.assert_allclose(val_a, val_b, rtol=1e-4,
                                       atol=1e-7)


def test_window_matches_per_batch():
    setup = make_setup(4)
    assert_same(run(*setup, window=0, num_steps=4),
                run(*setup, window=2, num_steps=4))


def test_partial_final_window():
    """3 batches with window 2: the final window is repeat-padded but only
    its valid slice is stepped."""
    setup = make_setup(3)
    assert_same(run(*setup, window=0, num_steps=3),
                run(*setup, window=2, num_steps=3))


def test_window_larger_than_stream():
    setup = make_setup(2)
    assert_same(run(*setup, window=0, num_steps=2),
                run(*setup, window=8, num_steps=2))


def test_fused_window_matches_per_batch():
    """The lax.scan fused window (one dispatch per K steps) must match
    per-batch training exactly, logged metrics included."""
    setup = make_setup(4)
    assert_same(run(*setup, window=0, num_steps=4),
                run(*setup, window=2, num_steps=4, fused=True),
                exact=False)


def test_fused_partial_tail_falls_back():
    """A partial final window cannot fuse; the per-step path finishes."""
    setup = make_setup(5)
    assert_same(run(*setup, window=0, num_steps=5),
                run(*setup, window=2, num_steps=5, fused=True),
                exact=False)


def test_pooled_wire_matches_per_batch():
    """--wire-events pooled (one flat pool of valid events per window,
    schema.PooledEventWire) must train bit-identically to per-batch
    training — only the wire layout changes, never a value."""
    setup = make_setup(4)
    assert_same(run(*setup, window=0, num_steps=4),
                run(*setup, window=2, num_steps=4, wire_events='pooled'))


def test_pooled_wire_partial_final_window():
    """The repeat-padded final window aliases the last real batch's pool
    region; only the valid slices are stepped."""
    setup = make_setup(3)
    assert_same(run(*setup, window=0, num_steps=3),
                run(*setup, window=2, num_steps=3, wire_events='pooled'))


def test_pooled_wire_fused_matches_padded_fused():
    """The fused scan's pooled branch (index scan + dynamic_slice into
    the pool) must match the padded xs-scan."""
    setup = make_setup(4)
    assert_same(run(*setup, window=2, num_steps=4, fused=True),
                run(*setup, window=2, num_steps=4, fused=True,
                    wire_events='pooled'),
                exact=False)


def test_window_resume_misaligned_rejected():
    """A state resumed mid-window must be refused: the on-device
    ``micro_step % K`` slice would silently pick the wrong staged batch."""
    import pytest
    model, params, tx, evaluator, batches = make_setup(2)
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=1, window=2)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    state = state.replace(micro_step=jnp.asarray(1, jnp.int32))
    with pytest.raises(AssertionError, match='aligned'):
        train(step, state, list(batches), 2, logger=ListLogger(),
              tags=['4x4', '8x8', '16x16', '32x32'],
              event_capacity=4096, window=2)


def test_window_resume_from_checkpoint():
    """Stopping after 2 steps, rebuilding the state the way the CLI resume
    does (fresh micro_step, restored params/opt_state), and continuing in
    a windowed loop matches the uninterrupted windowed run."""
    model, params, tx, evaluator, batches = make_setup(4)

    ref_state, ref_samples, _ = run(model, params, tx, evaluator, batches,
                                    window=2, num_steps=4)

    state_a, samples_a, _ = run(model, params, tx, evaluator, batches[:2],
                                window=2, num_steps=2)
    # CLI-style resume: new state, checkpointed params/opt_state poured in
    # (train_flownet.py), micro_step restarts at 0 — window-aligned
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=1, window=2)
    resumed = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    resumed = resumed.replace(params=state_a.params,
                              opt_state=state_a.opt_state,
                              step=state_a.step)
    state_b, samples_b = train(step, resumed, list(batches[2:]), 4,
                               logger=ListLogger(),
                               tags=['4x4', '8x8', '16x16', '32x32'],
                               event_capacity=4096, window=2,
                               init_step=2,
                               init_samples_passed=samples_a)
    assert samples_b == ref_samples
    for a, b in zip(jax.tree_util.tree_leaves(state_b.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
