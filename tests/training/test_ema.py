"""Parameter EMA (--ema-decay): optax rider + checkpoint + eval export.

The EMA of the POST-update weights lives inside the optimizer state
(optimizers.with_param_ema), so it checkpoints/resumes for free and
Serializer.finalize(use_ema=True) / test.py --use-ema export it.
Stabiliser motivation: ACCURACY.md round 5 (transient coarse-flow-head
excursions at late checkpoints).
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dvs_of_training_framework_tpu.training.optimizers import (
    construct_optimizer, with_param_ema)
from dvs_of_training_framework_tpu.training.serializer import (
    Serializer, find_ema_params, read_params_file)
from tests.training.test_training import make_args

REPO = Path(__file__).resolve().parents[2]


def test_param_ema_matches_hand_rolled():
    decay = 0.9
    tx = with_param_ema(optax.sgd(0.1), decay)
    params = {'w': jnp.array([1.0, 2.0])}
    state = tx.init(params)
    np.testing.assert_array_equal(state.ema_params['w'], params['w'])

    ema_ref = np.array([1.0, 2.0])
    p_ref = np.array([1.0, 2.0])
    for step in range(3):
        grads = {'w': jnp.array([1.0, -1.0]) * (step + 1)}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        p_ref = p_ref - 0.1 * np.array([1.0, -1.0]) * (step + 1)
        ema_ref = decay * ema_ref + (1 - decay) * p_ref
        np.testing.assert_allclose(np.asarray(params['w']), p_ref,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.ema_params['w']),
                                   ema_ref, rtol=1e-6)


def test_ema_does_not_alias_params():
    tx = with_param_ema(optax.sgd(0.1), 0.5)
    params = {'w': jnp.zeros(3)}
    state = tx.init(params)
    updates, state = tx.update({'w': jnp.ones(3)}, state, params)
    # the init-time EMA copy must be unaffected by the update math
    np.testing.assert_array_equal(np.asarray(state.ema_params['w']),
                                  0.5 * np.asarray(
                                      optax.apply_updates(
                                          params, updates)['w']))


def test_construct_optimizer_ema_checkpoints_and_finalize(tmp_path):
    args = make_args(ema_decay=0.5, grad_clip_norm=1.0,
                     optimizer='RANGER', training_steps=10)
    params = {'dense': {'kernel': jnp.ones((2, 2))}}
    tx = construct_optimizer(args, params)
    state = tx.init(params)
    grads = {'dense': {'kernel': jnp.full((2, 2), 0.1)}}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    expect_ema = jax.tree_util.tree_map(
        lambda e, p: 0.5 * e + 0.5 * p, params, new_params)

    serializer = Serializer(tmp_path, 2, 10)
    serializer.checkpoint_model(new_params, state, global_step=1,
                                samples_passed=8)

    # EMA survives the msgpack round trip and is findable by field name
    raw = serializer.read_state_dict(1)
    found = find_ema_params(raw['optimizer'])
    np.testing.assert_allclose(
        found['dense']['kernel'],
        np.asarray(expect_ema['dense']['kernel']), rtol=1e-6)

    # finalize(use_ema=True) exports the EMA as the model weights
    out = tmp_path / 'ema.ckpt'
    serializer.finalize(1, out, use_ema=True)
    exported = read_params_file(out)
    np.testing.assert_allclose(
        exported['dense']['kernel'],
        np.asarray(expect_ema['dense']['kernel']), rtol=1e-6)

    # resume restores the EMA exactly (bit-faithful optimizer state)
    step, p, opt, extra = serializer.load_checkpoint(
        1, params_target=new_params, opt_state_target=state)
    np.testing.assert_array_equal(
        np.asarray(opt.ema_params['dense']['kernel']),
        np.asarray(state.ema_params['dense']['kernel']))


def test_finalize_without_ema_raises(tmp_path):
    args = make_args()
    params = {'w': jnp.ones(2)}
    tx = construct_optimizer(args, params)
    serializer = Serializer(tmp_path, 2, 10)
    serializer.checkpoint_model(params, tx.init(params), global_step=1,
                                samples_passed=8)
    with pytest.raises(ValueError, match='no parameter EMA'):
        serializer.finalize(1, tmp_path / 'x.ckpt', use_ema=True)


def test_cli_ema_end_to_end(tmp_path):
    """--ema-decay through the training CLI: the checkpoint carries the
    EMA and finalize(use_ema=True) exports a loadable weight tree."""
    from tests.helpers import data_path
    from tests.training.test_cli import run_cli

    root = tmp_path / 'mvsec'
    root.mkdir()
    (root / 'outdoor_day2').symlink_to(data_path)
    (root / 'outdoor_day1').symlink_to(data_path)
    model_dir = run_cli(tmp_path, root,
                        extra=['--ema-decay', '0.9', '--skip-validation'])
    serializer = Serializer(model_dir)
    step = serializer.list_known_steps()[-1]
    out = tmp_path / 'ema_weights.ckpt'
    serializer.finalize(step, out, use_ema=True)
    live = tmp_path / 'live_weights.ckpt'
    serializer.finalize(step, live)
    ema_tree = read_params_file(out)
    live_tree = read_params_file(live)
    assert jax.tree_util.tree_structure(ema_tree) \
        == jax.tree_util.tree_structure(live_tree)
    # after 2 steps at decay .9 the EMA differs from the live weights
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        ema_tree, live_tree)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
