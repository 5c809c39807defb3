"""Checkpoint store: retention policy, rediscovery, round-trip, resume."""
import numpy as np
import jax
import jax.numpy as jnp

from dvs_of_training_framework_tpu.training.serializer import (
    Serializer, read_params_file, save_state_file)


def params_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {'dense': {'kernel': rng.normal(size=(4, 3)).astype(np.float32),
                      'bias': rng.normal(size=(3,)).astype(np.float32)}}


def test_roundtrip(tmp_path):
    ser = Serializer(tmp_path, keep_checkpoints_max=2,
                     permanent_checkpoint_interval=10)
    params = params_tree()
    opt_state = {'momentum': params_tree(1)}
    ser.checkpoint_model(params, opt_state, global_step=1,
                         samples_passed=32)
    step, p, o, extra = ser.load_checkpoint(1)
    assert step == 1
    assert int(extra['samples_passed']) == 32
    np.testing.assert_array_equal(p['dense']['kernel'],
                                  params['dense']['kernel'])
    np.testing.assert_array_equal(o['momentum']['dense']['bias'],
                                  opt_state['momentum']['dense']['bias'])


def test_retention_policy(tmp_path):
    ser = Serializer(tmp_path, keep_checkpoints_max=2,
                     permanent_checkpoint_interval=10)
    params = params_tree()
    for step in range(1, 13):
        ser.checkpoint_model(params, {}, global_step=step)
    steps = ser.list_known_steps()
    # permanent: 10; temporal: last two (11, 12)
    assert steps == [10, 11, 12]


def test_rediscovery(tmp_path):
    ser = Serializer(tmp_path, keep_checkpoints_max=5,
                     permanent_checkpoint_interval=10)
    params = params_tree()
    for step in (1, 5, 10):
        ser.checkpoint_model(params, {}, global_step=step)
    # a new serializer over the same dir finds the checkpoints by filename
    ser2 = Serializer(tmp_path, keep_checkpoints_max=5,
                      permanent_checkpoint_interval=10)
    assert ser2.list_known_steps() == [1, 5, 10]
    assert ser2.has_checkpoints()


def test_finalize_weights_only(tmp_path):
    ser = Serializer(tmp_path)
    params = params_tree()
    ser.checkpoint_model(params, {'mu': 1}, global_step=3)
    out = tmp_path / 'weights.ckpt'
    ser.finalize(3, out)
    loaded = read_params_file(out)
    np.testing.assert_array_equal(loaded['dense']['kernel'],
                                  params['dense']['kernel'])


def test_read_params_accepts_bare_tree(tmp_path):
    params = params_tree()
    path = tmp_path / 'bare.ckpt'
    save_state_file(path, params)
    loaded = read_params_file(path)
    np.testing.assert_array_equal(loaded['dense']['bias'],
                                  params['dense']['bias'])


def test_resume_restores_optimizer_state(tmp_path):
    """Optimizer state (incl. schedule counters) round-trips through the
    serializer into a live optax state tree."""
    import optax
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from types import SimpleNamespace

    params = jax.tree_util.tree_map(jnp.asarray, params_tree())
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=10, num_warmup_steps=2,
                           training_steps=100, rs=0.5)
    tx = construct_optimizer(args, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    ser = Serializer(tmp_path)
    ser.checkpoint_model(params, opt_state, global_step=3,
                         samples_passed=96)

    fresh_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    fresh_opt = tx.init(fresh_params)
    step, p2, o2, extra = ser.load_checkpoint(
        3, params_target=fresh_params, opt_state_target=fresh_opt)
    assert step == 3
    # continuing from restored state must equal continuing from live state
    u1, _ = tx.update(grads, opt_state, params)
    u2, _ = tx.update(grads, o2, p2)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_async_write(tmp_path):
    ser = Serializer(tmp_path, keep_checkpoints_max=2,
                     permanent_checkpoint_interval=10, async_write=True)
    params = params_tree()
    for step in range(1, 5):
        ser.checkpoint_model(params, {}, global_step=step,
                             samples_passed=step * 8)
    ser.wait()
    assert ser.list_known_steps() == [3, 4]
    step, p, _, extra = ser.load_checkpoint(4)
    assert step == 4 and int(extra['samples_passed']) == 32
    np.testing.assert_array_equal(p['dense']['kernel'],
                                  params['dense']['kernel'])
