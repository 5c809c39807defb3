"""SPMD data parallelism on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from dvs_of_training_framework_tpu.data.dataset import Dataset
from dvs_of_training_framework_tpu.data.schema import pad_batch
from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from dvs_of_training_framework_tpu.parallel import (
    make_mesh, make_sharded_train_step, shard_host_batch,
    split_batch_for_mesh)
from dvs_of_training_framework_tpu.training.optimizers import \
    construct_optimizer
from dvs_of_training_framework_tpu.training.state import (create_train_state,
                                                          make_train_step)
from tests.helpers import data_path
from tests.training.test_training import make_args
from pathlib import Path

from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                 load_model_class)

REPO = Path(__file__).resolve().parents[2]


def test_make_mesh_specs():
    mesh = make_mesh()
    assert mesh.shape['data'] == len(jax.devices())
    mesh2 = make_mesh('data:4,event:2')
    assert mesh2.shape == {'data': 4, 'event': 2}


def make_setup(n_dev, shape=(32, 32)):
    module = load_model_class(REPO / 'EVFlowNet')
    kwargs = filter_kwargs(module.Model, dict(
        event_representation_depth=3, base_channels=4))
    model = module.Model(**kwargs)
    dataset = Dataset(path=data_path, shape=list(shape),
                      augmentation=False, collapse_length=1, is_raw=True,
                      max_seq_length=1)
    batch = collate_wrapper([dataset[i % len(dataset)]
                             for i in range(n_dev)])
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in shape) for i in range(4)][::-1])
    probe = pad_batch(batch, capacity=4096)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        shape)['params']
    args = make_args()
    tx = construct_optimizer(args, params)
    return model, params, tx, evaluator, batch, probe


def test_split_batch_for_mesh():
    n = 4
    model, params, tx, evaluator, batch, probe = make_setup(n)
    sharded = split_batch_for_mesh(batch, n, capacity_per_shard=2048)
    assert sharded.events.x.shape == (n, 2048)
    assert sharded.timestamps.shape == (n, 2)
    assert sharded.images.shape[0] == n
    # shard-local sample indices start at 0
    for s in range(n):
        si = np.asarray(sharded.events.sample_index[s])
        valid = si < 1
        assert (si[valid] == 0).all()
        assert (np.asarray(sharded.sample_idx[s]) == 0).all()
    # events are conserved
    total = sum(int(sharded.events.num_events[s]) for s in range(n))
    assert total == batch['events']['x'].size


def test_sharded_step_matches_single_device():
    """psum-averaged DP gradients == single-device full-batch gradients."""
    n = 4
    model, params, tx, evaluator, batch, probe = make_setup(n)
    mesh = make_mesh(f'data:{n}')

    # single-device reference on the full batch
    step_ref = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                               accumulation_steps=1, is_raw=True)
    state_ref = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    state_ref, (loss_ref, _) = step_ref(state_ref, probe)

    # sharded version
    step_dp, n_shards = make_sharded_train_step(
        model, evaluator, tx, [0.5, 1, 1], accumulation_steps=1, mesh=mesh)
    assert n_shards == n
    device_batch = shard_host_batch(
        split_batch_for_mesh(batch, n, capacity_per_shard=4096), mesh)
    state_dp = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    state_dp, (loss_dp, _) = step_dp(state_dp, device_batch)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_event_split_conserves_events():
    n, e = 2, 4
    model, params, tx, evaluator, batch, probe = make_setup(n)
    sharded = split_batch_for_mesh(batch, n, capacity_per_shard=1024,
                                   event_shards=e)
    assert sharded.events.x.shape == (n, e, 1024)
    assert sharded.timestamps.shape == (n, 2)
    total = sum(int(sharded.events.num_events[d, s])
                for d in range(n) for s in range(e))
    assert total == batch['events']['x'].size


def test_event_sharded_step_matches_single_device():
    """data x event mesh: psum'd partial voxel grids + split-VJP gradients
    must reproduce the single-device step (SURVEY.md §7 scale-out item)."""
    d, e = 2, 2
    model, params, tx, evaluator, batch, probe = make_setup(d)
    mesh = make_mesh(f'data:{d},event:{e}')

    step_ref = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                               accumulation_steps=1, is_raw=True)
    state_ref = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    state_ref, (loss_ref, _) = step_ref(state_ref, probe)

    step_ev, n_shards = make_sharded_train_step(
        model, evaluator, tx, [0.5, 1, 1], accumulation_steps=1, mesh=mesh,
        event_axis='event')
    assert n_shards == d
    device_batch = shard_host_batch(
        split_batch_for_mesh(batch, d, capacity_per_shard=4096,
                             event_shards=e),
        mesh, event_axis='event')
    state_ev = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    state_ev, (loss_ev, _) = step_ev(state_ev, device_batch)

    np.testing.assert_allclose(float(loss_ev), float(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_ev.params),
                    jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_sharded_step_runs_on_8_devices():
    n = len(jax.devices())
    if n < 2:
        pytest.skip('needs multiple devices')
    model, params, tx, evaluator, batch, probe = make_setup(n)
    mesh = make_mesh()
    step_dp, _ = make_sharded_train_step(
        model, evaluator, tx, [0.5, 1, 1], accumulation_steps=1, mesh=mesh)
    device_batch = shard_host_batch(
        split_batch_for_mesh(batch, n, capacity_per_shard=2048), mesh)
    state = create_train_state(jax.tree_util.tree_map(jnp.array, params),
                               tx)
    state, (loss, terms) = step_dp(state, device_batch)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_sharded_eval_step_matches_single_device_validate():
    """Mesh-mode validation: the sharded eval step + training-side batch
    split produces the same scalars as the single-device validate pass
    (equal shards -> pmean of shard means == full-batch mean)."""
    from dvs_of_training_framework_tpu.parallel import (
        make_global_batch, make_sharded_eval_step)
    from dvs_of_training_framework_tpu.training.state import make_eval_step
    from dvs_of_training_framework_tpu.training.train import validate

    n = 4
    model, params, tx, evaluator, batch, probe = make_setup(n)
    mesh = make_mesh(f'data:{n}')
    weights = [0.5, 1, 1]

    class Log:
        def __init__(self):
            self.scalars = {}

        def add_scalar(self, tag, value, step):
            self.scalars[tag] = value

    tags = ['4x4', '8x8', '16x16', '32x32']
    eval_ref = make_eval_step(model, evaluator, weights, is_raw=True)
    log_ref = Log()
    loss_ref = validate(eval_ref, params, iter([batch]), 0, log_ref, tags,
                        is_raw=True, event_capacity=4096)

    eval_dp = make_sharded_eval_step(model, evaluator, weights, mesh)

    def prepare(collated, capacity):
        if int(collated['size']) % n:
            raise ValueError('indivisible')
        return make_global_batch(
            split_batch_for_mesh(collated, n,
                                 capacity_per_shard=max(capacity // n,
                                                        1024)),
            mesh)

    log_dp = Log()
    loss_dp = validate(eval_dp, params, iter([batch]), 0, log_dp, tags,
                       is_raw=True, event_capacity=4096,
                       prepare_batch=prepare)
    assert loss_dp == pytest.approx(loss_ref, rel=1e-5)
    assert set(log_dp.scalars) == set(log_ref.scalars)
    for tag, v in log_ref.scalars.items():
        assert log_dp.scalars[tag] == pytest.approx(v, rel=1e-4, abs=1e-7)

    # an indivisible remainder batch is dropped, not crashed on
    odd = collate_wrapper([Dataset(path=data_path, shape=[32, 32],
                                   augmentation=False, collapse_length=1,
                                   is_raw=True, max_seq_length=1)[0]])
    log_mix = Log()
    validate(eval_dp, params, iter([odd, batch]), 0, log_mix, tags,
             is_raw=True, event_capacity=4096, prepare_batch=prepare)
    assert log_mix.scalars['General/Validation loss'] == \
        pytest.approx(loss_dp, rel=1e-6)
