"""End-to-end 1-step training/validation smoke tests on CPU fixtures.

Mirrors the reference integration tests (tests/training/test_training.py
there): exercises plugin load, optimizer/schedule construction, collate,
padding, loss, backward, optimizer update, logging — through the real
train()/validate() entry points.
"""
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import jax
import pytest

from dvs_of_training_framework_tpu.data.dataset import Dataset
from dvs_of_training_framework_tpu.data.dataloader import HostDataLoader
from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from dvs_of_training_framework_tpu.training.optimizers import \
    construct_optimizer
from dvs_of_training_framework_tpu.training.state import (
    create_train_state, make_eval_step, make_train_step)
from dvs_of_training_framework_tpu.training.train import (shapes2tags, train,
                                                          validate)
from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                 load_model_class)
from tests.helpers import data_path

REPO = Path(__file__).resolve().parents[2]
CAPACITY = 2048


class ListLogger:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), step))

    def flush(self):
        pass


def make_args(**overrides):
    args = SimpleNamespace(wdw=0.01,
                           training_steps=1,
                           rs=0,
                           optimizer='ADAM',
                           lr=0.01,
                           half_life=1,
                           num_warmup_steps=0)
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def build(plugin='DummyFlowNet', optimizer='ADAM', base_channels=4,
          shape=(64, 64)):
    module = load_model_class(REPO / plugin)
    kwargs = filter_kwargs(module.Model, dict(
        prefix_length=0, suffix_length=0, max_sequence_length=1,
        event_representation_depth=3, activation='relu',
        base_channels=base_channels))
    model = module.Model(**kwargs)
    dataset = Dataset(path=data_path, shape=list(shape),
                      augmentation=False, collapse_length=1, is_raw=True,
                      max_seq_length=1)
    loader = HostDataLoader(dataset, batch_size=2)
    args = make_args(optimizer=optimizer)

    sample = loader.collate_fn([dataset[0], dataset[1]])
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    probe = pad_batch(sample, capacity=CAPACITY)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        tuple(shape))['params']
    tx = construct_optimizer(args, params)

    shapes = [tuple(x // 2 ** i for x in shape) for i in range(4)][::-1]
    evaluator = MultiScaleLoss(shapes)
    return model, params, tx, evaluator, loader, args


def test_trainloop():
    model, params, tx, evaluator, loader, args = build()
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    logger = ListLogger()
    state, samples = train(train_step, state, loader,
                           num_steps=args.training_steps, logger=logger,
                           tags=shapes2tags(evaluator.shapes),
                           event_capacity=CAPACITY)
    assert int(state.step) == 1
    assert samples == 2
    tags = {t for t, _, _ in logger.scalars}
    assert 'General/Train loss' in tags
    assert any(t.startswith('Train/photometric loss/') for t in tags)


def test_train_updates_params():
    model, params, tx, evaluator, loader, args = build(plugin='EVFlowNet')
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    logger = ListLogger()
    before = jax.tree_util.tree_map(np.asarray, params)
    state, _ = train(train_step, state, loader, num_steps=1, logger=logger,
                     tags=shapes2tags(evaluator.shapes),
                     event_capacity=CAPACITY)
    after = jax.tree_util.tree_map(np.asarray, state.params)
    leaves_before = jax.tree_util.tree_leaves(before)
    leaves_after = jax.tree_util.tree_leaves(after)
    changed = any((a != b).any() for a, b in zip(leaves_after,
                                                 leaves_before))
    assert changed, 'optimizer step must move parameters'


def test_gradient_accumulation_matches_large_batch():
    """accum=2 with mbs=1 must apply exactly one optimizer step after two
    microbatches."""
    model, params, tx, evaluator, loader, args = build()
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=2, is_raw=True)
    state = create_train_state(params, tx)
    dataset = loader.dataset
    single_loader = HostDataLoader(dataset, batch_size=2)
    logger = ListLogger()
    state, _ = train(train_step, state, single_loader, num_steps=1,
                     logger=logger, tags=shapes2tags(evaluator.shapes),
                     accumulation_steps=2, event_capacity=CAPACITY)
    assert int(state.step) == 1
    assert int(state.micro_step) == 2


def test_validation():
    model, params, tx, evaluator, loader, args = build()
    eval_step = make_eval_step(model, evaluator, [0.5, 1, 1], is_raw=True)
    logger = ListLogger()
    loss = validate(eval_step, params, loader, samples_passed=0,
                    logger=logger, tags=shapes2tags(evaluator.shapes),
                    event_capacity=CAPACITY)
    assert np.isfinite(loss)
    tags = {t for t, _, _ in logger.scalars}
    assert 'General/Validation loss' in tags


def test_validation_windowed_matches_per_batch():
    """Device-queue validation must emit the SAME scalars as the
    per-batch pass — including across a remainder-size final batch
    (separate equal-size run) and a repeat-padded partial window."""
    from dvs_of_training_framework_tpu.training.state import \
        make_fused_eval_step
    from dvs_of_training_framework_tpu.training.train import \
        validate_windowed

    model, params, tx, evaluator, loader, args = build()
    eval_step = make_eval_step(model, evaluator, [0.5, 1, 1], is_raw=True)
    window = 2
    fused = make_fused_eval_step(model, evaluator, [0.5, 1, 1], window,
                                 is_raw=True)
    dataset = loader.dataset
    # batch_size=4 over 10 samples -> sizes [4, 4, 2]: one full window
    # of the size-4 run, then the size-2 remainder as a partial window
    log_a, log_b = ListLogger(), ListLogger()
    loss_a = validate(eval_step, params,
                      HostDataLoader(dataset, batch_size=4), 0, log_a,
                      shapes2tags(evaluator.shapes),
                      event_capacity=CAPACITY)
    loss_b = validate_windowed(fused, params,
                               HostDataLoader(dataset, batch_size=4), 0,
                               log_b, shapes2tags(evaluator.shapes),
                               window=window, event_capacity=CAPACITY)
    assert log_a.scalars == log_b.scalars
    assert loss_a == loss_b


@pytest.mark.parametrize('optimizer', ['ADAM', 'RADAM', 'RANGER'])
def test_optimizers_step(optimizer):
    model, params, tx, evaluator, loader, args = build(optimizer=optimizer)
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    logger = ListLogger()
    state, _ = train(train_step, state, loader, num_steps=1, logger=logger,
                     tags=shapes2tags(evaluator.shapes),
                     event_capacity=CAPACITY)
    assert int(state.step) == 1


def test_oversized_batch_skipped():
    model, params, tx, evaluator, loader, args = build()
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    logger = ListLogger()
    # capacity of 1 event -> every fixture batch is skipped
    state, samples = train(train_step, state, loader, num_steps=1,
                           logger=logger,
                           tags=shapes2tags(evaluator.shapes),
                           event_capacity=1)
    assert int(state.step) == 0
    assert samples == 0


def test_overfit_single_batch_reduces_loss():
    """A few high-LR steps on one batch must reduce the training loss —
    evidence that gradients flow end-to-end through voxelization, UNet,
    and the self-supervised objective."""
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    model, params, tx, evaluator, loader, args = build(
        plugin='EVFlowNet', base_channels=8)
    args = make_args(lr=5e-3, half_life=1e9)
    tx = construct_optimizer(args, params)
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    dataset = loader.dataset
    batch = pad_batch(loader.collate_fn([dataset[0], dataset[1]]),
                      capacity=CAPACITY)
    losses = []
    for _ in range(8):
        state, (loss, _) = train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.98, losses


def test_host_lr_readout_matches_jnp_schedule():
    """current_learning_rates must equal the jitted jnp schedule exactly:
    the host closed form replaced eager device evaluation (each boundary
    paid ~10 device RPCs through a tunnelled TPU, capping the as-trained
    CLI rate) and the logged values must not drift."""
    from types import SimpleNamespace

    from dvs_of_training_framework_tpu.training.optimizers import (
        current_learning_rates, make_lr_schedule)

    args = SimpleNamespace(lr=1e-3, half_life=20000, num_warmup_steps=200,
                           training_steps=40000, rs=0.5)
    pred = make_lr_schedule(args.lr, args.num_warmup_steps, args.half_life)
    repr_s = make_lr_schedule(args.lr, args.num_warmup_steps,
                              args.half_life, delay_steps=20000)
    for step in [0, 1, 199, 200, 201, 1000, 19999, 20000, 20001,
                 39999, 123456]:
        got_repr, got_pred = current_learning_rates(args, step)
        assert got_pred == pytest.approx(float(pred(step)), rel=1e-6, abs=0)
        assert got_repr == pytest.approx(float(repr_s(step)), rel=1e-6,
                                         abs=1e-30)

    # opt-in representation re-warmup: ramp 0->1 over the first N steps
    # after the group unfreezes, host readout == jnp schedule
    args.representation_warmup_steps = 1000
    ramped = make_lr_schedule(args.lr, args.num_warmup_steps,
                              args.half_life, delay_steps=20000,
                              rewarmup_steps=1000)
    for step in [19999, 20000, 20001, 20250, 20500, 20999, 21000, 21001,
                 39999]:
        got_repr, _ = current_learning_rates(args, step)
        assert got_repr == pytest.approx(float(ramped(step)), rel=1e-6,
                                         abs=1e-30)
    # midpoint of the ramp is half the undelayed-with-delay schedule
    assert float(ramped(20500)) == pytest.approx(
        0.5 * float(repr_s(20500)), rel=1e-5)
    assert float(ramped(21000)) == pytest.approx(float(repr_s(21000)),
                                                 rel=1e-6)


def test_grad_clip_norm_bounds_updates():
    """--grad-clip-norm caps the global gradient norm entering the
    optimizer; a 1000x loss-spike batch (ACCURACY.md round 3) then moves
    the params by at most ~lr instead of collapsing them."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer

    params = {'quantization_layer': {'w': jnp.zeros((4, 4))},
              'predictor': {'w': jnp.zeros((4, 4))}}
    giant = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e6), params)
    base = SimpleNamespace(optimizer='ADAM', lr=1e-3, wdw=0.0,
                           half_life=20000, num_warmup_steps=0,
                           training_steps=1000, rs=0.0)

    def one_update(clip):
        args = SimpleNamespace(**vars(base), grad_clip_norm=clip)
        tx = construct_optimizer(args, params)
        state = tx.init(params)
        updates, _ = tx.update(giant, state, params)
        return jnp.sqrt(sum(jnp.sum(u ** 2) for u in
                            jax.tree_util.tree_leaves(updates)))

    clipped = float(one_update(1.0))
    unclipped = float(one_update(0.0))
    # Adam normalises magnitudes, so compare the raw clipped grads too:
    # the clip transform alone must scale the global norm to 1
    import optax
    cl = optax.clip_by_global_norm(1.0)
    scaled, _ = cl.update(giant, cl.init(params), params)
    norm = jnp.sqrt(sum(jnp.sum(u ** 2) for u in
                        jax.tree_util.tree_leaves(scaled)))
    assert float(norm) == pytest.approx(1.0, rel=1e-5)
    # and the full chain still produces finite, bounded updates
    assert clipped <= unclipped * 1.01
    assert jnp.isfinite(clipped)
