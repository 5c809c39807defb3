"""Multi-element samples: prefix/suffix context training contract."""
from pathlib import Path

import numpy as np
import jax

from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from dvs_of_training_framework_tpu.data.dataset import DatasetImpl
from dvs_of_training_framework_tpu.data.schema import pad_batch
from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                 load_model_class)
from dvs_of_training_framework_tpu.training.optimizers import \
    construct_optimizer
from dvs_of_training_framework_tpu.training.state import (create_train_state,
                                                          make_train_step)
from tests.helpers import data_path
from tests.training.test_training import ListLogger, make_args

REPO = Path(__file__).resolve().parents[2]


def test_prefix_context_training():
    """seq_length=2 with prefix_length=1: the prediction covers the second
    element; flow_ts picks timestamps [1], [2] of each sample."""
    shape = (64, 64)
    dataset = DatasetImpl(path=data_path, shape=list(shape),
                          augmentation=False, collapse_length=1,
                          is_raw=True, min_seq_length=2, max_seq_length=2)
    samples = [dataset.__getitem__(i, k=1, seq_length=2) for i in (0, 1)]
    batch = collate_wrapper(samples)
    assert batch['timestamps'].shape == (6,)  # 3 per sample

    module = load_model_class(REPO / 'EVFlowNet')
    kwargs = filter_kwargs(module.Model, dict(
        prefix_length=1, suffix_length=0, max_sequence_length=2,
        event_representation_depth=3, base_channels=4))
    model = module.Model(**kwargs)
    probe = pad_batch(batch, capacity=4096)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        shape)['params']

    flows, flow_ts, flow_sample_idx = model.apply(
        {'params': params}, probe.events, probe.timestamps,
        probe.sample_idx, shape)
    assert flows[-1].shape == (2, 2, 64, 64)
    ts = np.asarray(batch['timestamps']).reshape(2, 3)
    np.testing.assert_allclose(np.asarray(flow_ts),
                               ts[:, 1:3], rtol=1e-6)

    # and a full train step runs
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in shape) for i in range(4)][::-1])
    tx = construct_optimizer(make_args(), params)
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1], 1)
    state = create_train_state(params, tx)
    state, (loss, _) = step(state, probe)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
