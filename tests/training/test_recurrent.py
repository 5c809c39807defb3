"""RecurrentFlowNet plugin: contract + training step over sequences."""
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
from tests.training.test_training import make_args

REPO = Path(__file__).resolve().parents[2]


def test_recurrent_contract_and_training():
    shape = (64, 64)
    L = 2
    dataset = DatasetImpl(path=data_path, shape=list(shape),
                          augmentation=False, collapse_length=1,
                          is_raw=True, min_seq_length=L, max_seq_length=L)
    samples = [dataset.__getitem__(i, k=1, seq_length=L) for i in (0, 1)]
    batch = collate_wrapper(samples)

    module = load_model_class(REPO / 'RecurrentFlowNet')
    kwargs = filter_kwargs(module.Model, dict(
        prefix_length=1, suffix_length=0, max_sequence_length=L,
        event_representation_depth=3, base_channels=4, hidden_channels=4))
    model = module.Model(**kwargs)
    probe = pad_batch(batch, capacity=4096)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        shape)['params']
    assert 'quantization_layer' in params  # two-group optimization works
    assert 'gru' in params

    flows, flow_ts, flow_sample_idx, feats = model.apply(
        {'params': params}, probe.events, probe.timestamps,
        probe.sample_idx, shape, intermediate=True)
    assert len(flows) == 4
    assert flows[-1].shape == (2, 2, 64, 64)
    ts = np.asarray(batch['timestamps']).reshape(2, L + 1)
    np.testing.assert_allclose(np.asarray(flow_ts), ts[:, 1:3], rtol=1e-6)

    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in shape) for i in range(4)][::-1])
    tx = construct_optimizer(make_args(), params)
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1], 1)
    state = create_train_state(params, tx)
    state, (loss, _) = step(state, probe)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_recurrent_optical_flow_wrapper():
    import numpy as np
    import importlib
    plugin = importlib.import_module('RecurrentFlowNet')
    of = plugin.OpticalFlow((32, 48), event_capacity=4096,
                            event_representation_depth=3,
                            base_channels=4, hidden_channels=4)
    rng = np.random.default_rng(0)
    n = 50
    window = np.stack([rng.integers(0, 48, n), rng.integers(0, 32, n),
                       np.sort(rng.uniform(1.0, 1.1, n)),
                       rng.choice([-1, 1], n)]).astype(np.float64)
    flow = of([window], [1.0], [1.1])
    assert flow.shape == (1, 32, 48, 2)
