"""--ev_images pipeline: dense event-image dataset -> training (raw=False)."""
from pathlib import Path

import numpy as np
import jax

from dvs_of_training_framework_tpu.data.collate import collate_dense_wrapper
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
DEPTH = 3
SHAPE = (64, 64)


def make_dense_batch():
    module = load_model_class(REPO / 'EVFlowNet')

    def event_image_fn(events, start_ts, stop_ts, shape):
        return module.compute_event_image(events, start_ts, stop_ts, shape,
                                          depth=DEPTH)

    dataset = DatasetImpl(path=data_path, shape=list(SHAPE),
                          augmentation=False, collapse_length=1,
                          is_raw=False, event_image_fn=event_image_fn)
    samples = [dataset[0], dataset[1]]
    assert samples[0][0].shape == (1, DEPTH, *SHAPE)
    return module, collate_dense_wrapper(samples)


def test_dense_collate_shapes():
    _, batch = make_dense_batch()
    assert batch['data'].shape == (2, DEPTH, *SHAPE)
    assert batch['images'].shape == (4, 1, *SHAPE)
    assert batch['size'] == 2
    assert 'events' not in batch


def test_train_step_on_event_images():
    module, batch = make_dense_batch()
    kwargs = filter_kwargs(module.Model, dict(
        event_representation_depth=DEPTH, base_channels=4))
    model = module.Model(**kwargs)
    device_batch = pad_batch(batch)
    assert device_batch.data is not None and device_batch.events is None
    params = model.init(jax.random.PRNGKey(0), device_batch.data,
                        device_batch.timestamps, device_batch.sample_idx,
                        SHAPE, raw=False)['params']
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in SHAPE) for i in range(4)][::-1])
    tx = construct_optimizer(make_args(), params)
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1], 1,
                           is_raw=False)
    state = create_train_state(params, tx)
    state, (loss, _) = step(state, device_batch)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
