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


def test_bf16_data_wire_roundtrip():
    """compact_batch(data_wire='bf16') halves the dense wire leg and is
    effect-lossless under bf16 model precision: the expanded f32 values
    cast to bf16 bit-equal the original f32 cast to bf16 (the second
    rounding in f32->bf16->f32->bf16 is exact)."""
    import jax.numpy as jnp
    import ml_dtypes

    from dvs_of_training_framework_tpu.data.schema import (compact_batch,
                                                           expand_batch)

    _, batch = make_dense_batch()
    device_batch = pad_batch(batch)
    wire = compact_batch(device_batch, data_wire='bf16')
    assert wire.data.dtype == ml_dtypes.bfloat16
    assert wire.data.nbytes * 2 == np.asarray(device_batch.data).nbytes
    expanded = expand_batch(jax.device_put(wire))
    assert expanded.data.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(expanded.data.astype(jnp.bfloat16)),
        np.asarray(jnp.asarray(device_batch.data).astype(jnp.bfloat16)))
    # default stays exact
    exact = compact_batch(device_batch)
    np.testing.assert_array_equal(np.asarray(exact.data),
                                  np.asarray(device_batch.data))


def test_train_cli_ev_images_bf16_wire(tmp_path):
    """--ev_images + --wire-data bf16 trains end-to-end through the
    device queue (wire narrowing + on-device expand under the fused
    window step)."""
    from tests.dataset.test_prepare_scripts import REPO as _REPO
    from tests.training.test_cli import run_cli

    # quantized shards: bake a tiny dense dataset via the codec
    from dvs_of_training_framework_tpu.data import codec

    module, batch = make_dense_batch()
    shards = tmp_path / 'quant'
    shards.mkdir()
    codec.write_encoded_batch(
        shards / '0.hdf5',
        codec.encode_quantized_batch(
            {'data': np.asarray(batch['data'], dtype=np.float32),
             'timestamps': batch['timestamps'],
             'sample_idx': batch['sample_idx'],
             'images': batch['images'],
             'augmentation_params': batch['augmentation_params'],
             'size': batch['size']}))

    root = tmp_path / 'mvsec'
    root.mkdir()
    (root / 'outdoor_day2').symlink_to(data_path)
    (root / 'outdoor_day1').symlink_to(data_path)
    model_dir = run_cli(
        tmp_path, root,
        extra=['--ev_images', '--event-representation-depth', str(DEPTH),
               '--preprocessed-dataset-path', str(shards),
               '--wire-data', 'bf16',
               '--device-queue-window', '2',
               '--skip-validation'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    assert 2 in Serializer(model_dir).list_known_steps()


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
