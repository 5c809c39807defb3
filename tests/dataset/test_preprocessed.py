"""PreprocessedDataloader: shard reads, file-boundary batches, seek resume,
plus a 1-step training smoke test on a preprocessed shard."""
from pathlib import Path

import numpy as np

from dvs_of_training_framework_tpu.data import codec
from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from dvs_of_training_framework_tpu.data.dataset import Dataset
from dvs_of_training_framework_tpu.data.preprocessed import \
    PreprocessedDataloader
from tests.helpers import data_path

REPO = Path(__file__).resolve().parents[2]


def write_shards(tmp_path, samples_per_file=3, num_files=2):
    """Encode fixture samples into multiple shards."""
    dataset = Dataset(path=data_path, shape=[64, 64], augmentation=False,
                      collapse_length=1, is_raw=True, max_seq_length=1)
    out = tmp_path / 'prep'
    out.mkdir()
    idx = 0
    for j in range(num_files):
        batches = []
        for _ in range(samples_per_file):
            batch = collate_wrapper([dataset[idx]])
            batches.append(codec.encode_batch(**batch))
            idx += 1
        codec.write_encoded_batch(out / f'{j}.hdf5',
                                  codec.join_batches(batches))
    return out, dataset


def test_sequential_batches(tmp_path):
    out, dataset = write_shards(tmp_path)
    loader = PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                    show_progress=False)
    assert len(loader) == 6
    batch = next(loader)
    assert batch['size'] == 2
    ref = collate_wrapper([dataset[0], dataset[1]])
    assert (batch['events']['x'] == ref['events']['x']).all()
    assert np.allclose(batch['events']['timestamp'],
                       ref['events']['timestamp'], atol=1e-6)
    assert (batch['images'] == ref['images']).all()

    # second batch spans the file boundary (samples 2,3)
    batch2 = next(loader)
    ref2 = collate_wrapper([dataset[2], dataset[3]])
    assert (batch2['events']['x'] == ref2['events']['x']).all()


def test_seek_resume_and_wraparound(tmp_path):
    out, dataset = write_shards(tmp_path)
    loader = PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                    show_progress=False)
    loader.set_index(4)
    batch = next(loader)
    ref = collate_wrapper([dataset[4], dataset[5]])
    assert (batch['events']['x'] == ref['events']['x']).all()
    # stream wraps to the beginning
    batch = next(loader)
    ref = collate_wrapper([dataset[0], dataset[1]])
    assert (batch['events']['x'] == ref['events']['x']).all()
    # seek past the length wraps modulo
    loader.set_index(7)
    batch = next(loader)
    ref = collate_wrapper([dataset[1], dataset[2]])
    assert (batch['events']['x'] == ref['events']['x']).all()


def test_sharded_process_stride(tmp_path):
    """Multi-host stream sharding: two process-strided loaders together
    cover exactly the global loader's batches (each reading only its
    half), across shard boundaries and the epoch wrap."""
    out, dataset = write_shards(tmp_path)  # 6 samples in 2 shards
    g = PreprocessedDataloader(out, batch_size=4, is_raw=True,
                               show_progress=False)
    locals_ = [PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                      show_progress=False,
                                      process_index=p, process_count=2)
               for p in range(2)]
    for _ in range(6):   # 6 global batches = 4 epochs, many wraps
        gb = next(g)
        parts = [next(lo) for lo in locals_]
        assert np.concatenate([p['events']['x'] for p in parts]).tolist() \
            == gb['events']['x'].tolist()
        assert (np.concatenate([p['images'] for p in parts])
                == gb['images']).all()
        assert np.allclose(np.concatenate([p['timestamps'] for p in parts]),
                           gb['timestamps'])


def test_sharded_set_index_and_skip_batch(tmp_path):
    """set_index takes the GLOBAL sample index; skip_batch strides one
    full global batch without reading."""
    out, dataset = write_shards(tmp_path)
    p1 = PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                show_progress=False,
                                process_index=1, process_count=2)
    # global batch starting at sample 4 -> process 1 serves samples {0,1}
    # (4+2=6 wraps to 0)
    p1.set_index(4)
    batch = next(p1)
    ref = collate_wrapper([dataset[0], dataset[1]])
    assert (batch['events']['x'] == ref['events']['x']).all()

    p0 = PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                show_progress=False,
                                process_index=0, process_count=2)
    p0.skip_batch()          # past global batch 0 (samples 0..3)
    batch = next(p0)         # global batch 1 -> process 0 gets {4,5}
    ref = collate_wrapper([dataset[4], dataset[5]])
    assert (batch['events']['x'] == ref['events']['x']).all()


def test_info_sidecars_written(tmp_path):
    out, _ = write_shards(tmp_path)
    PreprocessedDataloader(out, batch_size=1, is_raw=True,
                           show_progress=False)
    assert (out / '0.info').is_file()
    assert (out / '1.info').is_file()


def test_train_step_on_preprocessed_shard(tmp_path):
    """1-step smoke training from a preprocessed stream (the reference pins
    this integration in tests/dataset/test_encoding.py:315-360)."""
    import jax
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                     load_model_class)
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)
    from dvs_of_training_framework_tpu.training.train import (shapes2tags,
                                                              train)
    from tests.training.test_training import ListLogger, make_args

    out, _ = write_shards(tmp_path)
    loader = PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                    show_progress=False)
    module = load_model_class(REPO / 'DummyFlowNet')
    model = module.Model(**filter_kwargs(module.Model, {}))
    batch = pad_batch(next(loader), capacity=2048)
    params = model.init(jax.random.PRNGKey(0), batch.events,
                        batch.timestamps, batch.sample_idx,
                        (64, 64))['params']
    args = make_args()
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [(64 // 2 ** i, 64 // 2 ** i) for i in range(4)][::-1])
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    loader.set_index(0)
    state, samples = train(train_step, state, loader, num_steps=1,
                           logger=ListLogger(),
                           tags=shapes2tags(evaluator.shapes),
                           event_capacity=2048)
    assert int(state.step) == 1
    assert samples == 2


def test_max_batch_events(tmp_path):
    """Auto capacity = worst sliding window (any alignment + epoch wrap)."""
    from dvs_of_training_framework_tpu.data.preprocessed import \
        max_batch_events
    out, dataset = write_shards(tmp_path)
    per_sample = []
    for i in range(6):
        per_sample.append(dataset[i][0]['x'].shape[0])
    wrapped = per_sample + per_sample[:1]
    expect = max(sum(wrapped[i:i + 2]) for i in range(6))
    assert max_batch_events(out, 2) == expect
    # batch >= dataset: the whole stream
    assert max_batch_events(out, 16) == sum(per_sample)


def test_resolve_event_capacity_auto(tmp_path):
    from types import SimpleNamespace

    from dvs_of_training_framework_tpu.data.preprocessed import \
        max_batch_events
    from dvs_of_training_framework_tpu.utils.options import \
        resolve_event_capacity
    out, _ = write_shards(tmp_path)
    args = SimpleNamespace(event_capacity='auto', mbs=2,
                           preprocessed_dataset_path=out,
                           max_events_per_batch=10 ** 9)
    resolve_event_capacity(args)
    worst = max_batch_events(out, 2)
    assert args.event_capacity % 1024 == 0
    assert worst <= args.event_capacity < worst + 1024
    # concrete values pass through untouched
    args2 = SimpleNamespace(event_capacity=4096)
    resolve_event_capacity(args2)
    assert args2.event_capacity == 4096


def test_resolve_wire_events_auto(tmp_path):
    """--wire-events auto: pooled iff a raw preprocessed stream feeds
    the device queue at < 80% mean fill; padded on multi-host, dense,
    windowless and raw-augmenting configurations."""
    from types import SimpleNamespace

    from dvs_of_training_framework_tpu.data.preprocessed import \
        per_sample_event_counts
    from dvs_of_training_framework_tpu.utils.options import \
        resolve_wire_events
    out, _ = write_shards(tmp_path)
    mean_batch = per_sample_event_counts(out).mean() * 2

    def make(**kw):
        base = dict(wire_events='auto', is_raw=True, mbs=2,
                    preprocessed_dataset_path=out,
                    device_queue_window=16,
                    event_capacity=int(mean_batch * 4))  # fill 0.25
        base.update(kw)
        return SimpleNamespace(**base)

    assert resolve_wire_events(make()).wire_events == 'pooled'
    # high fill: the pool's +capacity tail would ship MORE than padded
    high = make(event_capacity=int(mean_batch * 1.05))
    assert resolve_wire_events(high).wire_events == 'padded'
    # dense / windowless / raw-augmenting / multi-host resolve padded
    assert resolve_wire_events(make(is_raw=False)).wire_events == 'padded'
    assert resolve_wire_events(
        make(device_queue_window=0)).wire_events == 'padded'
    assert resolve_wire_events(
        make(preprocessed_dataset_path=None)).wire_events == 'padded'
    assert resolve_wire_events(
        make(num_processes=2)).wire_events == 'padded'
    # explicit choices pass through untouched
    assert resolve_wire_events(
        make(wire_events='pooled', event_capacity=1)).wire_events \
        == 'pooled'


def test_resolve_wire_data_auto():
    """--wire-data auto: bf16 exactly when --precision bfloat16 makes
    the cast effect-lossless; explicit lossy pairing warns."""
    import warnings
    from types import SimpleNamespace

    from dvs_of_training_framework_tpu.utils.options import \
        resolve_wire_data

    a = SimpleNamespace(wire_data='auto', precision='bfloat16')
    assert resolve_wire_data(a).wire_data == 'bf16'
    b = SimpleNamespace(wire_data='auto', precision=None)
    assert resolve_wire_data(b).wire_data == 'f32'
    c = SimpleNamespace(wire_data='f32', precision='bfloat16')
    assert resolve_wire_data(c).wire_data == 'f32'  # explicit untouched
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        d = SimpleNamespace(wire_data='bf16', precision=None)
        assert resolve_wire_data(d).wire_data == 'bf16'
    assert any('quantized to bf16' in str(w.message) for w in caught)
