"""End-to-end offline preprocessing chain on fixture data.

prepare_batches -> shards readable by PreprocessedDataloader ->
quantize_preprocessed-style baking via model.quantize -> quantized shards
decode to dense batches.
"""
from pathlib import Path
from types import SimpleNamespace

import numpy as np

from dvs_of_training_framework_tpu.data import codec
from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from dvs_of_training_framework_tpu.data.dataset import Dataset
from dvs_of_training_framework_tpu.data.preprocessed import \
    PreprocessedDataloader
from tests.helpers import data_path

REPO = Path(__file__).resolve().parents[2]


def test_prepare_batches_main(tmp_path):
    """scripts/prepare_batches.main writes resumable encoded shards."""
    from scripts.prepare_batches import main

    out = tmp_path / 'prep'
    out.mkdir()
    args = SimpleNamespace(
        output=out, size=6, samples_per_file=2, mbs=2,
        # loader params
        shape=(64, 64), num_workers=0, min_sequence_length=1,
        max_sequence_length=1, dynamic_sample_length=False,
        cl=1, is_raw=True, preprocessed_dataset_path=None,
        cache_dir=None, cache_size=0,
        data_path=None)

    # point the trainset at the fixtures
    import dvs_of_training_framework_tpu.data.dataloader as dl

    def fake_trainset_params(a):
        p = dl.get_common_dataset_params(a)
        p.path = data_path
        p.augmentation = False
        p.collapse_length = 1
        p.shuffle = False
        p.infinite = True
        p.is_raw = True
        p.preprocessed_dataset_path = None
        p.cache_dir = None
        p.cache_size = 0
        p.event_image_fn = None
        return p

    import scripts.prepare_batches as pb
    orig = pb.get_trainset_params
    pb.get_trainset_params = fake_trainset_params
    try:
        main(args)
        files_before = sorted(out.glob('*.hdf5'))
        assert len(files_before) >= 3
        # resumable: rerunning writes nothing new
        main(args)
        assert sorted(out.glob('*.hdf5')) == files_before
    finally:
        pb.get_trainset_params = orig

    loader = PreprocessedDataloader(out, batch_size=2, is_raw=True,
                                    show_progress=False)
    assert len(loader) == 6
    batch = next(loader)
    dataset = Dataset(path=data_path, shape=[64, 64], augmentation=False,
                      collapse_length=1, is_raw=True, max_seq_length=1)
    ref = collate_wrapper([dataset[0], dataset[1]])
    assert (batch['events']['x'] == ref['events']['x']).all()


def test_quantize_parse_args_resolves_auto_capacity(tmp_path):
    """scripts/quantize_preprocessed.parse_args resolves --event-capacity
    auto to a concrete int (regression: it stayed the string 'auto' and
    broke the oversize check in main with a str/int comparison)."""
    from scripts.quantize_preprocessed import parse_args
    from tests.dataset.test_preprocessed import write_shards

    shards, _ = write_shards(tmp_path, samples_per_file=4, num_files=2)
    ckpt = tmp_path / 'step_1.ckpt'
    ckpt.write_bytes(b'stub')
    args = parse_args(['-o', str(tmp_path / 'quant'), '-s', '8',
                       '--samples-per-file', '4',
                       '--flownet_path', str(REPO / 'EVFlowNet'),
                       '--preprocessed-dataset-path', str(shards),
                       '--event-capacity', 'auto',
                       '-sp', str(ckpt)], is_write=False)
    assert isinstance(args.event_capacity, int)
    assert args.event_capacity >= 1024


def test_quantized_baking_roundtrip(tmp_path):
    """model.quantize -> encode_quantized_batch -> shard -> decode."""
    import jax
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                     load_model_class)

    dataset = Dataset(path=data_path, shape=[64, 64], augmentation=False,
                      collapse_length=1, is_raw=True, max_seq_length=1)
    batch = collate_wrapper([dataset[0], dataset[1]])
    device_batch = pad_batch(batch, capacity=4096)

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(**filter_kwargs(module.Model, dict(
        event_representation_depth=3, base_channels=4)))
    params = model.init(jax.random.PRNGKey(0), device_batch.events,
                        device_batch.timestamps, device_batch.sample_idx,
                        (64, 64))['params']
    data = np.asarray(model.apply(
        {'params': params}, device_batch.events, device_batch.timestamps,
        device_batch.sample_idx, (64, 64), method=model.quantize))
    assert data.shape == (2, 3, 64, 64)

    quantized = {'data': data,
                 'timestamps': batch['timestamps'],
                 'sample_idx': batch['sample_idx'],
                 'images': batch['images'],
                 'augmentation_params': batch['augmentation_params'],
                 'size': batch['size']}
    encoded = codec.encode_quantized_batch(quantized)
    path = tmp_path / '0.hdf5'
    codec.write_encoded_batch(path, encoded)

    loader = PreprocessedDataloader(tmp_path, batch_size=2, is_raw=False,
                                    show_progress=False)
    out = next(loader)
    assert out['data'].shape == (2, 3, 64, 64)
    np.testing.assert_allclose(out['data'], data, rtol=1e-6)
    # dense batch trains with raw=False (pad_batch data path)
    dense = pad_batch(out)
    assert dense.data is not None and dense.events is None
