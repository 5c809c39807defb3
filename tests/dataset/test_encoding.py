"""Encoded-batch codec: golden pairs, round-trips, subrange index math.

Hand-written encoded<->decoded pairs (including an empty element) define the
storage format; the PreprocessedDataloader tests cover file-boundary reads
and seek-based resume.
"""
import numpy as np
import pytest

from dvs_of_training_framework_tpu.data import codec


def make_decoded_batch():
    """2 samples; sample0: 2 elements (3+0 events), sample1: 1 element (2).

    Element 1 of sample 0 is intentionally empty.
    """
    events = {
        'x': np.array([3, 5, 7, 11, 13], dtype=np.int64),
        'y': np.array([2, 4, 6, 8, 10], dtype=np.int64),
        'timestamp': np.array([0.01, 0.02, 0.08, 0.015, 0.025],
                              dtype=np.float32),
        'polarity': np.array([1, -1, 1, -1, 1], dtype=np.int64),
        'element_index': np.array([0, 0, 0, 0, 0], dtype=np.int64),
        'sample_index': np.array([0, 0, 0, 1, 1], dtype=np.int64),
    }
    timestamps = np.array([0.0, 0.05, 0.1, 0.0, 0.05], dtype=np.float32)
    sample_idx = np.array([0, 0, 0, 1, 1], dtype=np.int64)
    images = np.arange(5 * 1 * 2 * 3, dtype=np.float32) \
        .reshape(5, 1, 2, 3) % 255
    augmentation_params = {
        'idx': np.array([0, 1], dtype=np.int64),
        'sequence_length': np.array([2, 1], dtype=np.int64),
        'collapse_length': np.array([1, 1], dtype=np.int64),
        'box': np.array([[0, 0, 2, 3], [0, 0, 2, 3]], dtype=np.int64),
        'angle': np.array([0.0, 0.0], dtype=np.float32),
        'is_flip': np.array([False, True]),
    }
    return {'events': events, 'timestamps': timestamps,
            'sample_idx': sample_idx, 'images': images,
            'augmentation_params': augmentation_params, 'size': 2}


def expected_encoded_batch():
    batch = make_decoded_batch()
    return {
        'events': {
            'x': np.array([3, 5, 7, 11, 13], dtype=np.int16),
            'y': np.array([2, 4, 6, 8, 10], dtype=np.int16),
            'timestamp': batch['events']['timestamp'],
            'polarity': np.array([True, False, True, False, True]),
            # sample0 has 2 elements: [3, 0] events; sample1: [2]
            'events_per_element': np.array([3, 0, 2], dtype=np.int64),
        },
        'timestamps': batch['timestamps'],
        'elements_per_sample': np.array([2, 1], dtype=np.uint8),
        'images': batch['images'].astype(np.uint8),
        'augmentation_params': batch['augmentation_params'],
    }


def test_encode_batch():
    batch = make_decoded_batch()
    encoded = codec.encode_batch(**batch)
    expected = expected_encoded_batch()
    for k in ('x', 'y', 'polarity', 'events_per_element'):
        assert (encoded['events'][k] == expected['events'][k]).all(), k
        assert encoded['events'][k].dtype == expected['events'][k].dtype, k
    assert np.allclose(encoded['events']['timestamp'],
                       expected['events']['timestamp'])
    assert (encoded['elements_per_sample']
            == expected['elements_per_sample']).all()
    assert encoded['elements_per_sample'].dtype == np.uint8
    assert (encoded['images'] == expected['images']).all()
    assert encoded['images'].dtype == np.uint8


def test_decode_roundtrip():
    batch = make_decoded_batch()
    decoded = codec.decode_batch(codec.encode_batch(**batch))
    assert decoded['size'] == batch['size']
    for k in ('x', 'y', 'polarity', 'element_index', 'sample_index'):
        assert (decoded['events'][k] == batch['events'][k]).all(), k
    assert np.allclose(decoded['events']['timestamp'],
                       batch['events']['timestamp'])
    assert (decoded['sample_idx'] == batch['sample_idx']).all()
    assert np.allclose(decoded['timestamps'], batch['timestamps'])
    assert (decoded['images'] == batch['images']).all()


def test_decode_reconstructs_local_element_index():
    """Element indices restart at 0 inside every sample after decode."""
    batch = make_decoded_batch()
    # second sample's element has local index 0, not 2
    decoded = codec.decode_batch(codec.encode_batch(**batch))
    s = decoded['events']['sample_index']
    e = decoded['events']['element_index']
    assert (e[s == 1] == 0).all()


def test_join_batches():
    batch = make_decoded_batch()
    encoded = codec.encode_batch(**batch)
    joined = codec.join_batches([encoded, encoded])
    assert joined['elements_per_sample'].size == 4
    assert joined['events']['x'].size == 10
    assert joined['events']['events_per_element'].size == 6
    assert joined['timestamps'].size == 10
    assert joined['images'].shape[0] == 10

    empty = codec.join_batches([])
    assert empty['events']['x'].size == 0
    assert empty['elements_per_sample'].size == 0


def test_select_batch_info_ranges():
    elements_per_sample = np.array([2, 1, 3], dtype=np.int64)
    r = codec.select_batch_info_ranges(elements_per_sample, 1, 3)
    # timestamps per sample: 3, 2, 4 -> prefix [0, 3, 5, 9]
    assert r['timestamps'] == {'begin': 3, 'end': 9}
    assert r['images'] == {'begin': 3, 'end': 9}
    assert r['elements_per_sample'] == {'begin': 1, 'end': 3}
    for key in ('idx', 'sequence_length', 'collapse_length', 'box', 'angle',
                'is_flip'):
        assert r['augmentation_params'][key] == {'begin': 1, 'end': 3}


def test_select_encoded_ranges():
    events_per_element = np.array([3, 0, 2, 5, 1, 4], dtype=np.int64)
    elements_per_sample = np.array([2, 1, 3], dtype=np.int64)
    r = codec.select_encoded_ranges(events_per_element, elements_per_sample,
                                    1, 3)
    # element prefix: [0, 2, 3, 6]; event prefix: [0, 3, 3, 5, 10, 11, 15]
    assert r['events']['events_per_element'] == {'begin': 2, 'end': 6}
    assert r['events']['x'] == {'begin': 3, 'end': 15}
    assert r['events']['y'] == r['events']['x']
    assert r['events']['timestamp'] == r['events']['x']
    assert r['events']['polarity'] == r['events']['x']


def test_select_quantized_ranges():
    channels_per_sample = np.array([9, 9, 9], dtype=np.int64)
    elements_per_sample = np.array([1, 1, 1], dtype=np.int64)
    r = codec.select_quantized_ranges(channels_per_sample,
                                      elements_per_sample, 1, 3)
    assert r['data'] == {'begin': 9, 'end': 27}
    assert r['channels_per_sample'] == {'begin': 1, 'end': 3}


def test_write_read_roundtrip(tmp_path):
    batch = make_decoded_batch()
    encoded = codec.encode_batch(**batch)
    path = tmp_path / 'batch.hdf5'
    codec.write_encoded_batch(path, encoded)

    import h5py
    with h5py.File(path, 'r') as f:
        events_per_element = np.asarray(f['events']['events_per_element'])
        elements_per_sample = np.asarray(f['elements_per_sample'])
        # full read
        read_back = codec.read_encoded_batch(f, events_per_element,
                                             elements_per_sample, 0, 2)
        # subrange read: only the second sample
        sub = codec.read_encoded_batch(f, events_per_element,
                                       elements_per_sample, 1, 2)

    decoded = codec.decode_batch(read_back)
    for k in ('x', 'y', 'polarity'):
        assert (decoded['events'][k] == batch['events'][k]).all(), k
    sub_decoded = codec.decode_batch(sub)
    assert sub_decoded['size'] == 1
    assert (sub_decoded['events']['x'] == np.array([11, 13])).all()
    assert (sub_decoded['events']['sample_index'] == 0).all()


def test_quantized_roundtrip(tmp_path):
    B, C, H, W = 2, 4, 3, 5
    rng = np.random.default_rng(0)
    batch = {
        'data': rng.normal(size=(B, C, H, W)).astype(np.float32),
        'timestamps': np.array([0, 0.05, 0, 0.05], dtype=np.float32),
        'sample_idx': np.array([0, 0, 1, 1], dtype=np.int64),
        'images': (rng.uniform(0, 255, size=(4, 1, H, W))
                   .astype(np.float32)),
        'augmentation_params': {
            'idx': np.array([0, 1], dtype=np.int64),
            'sequence_length': np.array([1, 1], dtype=np.int64),
            'collapse_length': np.array([1, 1], dtype=np.int64),
            'box': np.array([[0, 0, H, W], [0, 0, H, W]], dtype=np.int64),
            'angle': np.array([0.0, 0.0], dtype=np.float32),
            'is_flip': np.array([False, False]),
        },
        'size': B,
    }
    encoded = codec.encode_quantized_batch(batch)
    assert encoded['data'].shape == (B * C, H, W)
    assert (encoded['channels_per_sample'] == C).all()

    decoded = codec.decode_quantized_batch(encoded)
    assert decoded['data'].shape == (B, C, H, W)
    assert np.allclose(decoded['data'], batch['data'])
    assert decoded['size'] == B

    path = tmp_path / 'q.hdf5'
    codec.write_encoded_batch(path, encoded)
    import h5py
    with h5py.File(path, 'r') as f:
        read_back = codec.read_encoded_quantized_batch(
            f, np.asarray(f['channels_per_sample']),
            np.asarray(f['elements_per_sample']), 1, 2)
    sub = codec.decode_quantized_batch(read_back)
    assert sub['size'] == 1
    assert np.allclose(sub['data'][0], batch['data'][1])


def test_pad_events_overflow():
    from dvs_of_training_framework_tpu.data.schema import pad_events
    events = make_decoded_batch()['events']
    with pytest.raises(OverflowError):
        pad_events(events, batch_size=2, capacity=3)
    buf = pad_events(events, batch_size=2, capacity=8)
    assert buf.capacity == 8
    assert int(buf.num_events) == 5
    assert (np.asarray(buf.sample_index)[5:] == 2).all()
    assert (np.asarray(buf.valid_mask())
            == np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=bool)).all()


def test_encode_trailing_empty_element():
    """A batch whose FINAL element holds zero events must still encode a
    zero count row for it (a near-still window after cropping produced
    shards whose events_per_element was one row short, breaking every
    later subrange read — round-3 accuracy-run crash)."""
    events = {'x': np.array([3, 4]),
              'y': np.array([5, 6]),
              'timestamp': np.array([0.01, 0.02], np.float32),
              'polarity': np.array([1.0, -1.0]),
              'element_index': np.array([0, 0]),
              'sample_index': np.array([0, 0])}
    timestamps = np.array([0., .04, .08, 0., .04, .08], np.float32)
    sample_idx = np.array([0, 0, 0, 1, 1, 1])
    images = np.zeros((6, 1, 4, 4), np.uint8)
    enc = codec.encode_batch(events, timestamps, sample_idx, images,
                             None, size=2)
    # 2 samples x 2 elements; sample 1 (and element 1 of sample 0) empty
    np.testing.assert_array_equal(enc['events']['events_per_element'],
                                  [2, 0, 0, 0])
    dec = codec.decode_batch(enc)
    np.testing.assert_array_equal(dec['events']['sample_index'], [0, 0])
    np.testing.assert_array_equal(dec['events']['element_index'], [0, 0])
    # subrange selection of the empty sample works
    ranges = codec.select_encoded_ranges(
        enc['events']['events_per_element'], enc['elements_per_sample'],
        1, 2)
    assert ranges['events']['x'] == {'begin': 2, 'end': 2}
