"""Dataset read contract, deterministic augmentation, collate.

Mirrors the verification strategy of the reference test-suite
(tests/dataset/test_dataset.py there): augmentation parameters are injected
through ``DatasetImpl.__getitem__`` keywords so each transform is pinned
without RNG control.
"""
import numpy as np

from dvs_of_training_framework_tpu.data.dataset import Dataset, DatasetImpl
from dvs_of_training_framework_tpu.data.collate import collate_wrapper
from tests.helpers import data_path, read_test_elem, concat_events, compare


def test_read():
    dataset = Dataset(path=data_path,
                      shape=[256, 256],
                      augmentation=True,
                      collapse_length=2,
                      is_raw=True)
    assert len(dataset) > 0
    events, timestamps, images, augmentation_parameters = dataset[0]
    assert isinstance(events, dict)
    for key in ('x', 'y', 'timestamp', 'polarity', 'element_index'):
        assert key in events
        assert isinstance(events[key], np.ndarray)
    assert events['x'].dtype == np.int64
    assert events['y'].dtype == np.int64
    assert events['timestamp'].dtype == np.float32
    assert events['polarity'].dtype == np.int64
    assert events['element_index'].dtype == np.int64
    n = events['x'].size
    for k, v in events.items():
        assert v.size == n, k
    assert (events['element_index'] != 0).sum() == 0
    assert images.ndim == 3
    assert images.shape == (2, 256, 256)
    assert timestamps.shape == (2,)
    assert timestamps[0] < timestamps[1]


def _full_box():
    return np.array([0, 0, 260, 346])


def _check_aug_params(aug_params, idx, seq_length, k, box, angle, is_flip):
    assert idx == aug_params[0]
    assert seq_length == aug_params[1]
    assert k == aug_params[2]
    assert (box == aug_params[3]).all()
    assert angle == aug_params[4]
    assert is_flip == aug_params[5]


def test_data_augmentation_collapse():
    dataset = DatasetImpl(path=data_path,
                          shape=[256, 256],
                          augmentation=True,
                          collapse_length=2,
                          is_raw=True)
    gt_idx, gt_k, gt_flip, gt_angle = 1, 2, False, 0
    gt_box, gt_seq_length = _full_box(), 1
    events, timestamps, images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)

    element1 = read_test_elem(1, element_index=0, box=gt_box)
    element2 = read_test_elem(2, element_index=0, box=gt_box)
    gt_events = concat_events(element1[0], element2[0])
    gt_timestamps = np.array([0, element2[2] - element1[1]])
    gt_events['timestamp'] = (gt_events['timestamp']
                              - element1[1]).astype(np.float32)
    assert element1[2] == element2[1]
    assert (element1[4] == element2[3]).all()
    gt_images = np.concatenate([element1[3][None], element2[4][None]],
                               axis=0).astype(np.float32)

    compare(events, {k: np.asarray(v) for k, v in gt_events.items()})
    assert np.allclose(timestamps, gt_timestamps)
    assert (images == gt_images).all()


def test_data_augmentation_flip():
    dataset = DatasetImpl(path=data_path,
                          shape=[256, 256],
                          augmentation=True,
                          collapse_length=2,
                          is_raw=True)
    gt_idx, gt_k, gt_flip, gt_angle = 1, 1, True, 0
    gt_box, gt_seq_length = _full_box(), 1
    events, _, first_images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)
    first_indices = np.ravel_multi_index(
        np.vstack([events['y'][None], events['x'][None]]),
        first_images[0].shape)

    gt_flip = not gt_flip
    events, _, second_images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)
    second_indices = np.ravel_multi_index(
        np.vstack([events['y'][None], events['x'][None]]),
        second_images[0].shape)

    assert (first_images != second_images).any()
    assert first_images.shape == second_images.shape
    # an event and the pixel under it must co-flip
    for i in range(first_images.shape[0]):
        assert (first_images[i].ravel()[first_indices]
                == second_images[i].ravel()[second_indices]).all()


def test_data_augmentation_angle():
    dataset = DatasetImpl(path=data_path,
                          shape=[256, 256],
                          augmentation=True,
                          collapse_length=2,
                          is_raw=True)
    gt_idx, gt_k, gt_flip, gt_angle = 1, 1, False, 90
    gt_box, gt_seq_length = _full_box(), 1
    events, _, rotated_images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)

    rotated_indices = np.ravel_multi_index(
        np.vstack([events['y'][None], events['x'][None]]),
        rotated_images[0].shape)
    H, W = rotated_images.shape[-2:]
    assert W % 2 == 0
    assert H % 2 == 0
    # analytic inverse of the 90-degree rotation about the image center
    x = -(events['y'][None] - H // 2) + W // 2
    y = (events['x'][None] - W // 2) + H // 2
    assert (y < H).all() and (y >= 0).all()
    assert (x < W).all() and (x >= 0).all()
    original_indices = np.ravel_multi_index(np.vstack([y, x]), [H, W])

    gt_angle = 0
    _, _, original_images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)

    assert (original_images != rotated_images).any()
    assert original_images.shape == rotated_images.shape
    for i in range(original_images.shape[0]):
        assert (original_images[i].ravel()[original_indices]
                == rotated_images[i].ravel()[rotated_indices]).all()


def test_data_augmentation_crop():
    dataset = DatasetImpl(path=data_path,
                          shape=[256, 256],
                          augmentation=True,
                          collapse_length=2,
                          is_raw=True)
    gt_idx, gt_k, gt_flip, gt_angle = 1, 1, False, 0
    gt_box, gt_seq_length = np.array([1, 2, 100, 150]), 1
    events, _, images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)
    assert images.shape[-2:] == tuple(gt_box[-2:])
    assert (events['x'] >= 0).all()
    assert (events['y'] >= 0).all()
    assert (events['x'] < gt_box[-1]).all()
    assert (events['y'] < gt_box[-2]).all()

    gt_events, _, _, gt_image1, gt_image2 = read_test_elem(
        gt_idx, element_index=0)
    gt_images = np.concatenate([gt_image1[None], gt_image2[None]], axis=0)

    box_stop = [gt_box[0] + gt_box[2], gt_box[1] + gt_box[3]]
    assert (gt_images[:, gt_box[0]:box_stop[0], gt_box[1]:box_stop[1]]
            == images).all()
    mask = np.logical_and(
        np.logical_and(gt_events['x'] >= gt_box[1],
                       gt_events['x'] < box_stop[1]),
        np.logical_and(gt_events['y'] >= gt_box[0],
                       gt_events['y'] < box_stop[0]))
    cropped_indices = np.ravel_multi_index(
        np.vstack([events['y'][None], events['x'][None]]), images.shape[-2:])
    original_indices = np.ravel_multi_index(
        np.vstack([gt_events['y'][mask][None], gt_events['x'][mask][None]]),
        gt_images.shape[-2:])
    for i in range(images.shape[0]):
        assert (images[i].ravel()[cropped_indices]
                == gt_images[i].ravel()[original_indices]).all()


def test_data_augmentation_sequence():
    dataset = DatasetImpl(path=data_path,
                          shape=[256, 256],
                          augmentation=True,
                          collapse_length=2,
                          is_raw=True)
    gt_idx, gt_k, gt_flip, gt_angle = 1, 1, False, 0
    gt_box, gt_seq_length = _full_box(), 2
    events, timestamps, images, aug_params = dataset.__getitem__(
        idx=gt_idx, k=gt_k, is_flip=gt_flip, angle=gt_angle, box=gt_box,
        seq_length=gt_seq_length)
    _check_aug_params(aug_params, gt_idx, gt_seq_length, gt_k, gt_box,
                      gt_angle, gt_flip)

    element1 = read_test_elem(gt_idx, element_index=0)
    element2 = read_test_elem(gt_idx + 1, element_index=1)
    gt_events = concat_events(element1[0], element2[0])
    gt_events['timestamp'] = (gt_events['timestamp']
                              - element1[1]).astype(np.float32)
    gt_timestamps = np.array([element1[1], element1[2], element2[2]]) \
        - element1[1]
    assert element1[2] == element2[1]
    assert (element1[4] == element2[3]).all()
    gt_images = np.concatenate([element1[3][None],
                                element1[4][None],
                                element2[4][None]],
                               axis=0).astype(np.float32)
    compare(events, {k: np.asarray(v) for k, v in gt_events.items()})
    assert np.allclose(timestamps, gt_timestamps)
    assert (images == gt_images).all()


def test_collate():
    dataset = DatasetImpl(path=data_path,
                          shape=[260, 346],
                          augmentation=False,
                          collapse_length=1,
                          is_raw=True)
    batch = collate_wrapper([dataset[0], dataset[1]])

    element1 = read_test_elem(0, element_index=0)
    element2 = read_test_elem(1, element_index=0)
    element1[0]['timestamp'] = (element1[0]['timestamp']
                                - element1[1]).astype(np.float32)
    element2[0]['timestamp'] = (element2[0]['timestamp']
                                - element2[1]).astype(np.float32)
    gt_events = concat_events(element1[0], element2[0])
    gt_events['sample_index'] = np.hstack([
        np.full_like(element1[0]['x'], 0),
        np.full_like(element2[0]['x'], 1)])
    gt_timestamps = np.array(
        [0, element1[2] - element1[1], 0, element2[2] - element2[1]],
        dtype=np.float32)
    gt_sample_idx = np.array([0, 0, 1, 1], dtype=np.int64)
    gt_images = np.stack([element1[3], element1[4],
                          element2[3], element2[4]])[:, None] \
        .astype(np.float32)

    compare(batch['events'], {k: np.asarray(v) for k, v in gt_events.items()})
    assert np.allclose(batch['timestamps'], gt_timestamps)
    assert (batch['sample_idx'] == gt_sample_idx).all()
    assert (batch['images'] == gt_images).all()
    assert batch['size'] == 2


def test_process_worker_loader_matches_thread_loader():
    """worker_mode='process' (forked pool) yields the same batches as the
    thread pool on a deterministic (augmentation-off) finite dataset."""
    from dvs_of_training_framework_tpu.data.dataloader import HostDataLoader

    def make_loader(mode):
        ds = Dataset(path=data_path, shape=(64, 64), augmentation=False,
                     collapse_length=1, min_seq_length=1, max_seq_length=1,
                     is_static_seq_length=True, is_raw=True)
        return HostDataLoader(ds, batch_size=2, num_workers=2,
                              worker_mode=mode)

    thread_batches = list(make_loader('thread'))
    process_batches = list(make_loader('process'))
    assert len(thread_batches) == len(process_batches) > 0
    for t, p in zip(thread_batches, process_batches):
        assert t['size'] == p['size']
        for key in ('timestamps', 'sample_idx', 'images'):
            np.testing.assert_array_equal(np.asarray(t[key]),
                                          np.asarray(p[key]), err_msg=key)
        for key, val in t['events'].items():
            np.testing.assert_array_equal(np.asarray(val),
                                          np.asarray(p['events'][key]),
                                          err_msg=key)


def test_process_worker_loader_augmented_stream():
    """Forked workers draw de-aliased augmentations and stream an
    infinite augmented dataset without deadlock."""
    import itertools
    from dvs_of_training_framework_tpu.data.dataset import IterableDataset
    from dvs_of_training_framework_tpu.data.dataloader import HostDataLoader

    ds = IterableDataset(path=data_path, shape=(64, 64), augmentation=True,
                         collapse_length=1, min_seq_length=1,
                         max_seq_length=1, is_static_seq_length=True,
                         is_raw=True, shuffle=True)
    loader = HostDataLoader(ds, batch_size=2, num_workers=2,
                            worker_mode='process')
    batches = list(itertools.islice(iter(loader), 3))
    assert len(batches) == 3
    for b in batches:
        assert b['size'] == 2
        assert b['events']['x'].size > 0
