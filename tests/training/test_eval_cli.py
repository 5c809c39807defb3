"""End-to-end evaluation pipeline on synthetic MVSEC-shaped raw data.

Builds a miniature raw sequence (davis/left/* layout + FlowGT npz + info
file), a checkpoint, and runs the perform_single_test path from test.py —
exercising Serializer.finalize, the OpticalFlow plugin boundary, frame
generation, GT propagation, and the AEE metrics together.
"""
from pathlib import Path
from types import SimpleNamespace

import h5py
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

H, W = 64, 64


@pytest.fixture
def raw_sequence(tmp_path):
    rng = np.random.default_rng(0)
    n_events = 5000
    t0 = 100.0
    duration = 2.0
    events = np.stack([
        rng.integers(0, W, n_events).astype(np.float64),
        rng.integers(0, H, n_events).astype(np.float64),
        np.sort(rng.uniform(t0, t0 + duration, n_events)),
        rng.choice([-1.0, 1.0], n_events)], axis=1)
    image_ts = np.arange(t0, t0 + duration, 0.1)
    seq_dir = tmp_path / 'mini' / 'mini_seq1'[:-1]
    seq_dir.mkdir(parents=True)
    with h5py.File(seq_dir / 'mini_seq1_data.hdf5', 'w') as f:
        left = f.create_group('davis').create_group('left')
        left.create_dataset('events', data=events)
        left.create_dataset('image_raw_ts', data=image_ts)
        left.create_dataset('image_raw',
                            data=rng.integers(0, 255,
                                              (image_ts.size, H, W))
                            .astype(np.uint8))
        left.create_dataset(
            'image_raw_event_inds',
            data=np.searchsorted(events[:, 2], image_ts) - 1)
    gt_dir = tmp_path / 'mini' / 'FlowGT' / 'mini_seq'
    gt_dir.mkdir(parents=True)
    gt_ts = np.arange(t0, t0 + duration + 0.2, 0.1)
    np.savez(gt_dir / 'mini_seq1_gt_flow_dist.npz',
             timestamps=gt_ts,
             x_flow_dist=np.full((gt_ts.size, H, W), 0.5, np.float32),
             y_flow_dist=np.zeros((gt_ts.size, H, W), np.float32))
    return tmp_path / 'mini', t0


def test_perform_single_test(raw_sequence, tmp_path):
    import test as test_cli

    ds_dir, t0 = raw_sequence
    seq_file, gt_file = test_cli.seq2paths(ds_dir, 'mini_seq1')
    assert seq_file.is_file()
    assert gt_file.is_file()

    dataset = SimpleNamespace(name='mini_seq1')
    dataset.events, dataset.image_ts = test_cli.load_events(seq_file)
    dataset.gt = test_cli.load_gt(gt_file)
    dataset.imshape = dataset.gt['x_flow_dist'].shape[1:]
    dataset.first_ts = t0

    args = SimpleNamespace(flownet_path=REPO / 'DummyFlowNet',
                           model=None, mish=False,
                           prefix_length=0, suffix_length=0,
                           max_sequence_length=1,
                           dynamic_sample_length=False,
                           event_representation_depth=9)
    cfg = SimpleNamespace(start=0.2, stop=1.0, step=1,
                          test_shape=[48, 48], crop_type='central',
                          is_car=False)
    mAEE, mpAEE, stats = test_cli.perform_single_test(args, cfg, dataset)
    # zero-flow prediction vs 0.5px/interval GT inside one interval:
    # expected displacement == 0.5 px per window of 0.1 s
    assert np.isfinite(mAEE)
    assert mAEE == pytest.approx(0.5, rel=1e-2)
    assert 0.9 < mpAEE <= 1.0
    # the robust view rides along: constant-EE windows have median == mean
    assert stats['median_ee'] == pytest.approx(mAEE, rel=1e-2)
    assert stats['windows'], 'per-window dump missing'
    w = stats['windows'][0]
    assert set(w) >= {'start', 'stop', 'aee', 'percent_aee',
                      'median_ee', 'n_points'}
    assert w['stop'] > w['start']


def test_process_all_aggregates_tb(raw_sequence, tmp_path, monkeypatch):
    """process_all evaluates every checkpoint AND writes the TB summary.

    Regression: export_weights_only used to overwrite args.model on the
    shared per-step namespace with the (deleted-after-use) temp
    checkpoint path, so the post-evaluation samples_passed aggregation
    crashed with FileNotFoundError after all pickles were written.
    """
    import test as test_cli
    from dvs_of_training_framework_tpu.training.serializer import Serializer

    ds_dir, t0 = raw_sequence
    root = tmp_path / 'root'
    (root / 'raw').mkdir(parents=True)
    (root / 'raw' / 'mini').symlink_to(ds_dir)
    (root / 'info').mkdir()
    with h5py.File(root / 'info' / 'mini.hdf5', 'w') as f:
        f.create_dataset('set_name', data=np.array([b'mini_seq1']))
        f.create_dataset('start_time', data=np.array([t0]))
    cfg_path = tmp_path / 'cfg.yml'
    cfg_path.write_text(
        'mini:\n'
        '  mini_seq1:\n'
        '    step: [1]\n'
        '    start: 0.2\n'
        '    stop: 1.0\n'
        '    test_shape: [48, 48]\n'
        '    crop_type: central\n'
        '    is_car: False\n')

    model_dir = tmp_path / 'run'
    model_dir.mkdir()
    ser = Serializer(model_dir)
    params = {'flow_bias': np.zeros(2, np.float32)}
    for step in (1, 2):
        ser.checkpoint_model(params, {}, global_step=step,
                             samples_passed=step * 4)
    ser.wait()

    monkeypatch.setenv('DVS_DATA_ROOT', str(root))
    out = tmp_path / 'out'
    args = SimpleNamespace(model=model_dir, output=out,
                           flownet_path=REPO / 'DummyFlowNet',
                           test_config=cfg_path, tests_per_device=1,
                           bs=4, mish=False,
                           prefix_length=0, suffix_length=0,
                           max_sequence_length=1,
                           dynamic_sample_length=False,
                           event_representation_depth=9,
                           eval_batch_windows=2)
    test_cli.process_all(args)

    assert (out / 'step_1.pkl').is_file()
    assert (out / 'step_2.pkl').is_file()
    # the TB aggregation ran: a summary file exists and the original
    # namespaces still point at the run directory, not a temp checkpoint
    assert any((out / 'log').iterdir())


def test_device_pool_balances():
    import test as test_cli
    import jax
    calls = []

    def job(args):
        calls.append(args)

    pool = test_cli.DevicePool(jax.devices()[:2], tests_per_device=1)
    pool(job, list(range(6)))
    assert sorted(calls) == list(range(6))
