#!/usr/bin/env python3
"""Checkpoint benchmarking CLI — evaluates checkpoints on MVSEC sequences.

TPU counterpart of the reference test.py: evaluates one checkpoint (``-s``)
or every known checkpoint against the ``config/testing.yml`` matrix, writes
per-checkpoint pickles, and aggregates results to TensorBoard keyed by
samples_passed.  The reference's multi-GPU process pool
(test.py:191-245 GPUPool) becomes a DevicePool thread scheduler: a single
process owns all local TPU cores, threads pin work to cores with
``jax.default_device``, and a least-loaded policy balances checkpoints
across cores.
"""
import os
import pickle
import re
import sys
import tempfile
import threading
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from types import SimpleNamespace

import h5py
import numpy as np

from dvs_of_training_framework_tpu.utils.options import (
    add_test_arguments, options2model_kwargs, validate_test_args)

script_dir = Path(__file__).resolve().parent


def parse_args(argv=None):
    parser = ArgumentParser()
    args = add_test_arguments(parser).parse_args(argv)
    args = validate_test_args(args)
    if args.device:
        os.environ.setdefault('JAX_PLATFORMS', args.device)
    return args


# --- sequence IO ------------------------------------------------------------

def seq2paths(dataset_path, seq_name):
    """Raw-data and GT file paths of an MVSEC sequence.

    ``outdoor_day2`` lives under ``<root>/outdoor_day/`` (the trailing
    digits name the take, the stem names the directory).
    """
    take_family = re.sub(r'\d+$', '', seq_name)
    return (dataset_path / take_family / f'{seq_name}_data.hdf5',
            dataset_path / 'FlowGT' / take_family /
            f'{seq_name}_gt_flow_dist.npz')


def load_events(path):
    """Events as 4 row-arrays [x, y, t, p] plus the frame timestamps."""
    with h5py.File(str(path), 'r') as f:
        davis = f['davis']['left']
        columns = np.asarray(davis['events'], dtype=np.float64)
        image_ts = np.asarray(davis['image_raw_ts'], dtype=np.float64)
    return columns.T, image_ts


def load_gt(path):
    with np.load(str(path)) as archive:
        return dict(archive)


def load_sequence(dataset_path, seq_name, first_ts):
    """Assemble the per-sequence record consumed by perform_single_test."""
    seq_file, gt_file = seq2paths(dataset_path, seq_name)
    record = SimpleNamespace(name=seq_name, first_ts=first_ts)
    record.events, record.image_ts = load_events(seq_file)
    record.gt = load_gt(gt_file)
    record.imshape = record.gt['x_flow_dist'].shape[1:]
    return record


# --- one (checkpoint, sequence, config) evaluation ---------------------------

def resolve_time_range(cfg, dataset):
    """Make cfg.start/stop absolute; defaults span the whole sequence."""
    first = dataset.first_ts
    cfg.start = first if cfg.start is None else first + cfg.start
    if cfg.stop is None:
        cfg.stop = min(dataset.events[2][-1], dataset.gt['timestamps'][-2])
    else:
        cfg.stop = first + cfg.stop
    return cfg


def generate_frames(cfg, image_ts):
    """(start, stop) frame-timestamp windows, ``cfg.step`` frames apart."""
    lo, hi = np.searchsorted(image_ts, [cfg.start, cfg.stop])
    starts = image_ts[lo:hi - cfg.step]
    stops = image_ts[lo + cfg.step:hi]
    return list(zip(starts, stops))


def build_crops(imshape, test_shape, crop_type):
    """(event_crop, image_crop) pair for the configured crop type."""
    from dvs_of_training_framework_tpu.data.augmentation import (
        EventCrop, ImageCrop, central_shift)
    if crop_type != 'central':
        raise ValueError(f'Unknown crop type "{crop_type}"')
    box = [*central_shift(imshape, test_shape), *test_shape]
    return EventCrop(box), ImageCrop(box)


def init_model(args, test_shape):
    """Build the plugin's OpticalFlow wrapper (plugin boundary)."""
    from dvs_of_training_framework_tpu.models.loader import (filter_kwargs,
                                                            import_module)
    plugin_dir = Path(args.flownet_path)
    module = import_module(plugin_dir.name, plugin_dir / '__init__.py')
    kwargs = filter_kwargs(module.OpticalFlow, options2model_kwargs(args))
    if args.model is not None:
        kwargs['model'] = args.model
    return module.OpticalFlow(test_shape, **kwargs)


def perform_single_test(args, cfg, dataset):
    from dvs_of_training_framework_tpu.evaluation import evaluate
    cfg = resolve_time_range(cfg, dataset)
    event_crop, gt_crop = build_crops(dataset.imshape, cfg.test_shape,
                                      cfg.crop_type)
    stats = {}
    maee, mpaee = evaluate(
        init_model(args, cfg.test_shape),
        dataset.events,
        generate_frames(cfg, dataset.image_ts),
        dataset.gt,
        event_preproc_fun=event_crop,
        pred_postproc_fun=None,
        gt_proc_fun=gt_crop,
        is_car=cfg.is_car,
        log=False,
        batch_windows=getattr(args, 'eval_batch_windows', 8),
        stats_out=stats)
    return maee, mpaee, stats


# --- per-checkpoint driver ----------------------------------------------------

def get_output_path(args):
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    if Path(args.model).suffix == '.ckpt':
        checkpoint = Path(args.model)
    else:
        checkpoint = Serializer(args.model)._id2path(args.step)
    suffix = '_ema' if getattr(args, 'use_ema', False) else ''
    return args.output / (checkpoint.stem + suffix + '.pkl')


def export_weights_only(args):
    """Stage a weights-only temp checkpoint for the requested step.

    Works on a COPY of ``args``: process_all re-reads ``args.model`` (the
    original run directory) after the job to aggregate samples_passed, so
    the temp-checkpoint path must not leak back into the caller's
    namespace.
    """
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    args = SimpleNamespace(**vars(args))
    args.output = get_output_path(args)
    args.is_temporary_model = True
    handle = tempfile.NamedTemporaryFile(suffix='.ckpt', delete=False)
    handle.close()
    Serializer(args.model).finalize(args.step, handle.name,
                                    use_ema=getattr(args, 'use_ema',
                                                    False))
    args.model = Path(handle.name)
    return args


def iterate_test_matrix(config, data_dir, info_dir):
    """Yield (sequence record, raveled config) pairs for the whole matrix."""
    from dvs_of_training_framework_tpu.data.dataset import read_info
    from dvs_of_training_framework_tpu.evaluation import ravel_config
    for ds_name, ds_config in config.items():
        info = read_info(str(info_dir / f'{ds_name}.hdf5'))
        for seq_name, seq_config in ds_config.items():
            dataset = load_sequence(data_dir / ds_name, seq_name,
                                    info[seq_name])
            for cfg in ravel_config(seq_config):
                cfg.dataset = ds_name
                cfg.sequence = seq_name
                yield dataset, cfg


def build_test_matrix(args=None):
    """Materialise the whole test matrix (each sequence loaded ONCE).

    The returned list is read-only shared across checkpoint jobs —
    per-checkpoint state (resolved time ranges, results) lives on copies.
    """
    from dvs_of_training_framework_tpu.evaluation import read_config
    override = os.environ.get('DVS_DATA_ROOT')
    if override:
        data_dir = Path(override) / 'raw'
        info_dir = Path(override) / 'info'
    else:
        data_dir = (script_dir / '..' / 'data' / 'raw').resolve()
        info_dir = script_dir / 'data' / 'info'
    config_path = getattr(args, 'test_config', None) \
        or script_dir / 'config' / 'testing.yml'
    config = read_config(config_path)
    return list(iterate_test_matrix(config, data_dir, info_dir))


def process_single(args, matrix=None):
    args = export_weights_only(args)
    if args.output.is_file():  # this checkpoint was already evaluated
        if args.is_temporary_model:
            args.model.unlink()
        return

    if matrix is None:
        matrix = build_test_matrix(args)

    results = []
    for dataset, shared_cfg in matrix:
        cfg = SimpleNamespace(**vars(shared_cfg))  # job-local copy
        cfg.mAEE, cfg.mpAEE, stats = perform_single_test(args, cfg,
                                                         dataset)
        # robust statistic + per-window dump (mean AEE is outlier-
        # sensitive: a few hard windows can spike it while the typical
        # pixel improves — the dump lets spikes be traced to windows)
        cfg.mMedEE = stats.get('median_ee')
        cfg.windows = stats.get('windows')
        results.append(cfg)
        print(f'[{cfg.sequence}, {cfg.start}, {cfg.stop}, '
              f'{cfg.step}, {cfg.test_shape}, {cfg.crop_type}, '
              f'{cfg.is_car}]: Mean AEE: {cfg.mAEE:.6f}, '
              f'mean %AEE: {cfg.mpAEE * 100:.6f}, '
              f'mean median-EE: {cfg.mMedEE:.6f}')
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_bytes(pickle.dumps(results))
    if args.is_temporary_model:
        args.model.unlink()


def get_samples_passed(args):
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    state = Serializer(args.model).read_state_dict(args.step)
    fallback = int(state['global_step']) * args.bs
    return int(state.get('samples_passed', fallback))


class DevicePool:
    """Least-loaded scheduler of evaluation jobs across local devices.

    TPU analogue of the reference GPUPool: one thread pool, jobs pinned to
    the device with the fewest outstanding jobs; at most
    ``tests_per_device`` concurrent evaluations per device.
    """

    def __init__(self, devices, tests_per_device=2):
        self._devices = list(devices)
        self._tests_per_device = tests_per_device
        self._pool = ThreadPoolExecutor(
            max_workers=max(1, len(self._devices) * tests_per_device))
        self._lock = threading.Lock()
        self._load = {i: 0 for i in range(len(self._devices))}

    def _acquire(self):
        with self._lock:
            idx = min(self._load, key=self._load.get)
            self._load[idx] += 1
            return idx

    def _release(self, idx):
        with self._lock:
            self._load[idx] -= 1

    def __call__(self, func, args_list):
        import jax

        def run(job_args):
            idx = self._acquire()
            try:
                with jax.default_device(self._devices[idx]):
                    return func(job_args)
            finally:
                self._release(idx)

        futures = [self._pool.submit(run, a) for a in args_list]
        for f in futures:
            f.result()
        self._pool.shutdown()


def process_all(args):
    import jax
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    from dvs_of_training_framework_tpu.utils.tb import SummaryWriter

    args.__dict__.pop('step', None)
    per_step = [SimpleNamespace(step=s, **args.__dict__)
                for s in Serializer(args.model).list_known_steps()]
    # sequences are loaded once and shared read-only by every checkpoint
    # job (the reference reloads them per process, test.py:137-181)
    matrix = build_test_matrix(args)
    DevicePool(jax.local_devices(), args.tests_per_device)(
        lambda step_args: process_single(step_args, matrix), per_step)

    writer = SummaryWriter(args.output / 'log')
    for step_args in per_step:
        samples_passed = get_samples_passed(step_args)
        results = pickle.loads(get_output_path(step_args).read_bytes())
        for r in results:
            tag = (f'{r.dataset}/{r.sequence}/{r.step}/'
                   f'{r.start}/{r.stop}')
            writer.add_scalar(f'Test/mean AEE/{tag}', r.mAEE,
                              samples_passed)
            writer.add_scalar(f'Test/mean %AEE/{tag}', r.mpAEE * 100,
                              samples_passed)
    writer.close()


def main():
    args = parse_args()
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    if args.step is None:
        process_all(args)
    else:
        process_single(args)


if __name__ == '__main__':
    main()
