#!/usr/bin/env python3
"""Checkpoint benchmarking CLI — evaluates checkpoints on MVSEC sequences.

TPU counterpart of the reference test.py: evaluates one checkpoint (``-s``)
or every known checkpoint against the ``config/testing.yml`` matrix, writes
per-checkpoint pickles, and aggregates results to TensorBoard keyed by
samples_passed.  The reference's multi-GPU process pool
(test.py:191-245 GPUPool) becomes a DevicePool thread scheduler: a single
process owns all local TPU cores, threads pin work to cores with
``jax.device_put``, and a least-loaded policy balances checkpoints across
cores.
"""
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor
import os
from pathlib import Path
import pickle
import re
import sys
import tempfile
import threading
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


def get_output_path(args):
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    if Path(args.model).suffix == '.ckpt':
        model_path = Path(args.model)
    else:
        serializer = Serializer(args.model)
        model_path = serializer._id2path(args.step)
    return args.output / (model_path.stem + '.pkl')


def preprocess_args(args):
    """Export a weights-only temp file for the requested step."""
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    args.output = get_output_path(args)
    args.is_temporary_model = True
    f = tempfile.NamedTemporaryFile(suffix='.ckpt', delete=False)
    Serializer(args.model).finalize(args.step, f.name)
    args.model = Path(f.name)
    f.close()
    return args


def init_model(args, test_shape):
    """Build the plugin's OpticalFlow wrapper (plugin boundary)."""
    from dvs_of_training_framework_tpu.models.loader import (filter_kwargs,
                                                            import_module)
    module = import_module(f'{Path(args.flownet_path).name}',
                          Path(args.flownet_path) / '__init__.py')
    model_kwargs = options2model_kwargs(args)
    model_kwargs = filter_kwargs(module.OpticalFlow, model_kwargs)
    if args.model is None:
        return module.OpticalFlow(test_shape, **model_kwargs)
    return module.OpticalFlow(test_shape, model=args.model, **model_kwargs)


def load_events(path):
    with h5py.File(str(path), 'r') as data:
        events = np.array(data['davis']['left']['events'],
                          dtype=np.float64).T
        image_ts = np.array(data['davis']['left']['image_raw_ts'],
                            dtype=np.float64)
    return events, image_ts


def load_gt(path):
    gt = np.load(str(path))
    return {k: gt[k] for k in gt.keys()}


def get_preprocessing_functions(imshape, test_shape, crop_type):
    from dvs_of_training_framework_tpu.data.augmentation import (
        EventCrop, ImageCrop, central_shift)
    if crop_type == 'central':
        box = list(central_shift(imshape, test_shape)) + test_shape
        return EventCrop(box), ImageCrop(box)
    raise ValueError(f'Unknown crop type "{crop_type}"')


def postprocess_config(config, dataset):
    if config.start is None:
        config.start = dataset.first_ts
    else:
        config.start += dataset.first_ts
    if config.stop is None:
        config.stop = min(dataset.events[2][-1],
                          dataset.gt['timestamps'][-2])
    else:
        config.stop += dataset.first_ts
    return config


def generate_frames(cfg, image_ts):
    b, e = np.searchsorted(image_ts, [cfg.start, cfg.stop])
    return list(zip(image_ts[b: e - cfg.step], image_ts[b + cfg.step: e]))


def seq2paths(dataset_path, seq_name):
    seq_type = re.sub(r'\d+$', '', seq_name)
    seq_file = dataset_path / seq_type / (seq_name + '_data.hdf5')
    gt_file = dataset_path / 'FlowGT' / seq_type / \
        (seq_name + '_gt_flow_dist.npz')
    return seq_file, gt_file


def perform_single_test(args, cfg, dataset):
    from dvs_of_training_framework_tpu.evaluation import evaluate
    cfg = postprocess_config(cfg, dataset)
    dataset.is_car = cfg.is_car
    dataset.frames = generate_frames(cfg, dataset.image_ts)
    event_preproc_fun, gt_proc_fun = get_preprocessing_functions(
        dataset.imshape, cfg.test_shape, cfg.crop_type)
    of = init_model(args, cfg.test_shape)
    return evaluate(of,
                    dataset.events,
                    dataset.frames,
                    dataset.gt,
                    is_car=dataset.is_car,
                    event_preproc_fun=event_preproc_fun,
                    pred_postproc_fun=None,
                    gt_proc_fun=gt_proc_fun,
                    log=False)


def process_single(args):
    from dvs_of_training_framework_tpu.data.dataset import read_info
    from dvs_of_training_framework_tpu.evaluation import (ravel_config,
                                                          read_config)
    args = preprocess_args(args)
    if args.output.is_file():
        if args.is_temporary_model:
            args.model.unlink()
        return

    data_dir = (script_dir / '..' / 'data' / 'raw').resolve()
    info_dir = script_dir / 'data' / 'info'
    config = read_config(script_dir / 'config' / 'testing.yml')

    results = []
    for ds_name, ds_config in config.items():
        ds_dir = data_dir / ds_name
        info_file = info_dir / (ds_name + '.hdf5')
        ds_info = read_info(str(info_file))
        for seq_name, seq_config in ds_config.items():
            seq_file, gt_file = seq2paths(ds_dir, seq_name)

            dataset = SimpleNamespace(name=seq_name)
            dataset.events, dataset.image_ts = load_events(seq_file)
            dataset.gt = load_gt(gt_file)
            dataset.imshape = dataset.gt['x_flow_dist'].shape[1:]
            dataset.first_ts = ds_info[seq_name]

            for cfg in ravel_config(seq_config):
                cfg.dataset = ds_name
                cfg.sequence = seq_name
                cfg.mAEE, cfg.mpAEE = perform_single_test(args, cfg, dataset)
                results.append(cfg)
                print(f'[{cfg.sequence}, {cfg.start}, {cfg.stop}, '
                      f'{cfg.step}, {cfg.test_shape}, {cfg.crop_type}, '
                      f'{cfg.is_car}]: Mean AEE: {cfg.mAEE:.6f}, '
                      f'mean %AEE: {cfg.mpAEE * 100:.6f}')
    args.output.parent.mkdir(parents=True, exist_ok=True)
    with args.output.open('wb') as f:
        pickle.dump(results, f)
    if args.is_temporary_model:
        args.model.unlink()


def get_samples_passed(args):
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    serializer = Serializer(args.model)
    state = serializer.read_state_dict(args.step)
    return int(state.get('samples_passed',
                         int(state['global_step']) * args.bs))


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
    serializer = Serializer(args.model)
    all_args = [SimpleNamespace(step=s, **args.__dict__)
                for s in serializer.list_known_steps()]
    DevicePool(jax.local_devices(),
               args.tests_per_device)(process_single, all_args)
    writer = SummaryWriter(args.output / 'log')
    for step_args in all_args:
        samples_passed = get_samples_passed(step_args)
        with get_output_path(step_args).open('rb') as f:
            results = pickle.load(f)
        for result in results:
            tag = f'{result.dataset}/{result.sequence}/{result.step}/' \
                  f'{result.start}/{result.stop}'
            writer.add_scalar(f'Test/mean AEE/{tag}', result.mAEE,
                              samples_passed)
            writer.add_scalar(f'Test/mean %AEE/{tag}', result.mpAEE * 100,
                              samples_passed)
    writer.close()


def main():
    args = parse_args()
    if args.step is None:
        process_all(args)
    else:
        process_single(args)


if __name__ == '__main__':
    main()
