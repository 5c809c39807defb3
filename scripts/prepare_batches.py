#!/usr/bin/env python3
"""Offline batch pre-augmentation: run the augmenting train loader and
shard encoded batches to HDF5 files.

Resumable: counts samples already written and continues
(reference scripts/prepare_batches.py).
"""
from argparse import ArgumentParser
from pathlib import Path
import sys

import h5py
from tqdm import tqdm

script_path = Path(__file__).resolve().parent
sys.path.append(str(script_path.parent))

from dvs_of_training_framework_tpu.data import codec  # noqa: E402
from dvs_of_training_framework_tpu.data.dataloader import (  # noqa: E402
    choose_data_path, get_dataloader, get_trainset_params)
from dvs_of_training_framework_tpu.utils.common import (  # noqa: E402
    check_execution_info, collect_execution_info, write_execution_info)
from dvs_of_training_framework_tpu.utils.options import (  # noqa: E402
    add_common_arguments, add_dataloader_arguments, add_dataset_arguments,
    add_dataset_preprocessing_arguments, validate_dataset_args)


def parse_args(args, is_write=True):
    parser = ArgumentParser()
    parser = add_common_arguments(parser)
    parser = add_dataset_arguments(parser)
    parser = add_dataloader_arguments(parser)
    parser = add_dataset_preprocessing_arguments(parser)
    args = parser.parse_args(args)
    args = validate_dataset_args(args)

    args.output.mkdir(exist_ok=True, parents=True)
    args = choose_data_path(args)

    execution_info = collect_execution_info(args)
    check_execution_info(args.output, execution_info, args)
    if is_write:
        write_execution_info(args.output, execution_info)
    return args


def count_written(output):
    written_files = list(output.glob('*.hdf5'))
    num_written = 0
    for filename in written_files:
        with h5py.File(filename, 'r') as f:
            num_written += len(f['elements_per_sample'])
    return written_files, num_written


def main(args):
    loader = get_dataloader(get_trainset_params(args))
    args.output.mkdir(exist_ok=True)
    written_files, num_written = count_written(args.output)
    written_indices = [int(f.stem) for f in written_files]
    num_batches_per_write = (args.samples_per_file - 1) // args.mbs + 1
    encoded_batches = []
    j = 0
    initial = num_written // args.mbs
    total = (args.size - num_written) // args.mbs + initial
    for i, batch in tqdm(enumerate(loader), initial=initial, total=total):
        if num_written >= args.size:
            break
        encoded_batches.append(codec.encode_batch(**batch))
        num_written += len(encoded_batches[-1]['elements_per_sample'])
        is_last = num_written >= args.size
        if (i + 1) % num_batches_per_write == 0 or is_last:
            joined = codec.join_batches(encoded_batches)
            while j in written_indices:
                j += 1
            codec.write_encoded_batch(args.output / f'{j}.hdf5', joined)
            j += 1
            encoded_batches = []
        if is_last:
            break


if __name__ == '__main__':
    main(parse_args(sys.argv[1:]))
