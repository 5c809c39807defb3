#!/usr/bin/env python3
"""Offline batch pre-augmentation: run the augmenting train loader and
shard encoded batches to HDF5 files.

Resumable: the ShardWriter counts samples already on disk and the run
continues until ``--size`` samples exist.  (Behavioural parity with the
reference scripts/prepare_batches.py; independent structure.)
"""
import sys
from argparse import ArgumentParser
from pathlib import Path

from tqdm import tqdm

script_path = Path(__file__).resolve().parent
sys.path.append(str(script_path.parent))

from dvs_of_training_framework_tpu.data import codec  # noqa: E402
from dvs_of_training_framework_tpu.data.dataloader import (  # noqa: E402
    choose_data_path, get_dataloader, get_trainset_params)
from dvs_of_training_framework_tpu.data.sharding import ShardWriter  # noqa: E402
from dvs_of_training_framework_tpu.utils.common import (  # noqa: E402
    check_execution_info, collect_execution_info, write_execution_info)
from dvs_of_training_framework_tpu.utils.options import (  # noqa: E402
    add_common_arguments, add_dataloader_arguments, add_dataset_arguments,
    add_dataset_preprocessing_arguments, validate_dataset_args)


def parse_args(args, is_write=True):
    parser = ArgumentParser()
    for extend in (add_common_arguments, add_dataset_arguments,
                   add_dataloader_arguments,
                   add_dataset_preprocessing_arguments):
        parser = extend(parser)
    args = validate_dataset_args(parser.parse_args(args))

    args.output.mkdir(exist_ok=True, parents=True)
    args = choose_data_path(args)

    execution_info = collect_execution_info(args)
    check_execution_info(args.output, execution_info, args)
    if is_write:
        write_execution_info(args.output, execution_info)
    return args


def main(args):
    args.output.mkdir(exist_ok=True)
    writer = ShardWriter(args.output, args.samples_per_file)
    loader = get_dataloader(get_trainset_params(args))

    progress = tqdm(initial=writer.samples_written, total=args.size,
                    unit='sample')
    for batch in loader:
        if writer.samples_written >= args.size:
            break
        before = writer.samples_written
        writer.add(codec.encode_batch(**batch))
        progress.update(writer.samples_written - before)
    writer.flush()
    progress.close()


if __name__ == '__main__':
    main(parse_args(sys.argv[1:]))
