#!/usr/bin/env python3
"""Measure dataloader iteration latency (µs/iteration).

Reference: scripts/profile_dataset.py + utils/performance.py.
"""
from argparse import ArgumentParser
from pathlib import Path
import sys

script_path = Path(__file__).resolve().parent
sys.path.append(str(script_path.parent))

from dvs_of_training_framework_tpu.data.dataloader import (  # noqa: E402
    choose_data_path, get_dataloader, get_trainset_params)
from dvs_of_training_framework_tpu.utils.options import (  # noqa: E402
    add_dataloader_arguments, add_dataset_arguments,
    add_preprocessed_dataset_arguments, validate_dataset_args)
from dvs_of_training_framework_tpu.utils.performance import (  # noqa: E402
    get_iterable_performance)


def parse_args(args):
    parser = ArgumentParser()
    parser = add_dataset_arguments(parser)
    parser = add_dataloader_arguments(parser)
    parser = add_preprocessed_dataset_arguments(parser)
    parser.add_argument('--start', type=int, default=100,
                        help='warmup iterations')
    parser.add_argument('--num-iters', type=int, default=500,
                        help='measured iterations')
    args = parser.parse_args(args)
    args = validate_dataset_args(args)
    args = choose_data_path(args)
    return args


def main(args):
    loader = get_dataloader(get_trainset_params(args))
    perf = get_iterable_performance(loader, start=args.start,
                                    num_iters=args.num_iters)
    print(f'{perf:.1f} us/iteration')


if __name__ == '__main__':
    main(parse_args(sys.argv[1:]))
