#!/usr/bin/env python3
"""Bake a trained model's learned event representation into dense tensors.

Runs ``model.quantize(events, timestamps, sample_idx, imsize)`` (jitted, on
device) over the training stream and writes encoded quantized shards that
later train with ``--ev_images``.  Resumable by counting written samples.
(Reference: scripts/quantize_preprocessed.py.)
"""
from argparse import ArgumentParser
import os
from pathlib import Path
import sys

from tqdm import tqdm

script_path = Path(__file__).resolve().parent
sys.path.append(str(script_path.parent))

from dvs_of_training_framework_tpu.utils.options import (  # noqa: E402
    add_common_arguments, add_dataloader_arguments, add_dataset_arguments,
    add_dataset_preprocessing_arguments, add_model_arguments,
    add_preprocessed_dataset_arguments, add_tpu_arguments,
    validate_dataset_args, validate_quantization_args)


def parse_args(args, is_write=True):
    parser = ArgumentParser()
    parser = add_common_arguments(parser)
    parser = add_dataset_arguments(parser)
    parser = add_dataloader_arguments(parser)
    parser = add_model_arguments(parser)
    parser = add_tpu_arguments(parser)
    parser = add_dataset_preprocessing_arguments(parser)
    parser = add_preprocessed_dataset_arguments(parser)
    args = parser.parse_args(args)
    args = validate_dataset_args(args)
    args = validate_quantization_args(args)
    if args.device:
        os.environ.setdefault('JAX_PLATFORMS', args.device)

    from dvs_of_training_framework_tpu.data.dataloader import \
        choose_data_path
    from dvs_of_training_framework_tpu.utils.common import (
        check_execution_info, collect_execution_info, write_execution_info)

    args.output.mkdir(exist_ok=True, parents=True)
    args = choose_data_path(args)

    execution_info = collect_execution_info(args)
    check_execution_info(args.output, execution_info, args)
    if is_write:
        write_execution_info(args.output, execution_info)
    return args


def main(args):
    import jax
    import numpy as np
    from dvs_of_training_framework_tpu.data import codec
    from dvs_of_training_framework_tpu.data.dataloader import (
        get_dataloader, get_trainset_params)
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    from dvs_of_training_framework_tpu.models import init_model
    from scripts.prepare_batches import count_written

    model, params = init_model(args, jax.random.PRNGKey(0))

    @jax.jit
    def quantize(params, batch):
        imsize = tuple(batch.images.shape[-2:])
        return model.apply({'params': params}, batch.events,
                           batch.timestamps, batch.sample_idx, imsize,
                           method=model.quantize)

    args.output.mkdir(exist_ok=True)
    written_files, num_written = count_written(args.output)
    written_indices = [int(f.stem) for f in written_files]
    loader = get_dataloader(get_trainset_params(args),
                            sample_idx=num_written)
    num_batches_per_write = (args.samples_per_file - 1) // args.mbs + 1
    encoded_batches = []
    j = 0
    initial = num_written // args.mbs
    total = (args.size - num_written) // args.mbs + initial
    for i, batch in tqdm(enumerate(loader), initial=initial, total=total):
        if num_written >= args.size:
            break
        if batch['events']['x'].size > args.event_capacity:
            continue
        device_batch = pad_batch(batch, capacity=args.event_capacity)
        data = np.asarray(quantize(params, device_batch))
        quantized = {'data': data,
                     'timestamps': batch['timestamps'],
                     'sample_idx': batch['sample_idx'],
                     'images': batch['images'],
                     'augmentation_params': batch['augmentation_params'],
                     'size': batch['size']}
        encoded_batches.append(codec.encode_quantized_batch(quantized))
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
