#!/usr/bin/env python3
"""Bake a trained model's learned event representation into dense tensors.

Runs ``model.quantize(events, timestamps, sample_idx, imsize)`` (jitted, on
device) over the training stream and writes encoded quantized shards that
later train with ``--ev_images``.  Resumable through the ShardWriter sample
count, which also seeks the data stream.  (Behavioural parity with the
reference scripts/quantize_preprocessed.py; independent structure.)
"""
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

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
    for extend in (add_common_arguments, add_dataset_arguments,
                   add_dataloader_arguments, add_model_arguments,
                   add_tpu_arguments, add_dataset_preprocessing_arguments,
                   add_preprocessed_dataset_arguments):
        parser = extend(parser)
    args = validate_quantization_args(
        validate_dataset_args(parser.parse_args(args)))
    if args.device:
        os.environ.setdefault('JAX_PLATFORMS', args.device)

    from dvs_of_training_framework_tpu.data.dataloader import \
        choose_data_path
    from dvs_of_training_framework_tpu.utils.common import (
        check_execution_info, collect_execution_info, write_execution_info)
    from dvs_of_training_framework_tpu.utils.options import \
        resolve_event_capacity

    args.output.mkdir(exist_ok=True, parents=True)
    args = choose_data_path(args)
    # resolve --event-capacity auto before provenance is collected so the
    # recorded (and resume-checked) value is the concrete buffer size
    resolve_event_capacity(args)

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
    from dvs_of_training_framework_tpu.data.sharding import ShardWriter
    from dvs_of_training_framework_tpu.models import init_model

    model, params = init_model(args, jax.random.PRNGKey(0))

    @jax.jit
    def quantize(params, batch):
        imsize = tuple(batch.images.shape[-2:])
        return model.apply({'params': params}, batch.events,
                           batch.timestamps, batch.sample_idx, imsize,
                           method=model.quantize)

    args.output.mkdir(exist_ok=True)
    writer = ShardWriter(args.output, args.samples_per_file)
    loader = get_dataloader(get_trainset_params(args),
                            sample_idx=writer.samples_written)

    progress = tqdm(initial=writer.samples_written, total=args.size,
                    unit='sample')
    for batch in loader:
        if writer.samples_written >= args.size:
            break
        if batch['events']['x'].size > args.event_capacity:
            continue  # oversized batches cannot be staged on device
        device_batch = pad_batch(batch, capacity=args.event_capacity)
        dense = np.asarray(quantize(params, device_batch))
        before = writer.samples_written
        writer.add(codec.encode_quantized_batch(
            {'data': dense,
             'timestamps': batch['timestamps'],
             'sample_idx': batch['sample_idx'],
             'images': batch['images'],
             'augmentation_params': batch['augmentation_params'],
             'size': batch['size']}))
        progress.update(writer.samples_written - before)
    writer.flush()
    progress.close()


if __name__ == '__main__':
    main(parse_args(sys.argv[1:]))
