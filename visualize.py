#!/usr/bin/env python3
"""Qualitative inspection CLI: renders per-batch panels to PNG + YAML.

TPU counterpart of the reference visualize.py: for each validation batch,
draws loss text + the input frames + HSV renderings of the multi-scale flow
predictions, writing PNGs and YAML statistics via a writer process pool.
"""
from argparse import ArgumentParser
from multiprocessing import Pool, Queue, cpu_count
import os
from pathlib import Path
import sys

import numpy as np
import yaml

from dvs_of_training_framework_tpu.utils.options import (
    add_train_arguments, validate_train_args)
from dvs_of_training_framework_tpu.utils.common import mean


def parse_args(argv):
    args = add_train_arguments(ArgumentParser()).parse_args(argv)
    args = validate_train_args(args)
    if args.device:
        os.environ.setdefault('JAX_PLATFORMS', args.device)
    from dvs_of_training_framework_tpu.data.dataloader import \
        choose_data_path
    args = choose_data_path(args)
    return args


def array2text(data, title):
    data = list(data)
    text = ', '.join([f'{x:.4f}' for x in data])
    return f'{title}: {mean(data):.4f} = [{text}]'


def join_images(images):
    images = np.asarray(images).astype(np.uint8)
    assert images.ndim == 4
    images = np.transpose(images, axes=(0, 2, 3, 1))
    images = np.hstack(images)
    if images.shape[-1] == 1:
        images = np.tile(images, (1, 1, 3))
    return images


def event_statistics(args, batch):
    element_index = batch['events']['element_index']
    num_prefix_events = int((element_index < args.prefix_length).sum())
    sequence_length = int(batch['augmentation_params']['sequence_length'][0])
    first_suffix_idx = sequence_length - args.suffix_length
    num_suffix_events = int((element_index >= first_suffix_idx).sum())
    num_events = element_index.size
    num_pred = num_events - num_prefix_events - num_suffix_events
    return num_prefix_events, num_pred, num_suffix_events


def get_events_text(args, batch, statistics):
    num_prefix_events, num_prediction_events, num_suffix_events = statistics
    num_events = max(batch['events']['element_index'].size, 1)
    return (f'{num_events} events: '
            f'{num_prefix_events} '
            f'({num_prefix_events * 100 / num_events:.2f}%) prefix '
            f'+ {num_prediction_events} '
            f'({num_prediction_events * 100 / num_events:.2f}%) main + '
            f'{num_suffix_events} '
            f'({num_suffix_events * 100 / num_events:.2f}%)')


def items2floats(array):
    return [float(x) for x in array]


def prepare_text(args, batch, loss, parts, weights):
    parts = list(map(list, parts))
    loss_text = ' + '.join([f'{y}*{x:.4f}'
                            for x, y in zip(map(mean, parts), weights)])
    ev_stats = event_statistics(args, batch)
    statistics = {'loss': float(loss),
                  'smoothness': items2floats(parts[0]),
                  'photometric': items2floats(parts[1]),
                  'border': items2floats(parts[2]),
                  'prefix_size': int(ev_stats[0]),
                  'pred_size': int(ev_stats[1]),
                  'suffix_size': int(ev_stats[2])}
    text = (f'loss: {float(loss):.4f} = {loss_text}\n'
            + '\n'.join(map(array2text, parts,
                            ['smoothness', 'photometric', 'border']))
            + '\n' + get_events_text(args, batch, ev_stats))
    return text, statistics


def put_image(dst, src, x0, y0):
    H, W = src.shape[:2]
    dst[y0: y0 + H, x0: x0 + W] = src


def visualize_prediction(prediction, vis_flow):
    flows = tuple(np.transpose(np.asarray(x), (1, 2, 0))
                  for x in prediction)
    images = tuple(map(vis_flow, flows))
    H, W = images[-1].shape[:2]
    if len(images) > 1:
        H += images[-2].shape[0]
    D = images[-1].shape[2]
    res = np.zeros((H, W, D), dtype=np.uint8)
    put_image(res, images[-1], 0, 0)
    x0 = 0
    y0 = images[-1].shape[0]
    for img in images[-2::-1]:
        put_image(res, img, x0, y0)
        x0 += img.shape[1]
    return res


def visualize_predictions(args, batch, predictions, vis_flow):
    num_predictions = predictions['prediction'][-1].shape[0]
    per_sample = [[x[i] for x in predictions['prediction']]
                  for i in range(num_predictions)]
    images = tuple(visualize_prediction(p, vis_flow) for p in per_sample)
    image = np.concatenate(images, axis=1)
    image_h, image_w = images[0].shape[:2]
    sequence_length = int(batch['augmentation_params']['sequence_length'][0])
    res = np.zeros((image_h, image_w * (sequence_length + 1), 3),
                   dtype=np.uint8)
    x_shift = args.prefix_length * image_w + image_w // 2
    put_image(res, image, x_shift, 0)
    return res


def visualize(args, batch, loss, parts, weights, prediction, vis_flow):
    joined_images = join_images(batch['images'])
    res = np.zeros([80, joined_images.shape[1], 3], dtype=np.uint8)
    text, statistics = prepare_text(args, batch, loss, parts, weights)
    from PIL import Image, ImageDraw
    image = Image.fromarray(res)
    ImageDraw.Draw(image).text((0, 0), text, (255, 255, 255))
    image = np.asarray(image)
    flow_image = visualize_predictions(args, batch, prediction, vis_flow)
    image = np.concatenate([image, joined_images, flow_image], axis=0)
    return image, statistics


def choose_output_path(args):
    path = Path(__file__).resolve().parent
    model_name = args.model.name
    path = path / 'visualization' / model_name
    if args.sp is None:
        path = path / 'step_0'
    else:
        path = path / Path(args.sp).stem
    path.mkdir(parents=True, exist_ok=True)
    return path


def image_writer(image_queue):
    from PIL import Image
    while True:
        data = image_queue.get()
        if data is None:
            break
        path, image, statistics = data
        image_file, yaml_file = files(path)
        if not image_file.is_file():
            Image.fromarray(image[..., ::-1]).save(image_file)  # BGR -> RGB
        if not yaml_file.is_file():
            with yaml_file.open('w') as f:
                yaml.dump(statistics, f)


def files(filename):
    dirname = filename.parent
    name = filename.name
    return dirname / (name + '.png'), dirname / (name + '.yml')


def main():
    image_queue = Queue()
    num_writers = cpu_count()
    worker = Pool(num_writers, image_writer, (image_queue,))
    args = parse_args(sys.argv[1:])
    args.mbs = 1

    import jax
    from dvs_of_training_framework_tpu.data.dataloader import (
        get_dataloader, get_valset_params)
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    from dvs_of_training_framework_tpu.losses import (combined_loss,
                                                      init_losses)
    from dvs_of_training_framework_tpu.models import init_model
    from dvs_of_training_framework_tpu.models.loader import import_module

    output_dir = choose_output_path(args)
    model, params = init_model(args, jax.random.PRNGKey(0))
    vis_module = import_module(f'{args.flownet_path.name}.test',
                               Path(args.flownet_path) / 'test.py')
    loader = get_dataloader(get_valset_params(args))
    evaluator = init_losses(
        args.shape, 1,
        lambda p, e, t, s, i: model.apply({'params': p}, e, t, s, i),
        params,
        sequence_length=args.prefix_length + args.suffix_length + 1)

    @jax.jit
    def forward(params, batch):
        imsize = tuple(batch.images.shape[-2:])
        flows, flow_ts, flow_sample_idx, features = model.apply(
            {'params': params}, batch.events, batch.timestamps,
            batch.sample_idx, imsize, intermediate=True)
        loss, terms = combined_loss(evaluator, flows, flow_ts,
                                    flow_sample_idx, batch.images,
                                    batch.timestamps, batch.sample_idx,
                                    weights=tuple(args.loss_weights))
        return loss, terms, flows, flow_ts, flow_sample_idx

    try:
        total = len(loader)
    except TypeError:
        total = None
    import tqdm
    for i, batch in tqdm.tqdm(enumerate(loader), total=total):
        output_file_path = output_dir / f'{i:04d}'
        if all(x.is_file() for x in files(output_file_path)):
            continue
        if batch['events']['x'].size > args.event_capacity:
            continue
        device_batch = pad_batch(batch, capacity=args.event_capacity)
        loss, terms, flows, flow_ts, flow_sample_idx = forward(params,
                                                               device_batch)
        prediction = {'prediction': [np.asarray(f) for f in flows],
                      'flow_ts': np.asarray(flow_ts),
                      'flow_sample_idx': np.asarray(flow_sample_idx)}
        visualization, stat = visualize(args, batch, loss,
                                        [list(map(float, t))
                                         for t in terms],
                                        args.loss_weights, prediction,
                                        vis_module.vis_flow)
        image_queue.put((output_file_path, visualization, stat))
    for _ in range(num_writers):
        image_queue.put(None)
    worker.close()
    worker.join()


if __name__ == '__main__':
    main()
