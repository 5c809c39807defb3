#!/usr/bin/env python3
"""Qualitative inspection CLI: renders per-batch panels to PNG + YAML.

TPU counterpart of the reference visualize.py: for each validation batch,
draws loss text + the input frames + HSV renderings of the multi-scale flow
predictions, writing PNGs and YAML statistics via a writer process pool.
The panel layout matches the reference (finest scale on top, coarser scales
in a strip below, one column per prediction, offset by the prefix length);
the implementation is independent.
"""
import os
import sys
from argparse import ArgumentParser
from multiprocessing import Pool, Queue, cpu_count
from pathlib import Path

import numpy as np
import yaml

from dvs_of_training_framework_tpu.utils.common import mean
from dvs_of_training_framework_tpu.utils.options import (
    add_train_arguments, validate_train_args)


def parse_args(argv):
    args = add_train_arguments(ArgumentParser()).parse_args(argv)
    args = validate_train_args(args)
    if args.device:
        os.environ.setdefault('JAX_PLATFORMS', args.device)
    from dvs_of_training_framework_tpu.data.dataloader import \
        choose_data_path
    return choose_data_path(args)


# --- statistics & caption -----------------------------------------------------

def count_context_events(args, batch):
    """(prefix, main, suffix) event counts of the batch."""
    element = batch['events']['element_index']
    seq_length = int(batch['augmentation_params']['sequence_length'][0])
    n_prefix = int((element < args.prefix_length).sum())
    n_suffix = int((element >= seq_length - args.suffix_length).sum())
    return n_prefix, element.size - n_prefix - n_suffix, n_suffix


def _share(n, total):
    return f'{n} ({n * 100 / total:.2f}%)'


def prepare_text(args, batch, loss, parts, weights):
    """Panel caption + YAML statistics for one batch.

    ``parts`` are the per-scale (smoothness, photometric, border) loss terms.
    """
    parts = [list(map(float, term)) for term in parts]
    n_prefix, n_main, n_suffix = count_context_events(args, batch)
    statistics = {'loss': float(loss),
                  'smoothness': parts[0],
                  'photometric': parts[1],
                  'border': parts[2],
                  'prefix_size': n_prefix,
                  'pred_size': n_main,
                  'suffix_size': n_suffix}

    weighted = ' + '.join(f'{w}*{mean(term):.4f}'
                          for term, w in zip(parts, weights))
    per_scale = '\n'.join(
        f'{name}: {mean(term):.4f} = '
        f'[{", ".join(f"{x:.4f}" for x in term)}]'
        for name, term in zip(('smoothness', 'photometric', 'border'),
                              parts))
    total = max(n_prefix + n_main + n_suffix, 1)
    caption = (f'loss: {float(loss):.4f} = {weighted}\n'
               f'{per_scale}\n'
               f'{total} events: {_share(n_prefix, total)} prefix '
               f'+ {_share(n_main, total)} main + '
               f'{_share(n_suffix, total)}')
    return caption, statistics


# --- panel assembly -----------------------------------------------------------

def _blit(canvas, tile, x, y):
    h, w = tile.shape[:2]
    canvas[y:y + h, x:x + w] = tile


def join_images(images):
    """Input frames side by side as one RGB strip."""
    images = np.asarray(images).astype(np.uint8)
    assert images.ndim == 4
    strip = np.hstack(np.transpose(images, (0, 2, 3, 1)))
    if strip.shape[-1] == 1:
        strip = np.tile(strip, (1, 1, 3))
    return strip


def visualize_prediction(prediction, vis_flow):
    """One prediction as a panel: finest scale on top, the coarser scales
    left-aligned in a strip below it."""
    rendered = [vis_flow(np.transpose(np.asarray(flow), (1, 2, 0)))
                for flow in prediction]
    finest, coarser = rendered[-1], rendered[-2::-1]
    strip_h = coarser[0].shape[0] if coarser else 0
    canvas = np.zeros((finest.shape[0] + strip_h, finest.shape[1],
                       finest.shape[2]), dtype=np.uint8)
    _blit(canvas, finest, 0, 0)
    x = 0
    for tile in coarser:
        _blit(canvas, tile, x, finest.shape[0])
        x += tile.shape[1]
    return canvas


def visualize_predictions(args, batch, predictions, vis_flow):
    """All predictions side by side, offset by the prefix context."""
    flows_per_scale = predictions['prediction']
    n_predictions = flows_per_scale[-1].shape[0]
    panels = [visualize_prediction([scale[i] for scale in flows_per_scale],
                                   vis_flow)
              for i in range(n_predictions)]
    row = np.concatenate(panels, axis=1)
    panel_h, panel_w = panels[0].shape[:2]
    seq_length = int(batch['augmentation_params']['sequence_length'][0])
    canvas = np.zeros((panel_h, panel_w * (seq_length + 1), 3),
                      dtype=np.uint8)
    _blit(canvas, row, args.prefix_length * panel_w + panel_w // 2, 0)
    return canvas


def visualize(args, batch, loss, parts, weights, prediction, vis_flow):
    """Full panel: caption banner, input frames, flow renderings."""
    from PIL import Image, ImageDraw
    frames = join_images(batch['images'])
    caption, statistics = prepare_text(args, batch, loss, parts, weights)
    banner = Image.fromarray(np.zeros((80, frames.shape[1], 3), np.uint8))
    ImageDraw.Draw(banner).text((0, 0), caption, (255, 255, 255))
    flow_row = visualize_predictions(args, batch, prediction, vis_flow)
    panel = np.concatenate([np.asarray(banner), frames, flow_row], axis=0)
    return panel, statistics


# --- output -------------------------------------------------------------------

def files(stem):
    """(png, yml) output paths for a panel stem."""
    return stem.parent / f'{stem.name}.png', stem.parent / f'{stem.name}.yml'


def choose_output_path(args):
    leaf = 'step_0' if args.sp is None else Path(args.sp).stem
    out = (Path(__file__).resolve().parent / 'visualization'
           / args.model.name / leaf)
    out.mkdir(parents=True, exist_ok=True)
    return out


def image_writer(image_queue):
    """Writer-process loop: drain panels until the None sentinel."""
    from PIL import Image
    for stem, panel, statistics in iter(image_queue.get, None):
        png, yml = files(stem)
        if not png.is_file():
            Image.fromarray(panel[..., ::-1]).save(png)  # BGR -> RGB
        if not yml.is_file():
            yml.write_text(yaml.dump(statistics))


class PanelWriterPool:
    """Process pool draining a panel queue (PNG encode off the main loop)."""

    def __init__(self, num_writers=None):
        self.num_writers = num_writers or cpu_count()
        self.queue = Queue()
        self._pool = Pool(self.num_writers, image_writer, (self.queue,))

    def submit(self, stem, panel, statistics):
        self.queue.put((stem, panel, statistics))

    def close(self):
        for _ in range(self.num_writers):
            self.queue.put(None)
        self._pool.close()
        self._pool.join()


def main():
    writers = PanelWriterPool()
    args = parse_args(sys.argv[1:])
    args.mbs = 1

    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax
    import tqdm
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
    for i, batch in tqdm.tqdm(enumerate(loader), total=total):
        stem = output_dir / f'{i:04d}'
        if all(path.is_file() for path in files(stem)):
            continue
        if batch['events']['x'].size > args.event_capacity:
            continue
        device_batch = pad_batch(batch, capacity=args.event_capacity)
        loss, terms, flows, flow_ts, flow_sample_idx = forward(params,
                                                               device_batch)
        prediction = {'prediction': [np.asarray(f) for f in flows],
                      'flow_ts': np.asarray(flow_ts),
                      'flow_sample_idx': np.asarray(flow_sample_idx)}
        panel, statistics = visualize(
            args, batch, loss, [list(map(float, t)) for t in terms],
            args.loss_weights, prediction, vis_module.vis_flow)
        writers.submit(stem, panel, statistics)
    writers.close()


if __name__ == '__main__':
    main()
