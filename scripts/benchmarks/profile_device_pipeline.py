#!/usr/bin/env python3
"""Measure the host->device batch pipeline in isolation.

Times (a) raw collation, (b) padding to the device schema, (c) H2D
transfer, and (d) the prefetched pipeline end-to-end — the stages that must
outpace the TPU training step to keep the chip fed.
"""
from argparse import ArgumentParser
from pathlib import Path
import sys
import time

import numpy as np

script_path = Path(__file__).resolve().parent
sys.path.append(str(script_path.parent.parent))

from dvs_of_training_framework_tpu.data.schema import pad_batch  # noqa: E402
from dvs_of_training_framework_tpu.data.prefetch import \
    prefetch_to_device  # noqa: E402


def synthetic_batches(n, batch_size=8, n_events=2 ** 17, imsize=(256, 256)):
    rng = np.random.default_rng(0)
    H, W = imsize
    for _ in range(n):
        yield {
            'events': {
                'x': rng.integers(0, W, n_events),
                'y': rng.integers(0, H, n_events),
                'timestamp': rng.uniform(0, 0.04, n_events)
                .astype(np.float32),
                'polarity': rng.choice([-1.0, 1.0], n_events),
                'element_index': np.zeros(n_events, np.int64),
                'sample_index': np.sort(
                    rng.integers(0, batch_size, n_events)),
            },
            'timestamps': np.tile(np.array([0, 0.04], np.float32),
                                  batch_size),
            'sample_idx': np.repeat(np.arange(batch_size), 2),
            'images': rng.uniform(0, 255, (2 * batch_size, 1, H, W))
            .astype(np.float32),
            'augmentation_params': None,
            'size': batch_size,
        }


def main():
    parser = ArgumentParser()
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--capacity', type=int, default=2 ** 17)
    args = parser.parse_args()

    import jax

    batches = list(synthetic_batches(args.iters))

    t0 = time.perf_counter()
    padded = [pad_batch(b, capacity=args.capacity) for b in batches]
    pad_ms = (time.perf_counter() - t0) / args.iters * 1000

    t0 = time.perf_counter()
    for p in padded:
        jax.block_until_ready(jax.device_put(p))
    h2d_ms = (time.perf_counter() - t0) / args.iters * 1000

    def prepare(b):
        return pad_batch(b, capacity=args.capacity)

    t0 = time.perf_counter()
    n = 0
    for host, dev in prefetch_to_device(iter(batches), prepare, depth=2):
        jax.block_until_ready(dev)
        n += 1
    prefetch_ms = (time.perf_counter() - t0) / n * 1000

    print(f'pad_batch:          {pad_ms:8.2f} ms/batch')
    print(f'device_put:         {h2d_ms:8.2f} ms/batch')
    print(f'prefetch pipeline:  {prefetch_ms:8.2f} ms/batch (overlapped)')


if __name__ == '__main__':
    main()
