#!/usr/bin/env python3
"""Host feed-rate matrix: can this host keep N chips busy?

Measures the three host-side stages that must outpace the device step
(PERFORMANCE.md round 3; reference benchmark matrix:
scripts/benchmarks/run_data_benchmark.sh):

  (a) raw loader (read + augment + collate), worker sweep,
  (b) preprocessed loader (encoded-shard streaming),
  (c) device-queue producer stage (pad + compact + window stack) on the
      bench workload (131k events/batch),

and prints batches/s per stage plus the implied chips-fed at the current
staged device step time.

Usage:
  python scripts/benchmarks/feed_rate.py \
      --raw-path experiments/synth/training/synth/outdoor_synth2 \
      --preprocessed experiments/shards [--iters 50]
"""
from argparse import ArgumentParser
import json
from pathlib import Path
import sys
import time

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))


def time_iter(it, iters, warmup=5):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(iters):
        next(it)
    return (time.perf_counter() - t0) / iters


def raw_rate(path, batch_size, iters, num_workers, shape=(256, 256),
             worker_mode='thread'):
    from dvs_of_training_framework_tpu.data.dataloader import HostDataLoader
    from dvs_of_training_framework_tpu.data.dataset import IterableDataset
    ds = IterableDataset(path=path, shape=list(shape), augmentation=True,
                         collapse_length=1, is_raw=True, shuffle=True,
                         max_seq_length=1)
    loader = HostDataLoader(ds, batch_size=batch_size,
                            num_workers=num_workers,
                            worker_mode=worker_mode)
    return time_iter(iter(loader), iters)


def preprocessed_rate(path, batch_size, iters):
    from dvs_of_training_framework_tpu.data.preprocessed import \
        PreprocessedDataloader
    loader = PreprocessedDataloader(path=path, batch_size=batch_size,
                                    is_raw=True)
    return time_iter(iter(loader), iters)


def sharded_preprocessed_rate(path, global_batch, iters, process_count):
    """Per-process cost of one GLOBAL batch under multi-host striding.

    Each of P processes reads only its ``global_batch / P`` slice; the
    round-3 lockstep design had every process decode the FULL global
    batch (= the plain ``preprocessed`` row) and slice.  One __next__
    here advances the stream one full global batch, so ms/batch compares
    directly with that row.
    """
    from dvs_of_training_framework_tpu.data.preprocessed import \
        PreprocessedDataloader
    loader = PreprocessedDataloader(path=path,
                                    batch_size=global_batch // process_count,
                                    is_raw=True, process_index=0,
                                    process_count=process_count)
    return time_iter(iter(loader), iters)


def producer_rate(iters, window=8):
    """pad + compact + stack of bench-shaped batches (no upload)."""
    import bench
    from dvs_of_training_framework_tpu.data.schema import compact_batch
    from dvs_of_training_framework_tpu.data.device_queue import \
        stack_batches
    rng = np.random.default_rng(0)
    batches = [bench.make_batch(rng, sample_offset=i)
               for i in range(window)]

    # bench batches are already padded device Batches; measure the
    # producer-side compact + stack (pad cost measured separately below)
    t0 = time.perf_counter()
    for _ in range(iters):
        stack_batches([compact_batch(b) for b in batches])
    stack_dt = (time.perf_counter() - t0) / (iters * window)

    # pad cost: raw dict -> padded EventBuffer at bench capacity
    from dvs_of_training_framework_tpu.data.schema import pad_events
    ev = {k: np.asarray(getattr(batches[0].events, k))[
        :int(batches[0].events.num_events)]
        for k in ('x', 'y', 'timestamp', 'polarity', 'element_index',
                  'sample_index')}
    t0 = time.perf_counter()
    for _ in range(iters * window):
        pad_events(ev, batches[0].size, bench.CAPACITY)
    pad_dt = (time.perf_counter() - t0) / (iters * window)
    return pad_dt, stack_dt


def main():
    parser = ArgumentParser()
    parser.add_argument('--raw-path', type=Path, default=None)
    parser.add_argument('--preprocessed', type=Path, default=None)
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--iters', type=int, default=50)
    parser.add_argument('--device-step-ms', type=float, default=27.6,
                        help='staged device step for the chips-fed column')
    args = parser.parse_args()

    rows = {}
    if args.raw_path:
        for workers in (0, 2, 4):
            dt = raw_rate(args.raw_path, args.batch_size, args.iters,
                          workers)
            rows[f'raw(workers={workers})'] = dt
        for workers in (2, 4):
            dt = raw_rate(args.raw_path, args.batch_size, args.iters,
                          workers, worker_mode='process')
            rows[f'raw(procs={workers})'] = dt
    if args.preprocessed:
        dt = preprocessed_rate(args.preprocessed, args.batch_size,
                               args.iters)
        rows['preprocessed'] = dt
        for procs in (2, 4):
            if args.batch_size % procs == 0:
                dt = sharded_preprocessed_rate(args.preprocessed,
                                               args.batch_size, args.iters,
                                               procs)
                rows[f'preprocessed(P={procs} strided)'] = dt
    pad_dt, stack_dt = producer_rate(args.iters)
    rows['producer pad'] = pad_dt
    rows['producer compact+stack'] = stack_dt

    print(f'{"stage":28s} {"ms/batch":>10s} {"batches/s":>10s} '
          f'{"chips fed":>10s}')
    dev = args.device_step_ms / 1e3
    for name, dt in rows.items():
        print(f'{name:28s} {dt * 1e3:10.2f} {1 / dt:10.1f} '
              f'{dt and (1 / dt) * dev:10.2f}')
    print(json.dumps({k: v * 1e3 for k, v in rows.items()}))


if __name__ == '__main__':
    main()
