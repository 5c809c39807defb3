#!/usr/bin/env python3
"""Measure eval-harness parallelism: GT-flow propagation scaling.

``perform_single_test`` is dominated by host-side NumPy GT propagation
(evaluation/flow_metrics.py estimate_corresponding_gt_flow), which chains
small ufunc calls and therefore holds the GIL most of the time.  This
benchmark answers: do DevicePool *threads* actually scale it, or does it
need *processes* (the reference used a multiprocessing.Pool,
reference test.py:191-245)?

Run: python scripts/benchmarks/profile_eval_pool.py
"""
import multiprocessing
import sys
import time
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from dvs_of_training_framework_tpu.evaluation.flow_metrics import (  # noqa
    estimate_corresponding_gt_flow, flow_error_dense)

H, W = 260, 346           # MVSEC DAVIS resolution
N_GT = 64                 # stored GT flow frames
GT_DT = 0.05              # seconds per GT interval
WINDOW = 0.35             # evaluation window (spans ~7 GT intervals)
JOBS = 48                 # windows to propagate per measurement

_GT = None


def make_gt(seed=0):
    rng = np.random.default_rng(seed)
    return {
        'timestamps': np.arange(N_GT + 1) * GT_DT,
        'x_flow_dist': rng.normal(size=(N_GT, H, W)).astype(np.float32) + 1,
        'y_flow_dist': rng.normal(size=(N_GT, H, W)).astype(np.float32) + 1,
    }


def one_window(start):
    gt = _GT
    u, v = estimate_corresponding_gt_flow(
        gt['x_flow_dist'], gt['y_flow_dist'], gt['timestamps'],
        start, start + WINDOW)
    gt_flow = np.dstack((u, v))
    pred = np.zeros_like(gt_flow)
    counts = np.ones((H, W), np.int32)
    return flow_error_dense(gt_flow, pred, counts)[0]


def _init_worker():
    global _GT
    _GT = make_gt()


def run_pool(pool_cls, workers, label):
    starts = np.linspace(0.01, (N_GT - 8) * GT_DT, JOBS)
    kwargs = {}
    if pool_cls is ProcessPoolExecutor:
        kwargs = dict(mp_context=multiprocessing.get_context('fork'),
                      initializer=_init_worker)
    with pool_cls(workers, **kwargs) as pool:
        list(pool.map(one_window, starts[:4]))  # warmup / worker spawn
        t0 = time.perf_counter()
        list(pool.map(one_window, starts))
        dt = time.perf_counter() - t0
    rate = JOBS / dt
    print(f'{label:>12} x{workers}: {dt * 1e3 / JOBS:7.2f} ms/window '
          f'({rate:6.1f} windows/s)')
    return dt


def main():
    global _GT
    _GT = make_gt()
    base = run_pool(ThreadPoolExecutor, 1, 'threads')
    for n in (2, 4, 8):
        dt = run_pool(ThreadPoolExecutor, n, 'threads')
        print(f'             thread speedup x{n}: {base / dt:.2f}')
    for n in (2, 4, 8):
        dt = run_pool(ProcessPoolExecutor, n, 'processes')
        print(f'            process speedup x{n}: {base / dt:.2f}')


if __name__ == '__main__':
    main()
