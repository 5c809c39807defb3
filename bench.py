#!/usr/bin/env python3
"""Headline benchmark: flagship training-step throughput on TPU.

Measures full training steps (event voxelization -> UNet forward ->
multi-scale self-supervised loss -> backward -> Ranger update) of the
EVFlowNet flagship on MVSEC-shaped synthetic data (256x256, batch 8,
131k events/batch, 9-channel representation) on one chip, and prints ONE
JSON line::

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the same workload implemented in torch on
the CPU build that ships here (the reference framework's own architecture;
it publishes no numbers of its own — see BASELINE.md), cached in
scripts/benchmarks/bench_baseline_cpu.json.
"""
import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import os

BATCH_SIZE = int(os.environ.get('BENCH_BATCH', 8))
N_EVENTS = int(os.environ.get('BENCH_EVENTS', 2 ** 17))
CAPACITY = N_EVENTS
DEPTH = int(os.environ.get('BENCH_DEPTH', 9))
BASE = int(os.environ.get('BENCH_BASE', 64))
IMSIZE = (256, 256)
WARMUP = int(os.environ.get('BENCH_WARMUP', 3))
ITERS = int(os.environ.get('BENCH_ITERS', 20))
DTYPE = os.environ.get('BENCH_DTYPE', 'float32')
SCATTER = os.environ.get('BENCH_SCATTER', 'auto')


def make_batch(rng):
    from dvs_of_training_framework_tpu.data.schema import Batch, pad_events
    H, W = IMSIZE
    ev = {
        'x': rng.integers(0, W, N_EVENTS),
        'y': rng.integers(0, H, N_EVENTS),
        'timestamp': rng.uniform(0, 0.04, N_EVENTS).astype(np.float32),
        'polarity': rng.choice([-1.0, 1.0], N_EVENTS),
        'element_index': np.zeros(N_EVENTS, np.int64),
        'sample_index': np.sort(rng.integers(0, BATCH_SIZE, N_EVENTS)),
    }
    events = pad_events(ev, BATCH_SIZE, CAPACITY)
    return Batch(
        events=events,
        data=None,
        timestamps=np.tile(np.array([0.0, 0.04], np.float32), BATCH_SIZE),
        sample_idx=np.repeat(np.arange(BATCH_SIZE), 2).astype(np.int32),
        images=rng.uniform(0, 255, (2 * BATCH_SIZE, 1, H, W))
        .astype(np.float32),
        size=BATCH_SIZE)


def measure_tpu():
    import jax
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=DEPTH,
                         base_channels=BASE, dtype=DTYPE,
                         scatter_method=SCATTER)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch.events,
                        batch.timestamps, batch.sample_idx,
                        IMSIZE)['params']
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=1000000, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in IMSIZE) for i in range(4)][::-1])
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)

    # pre-stage the batch on device: in real training the prefetcher
    # (data/prefetch.py) overlaps H2D transfers with compute
    batch = jax.device_put(batch)

    for _ in range(WARMUP):
        state, (loss, _) = train_step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, (loss, _) = train_step(state, batch)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(float(loss)), 'training step diverged'
    return {'batches_per_sec': 1.0 / dt,
            'samples_per_sec': BATCH_SIZE / dt,
            'events_per_sec': N_EVENTS / dt,
            'step_time_sec': dt}


def main():
    result = measure_tpu()
    try:
        from scripts.benchmarks.torch_cpu_baseline import \
            get_cached_baseline
        baseline = get_cached_baseline(
            batch_size=BATCH_SIZE, n_events=N_EVENTS, depth=DEPTH,
            base=BASE, imsize=IMSIZE)
        vs_baseline = result['batches_per_sec'] / baseline['batches_per_sec']
    except Exception as exc:  # baseline is best-effort
        print(f'# baseline measurement failed: {exc}', file=sys.stderr)
        vs_baseline = None
    print(json.dumps({
        'metric': 'event-batches/sec/chip (full train step, bs=8, '
                  '131k events, 256x256, EVFlowNet-64)',
        'value': round(result['batches_per_sec'], 3),
        'unit': 'batches/s',
        'vs_baseline': (round(vs_baseline, 2)
                        if vs_baseline is not None else None),
        'detail': {k: round(v, 4) for k, v in result.items()},
    }))


if __name__ == '__main__':
    main()
