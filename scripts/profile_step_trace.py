#!/usr/bin/env python3
"""Profile the staged training step and summarise the device timeline.

Runs the headline bench's staged train_step under ``jax.profiler.trace``
and parses the emitted chrome-trace to report, per step: total device busy
time, kernel count, and the top kernels by accumulated duration — the
evidence base for the kernel-fusion work (PERFORMANCE.md round 3).

Usage: python scripts/profile_step_trace.py [--iters 5] [--out DIR]
"""
from argparse import ArgumentParser
from collections import defaultdict
import glob
import gzip
import json
import os
from pathlib import Path
import re
import sys
import tempfile
import time

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_step():
    import bench
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache

    enable_compilation_cache()
    # BENCH_MODE selects the profiled configuration (golden fp32 default;
    # BENCH_MODE=recipe profiles the production bf16 recipe).
    mode = os.environ.get('BENCH_MODE', 'golden')
    cfg = bench.CONFIGS['golden' if mode == 'both' else mode]
    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=bench.DEPTH,
                         base_channels=bench.BASE, dtype=cfg['dtype'],
                         scatter_method=bench.SCATTER,
                         kernel_mlp=os.environ.get('BENCH_KERNEL_MLP',
                                                   'auto'))
    rng = np.random.default_rng(0)
    batch = bench.make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch.events,
                        batch.timestamps, batch.sample_idx,
                        bench.IMSIZE)['params']
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=1000000, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in bench.IMSIZE) for i in range(4)][::-1],
        bf16x2=cfg['loss_prec'] == 'bf16x2')
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    staged = jax.device_put(batch)
    return train_step, state, staged


def summarize_trace(trace_dir: str, n_steps: int):
    """Parse the chrome trace: device-track events only."""
    files = glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True)
    assert files, f'no trace files under {trace_dir}'
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # map pid -> process name to find the device (TPU) tracks
    pid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r'TPU|/device|XLA', name, re.I)
                   and 'host' not in name.lower()}
    per_op = defaultdict(lambda: [0.0, 0])
    total = 0.0
    count = 0
    t_min, t_max = float('inf'), 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        if name.startswith('Steal') or name.lower().startswith('idle'):
            continue
        dur = float(e.get('dur', 0.0))  # microseconds
        ts = float(e.get('ts', 0.0))
        per_op[name][0] += dur
        per_op[name][1] += 1
        total += dur
        count += 1
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)
    wall = (t_max - t_min) if count else 0.0
    print(f'device tracks: '
          f'{[pid_names[p] for p in device_pids]}')
    print(f'steps traced: {n_steps}')
    print(f'kernels/step: {count / max(n_steps, 1):.0f}')
    print(f'device busy/step: {total / max(n_steps, 1) / 1e3:.3f} ms')
    print(f'device span (first->last): {wall / 1e3:.3f} ms '
          f'({wall / 1e3 / max(n_steps, 1):.3f} ms/step)')
    print('\ntop kernels by total device time:')
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:40]
    for name, (dur, n) in rows:
        print(f'  {dur / max(n_steps, 1) / 1e3:8.3f} ms/step  '
              f'x{n // max(n_steps, 1):5d}  {name[:90]}')
    return {'kernels_per_step': count / max(n_steps, 1),
            'busy_ms_per_step': total / max(n_steps, 1) / 1e3}


def main():
    parser = ArgumentParser()
    parser.add_argument('--iters', type=int, default=5)
    parser.add_argument('--out', type=str, default=None)
    args = parser.parse_args()
    out = args.out or tempfile.mkdtemp(prefix='step_trace_')

    import jax
    train_step, state, staged = build_step()
    for _ in range(3):
        state, _ = train_step(state, staged)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    with jax.profiler.trace(out):
        for _ in range(args.iters):
            state, (loss, _) = train_step(state, staged)
        jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / args.iters
    print(f'staged step (traced): {dt * 1e3:.2f} ms')
    summarize_trace(out, args.iters)
    print(f'trace dir: {out}')


if __name__ == '__main__':
    main()
