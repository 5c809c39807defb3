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
SCATTER = os.environ.get('BENCH_SCATTER', 'auto')
# Model plugin to bench (directory name under the repo root).  The
# headline stays the EVFlowNet flagship; BENCH_FLOWNET=RecurrentFlowNet
# benches the ConvGRU recurrent plugin through the identical protocol.
FLOWNET = os.environ.get('BENCH_FLOWNET', 'EVFlowNet')
# Configurations measured.  'golden' is exact-fp32 (the loss-golden mode
# the tests pin); 'recipe' is the production bf16 recipe
# (--precision bfloat16 --loss-precision bf16x2), accuracy-validated by
# the clipped A/B in ACCURACY.md.  BENCH_MODE=golden|recipe|both.
MODE = os.environ.get('BENCH_MODE', 'both')
CONFIGS = {
    'golden': {'dtype': 'float32', 'loss_prec': 'highest'},
    'recipe': {'dtype': 'bfloat16', 'loss_prec': 'bf16x2'},
}


_SIM = None  # (events [N,4], frames, frame_ts) from the DVS simulator


def _simulated_stream(rng):
    """Short simulated-DVS recording: spatially-clustered (edge) events.

    Real MVSEC events cluster on moving edges; uniform random events
    change scatter/one-hot behaviour, so the bench draws samples from the
    same brightness-change simulator that generates the synthetic MVSEC
    dataset (scripts/make_synthetic_mvsec.py).
    """
    global _SIM
    if _SIM is None:
        from scripts.make_synthetic_mvsec import simulate_sequence
        _SIM = simulate_sequence(np.random.default_rng(11), 3.0, 0.7)
    return _SIM


def make_collated(rng, sample_offset=0):
    """Host-collated ragged batch dict (pre-padding), bench workload."""
    H, W = IMSIZE
    events, frames, frame_ts, _gt = _simulated_stream(rng)
    n_windows = frame_ts.size - 1
    xs, ys, ts, ps, eis, sis = [], [], [], [], [], []
    images = []
    timestamps = []
    fh, fw = frames.shape[1:3]
    oy, ox = (fh - H) // 2, (fw - W) // 2
    per_sample = max(N_EVENTS // BATCH_SIZE, 1)
    for b in range(BATCH_SIZE):
        w = (sample_offset + b) % n_windows
        lo, hi = np.searchsorted(events[:, 2],
                                 [frame_ts[w], frame_ts[w + 1]])
        sel = events[lo:hi]
        # central 256x256 crop (drops out-of-box events, like EventCrop)
        keep = ((sel[:, 0] >= ox) & (sel[:, 0] < ox + W)
                & (sel[:, 1] >= oy) & (sel[:, 1] < oy + H))
        sel = sel[keep][:per_sample]
        xs.append(sel[:, 0] - ox)
        ys.append(sel[:, 1] - oy)
        ts.append((sel[:, 2] - frame_ts[w]).astype(np.float32))
        ps.append(sel[:, 3])
        eis.append(np.zeros(sel.shape[0], np.int64))
        sis.append(np.full(sel.shape[0], b, np.int64))
        images.append(frames[w, oy:oy + H, ox:ox + W])
        images.append(frames[w + 1, oy:oy + H, ox:ox + W])
        timestamps.extend([0.0, frame_ts[w + 1] - frame_ts[w]])
    ev = {
        'x': np.concatenate(xs),
        'y': np.concatenate(ys),
        'timestamp': np.concatenate(ts),
        'polarity': np.concatenate(ps),
        'element_index': np.concatenate(eis),
        'sample_index': np.concatenate(sis),
    }
    return {
        'events': ev,
        'timestamps': np.asarray(timestamps, np.float32),
        'sample_idx': np.repeat(np.arange(BATCH_SIZE), 2).astype(np.int32),
        'images': np.stack(images)[:, None].astype(np.float32),
        'size': BATCH_SIZE,
    }


def make_batch(rng, sample_offset=0):
    from dvs_of_training_framework_tpu.data.schema import Batch, pad_events
    c = make_collated(rng, sample_offset)
    return Batch(
        events=pad_events(c['events'], BATCH_SIZE, CAPACITY),
        data=None,
        timestamps=c['timestamps'],
        sample_idx=c['sample_idx'],
        images=c['images'],
        size=BATCH_SIZE)


def measure_tpu(dtype='float32', loss_prec='highest'):
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)

    from dvs_of_training_framework_tpu.models.loader import filter_kwargs
    module = load_model_class(REPO / FLOWNET)
    model = module.Model(**filter_kwargs(module.Model, dict(
        event_representation_depth=DEPTH, base_channels=BASE, dtype=dtype,
        scatter_method=SCATTER, max_sequence_length=1)))
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
        [tuple(x // 2 ** i for x in IMSIZE) for i in range(4)][::-1],
        bf16x2=loss_prec == 'bf16x2')
    train_step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                                 accumulation_steps=1, is_raw=True)
    import jax.numpy as jnp
    params = jax.tree_util.tree_map(jnp.array, params)  # keep a live copy
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    n_events_real = int(batch.events.num_events)

    # --- staged-step throughput (device capability; round-1 protocol) ---
    staged = jax.device_put(batch)
    for _ in range(WARMUP):
        state, (loss, _) = train_step(state, staged)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, (loss, _) = train_step(state, staged)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(float(loss)), 'training step diverged'

    # --- as-trained loop: fresh host batches through the device queue ---
    # (host pad + upload + step, exactly like train_flownet's loop)
    from dvs_of_training_framework_tpu.data.device_queue import \
        prefetch_windows
    from dvs_of_training_framework_tpu.training.state import \
        make_fused_window_step
    window = int(os.environ.get('BENCH_WINDOW', 8))
    fused_step = make_fused_window_step(model, evaluator, tx, [0.5, 1, 1],
                                        accumulation_steps=1,
                                        window=window, is_raw=True)
    host_batches = [make_batch(rng, sample_offset=i * BATCH_SIZE)
                    for i in range(ITERS + window)]
    state_q = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    n_run = 0
    t0 = None
    wire_u16 = os.environ.get('BENCH_WIRE_TS', 'f32') == 'u16'
    wire_pooled = os.environ.get('BENCH_WIRE_EVENTS', 'padded') == 'pooled'
    for hosts, dev_window, n_valid, _sk in prefetch_windows(
            iter(host_batches), lambda b: b, window=window, depth=2,
            quantize_ts=wire_u16, pool_events=wire_pooled):
        state_q, (loss_q, _) = fused_step(state_q, dev_window)
        n_run += n_valid
        if t0 is None:                 # first window = warmup + compile
            jax.block_until_ready(state_q.params)
            n_warm = n_run
            t0 = time.perf_counter()
        if n_run >= ITERS + window:
            break
    jax.block_until_ready(state_q.params)
    loop_dt = (time.perf_counter() - t0) / (n_run - n_warm)

    return {'batches_per_sec': 1.0 / dt,
            'samples_per_sec': BATCH_SIZE / dt,
            'events_per_sec': n_events_real / dt,
            'n_events': n_events_real,
            'step_time_sec': dt,
            'astrained_batches_per_sec': 1.0 / loop_dt,
            'astrained_step_time_sec': loop_dt}


def main():
    modes = ['golden', 'recipe'] if MODE == 'both' else [MODE]
    results = {m: measure_tpu(**CONFIGS[m]) for m in modes}
    # Headline: the production bf16 recipe (accuracy-validated in
    # ACCURACY.md's clipped A/B); fp32 golden numbers ride in `detail`.
    head = 'recipe' if 'recipe' in results else modes[0]
    result = results[head]
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
    detail = {f'{m}_{k}': round(v, 4)
              for m in modes for k, v in results[m].items()}
    print(json.dumps({
        'metric': 'event-batches/sec/chip (full train step, bs=8, '
                  f'simulated-DVS clustered events, 256x256, {FLOWNET}-'
                  f'{BASE}, {head} config)',
        'value': round(result['batches_per_sec'], 3),
        'unit': 'batches/s',
        'vs_baseline': (round(vs_baseline, 2)
                        if vs_baseline is not None else None),
        'detail': detail,
    }))


if __name__ == '__main__':
    main()
