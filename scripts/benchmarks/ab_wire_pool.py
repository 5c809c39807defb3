#!/usr/bin/env python3
"""A/B: padded vs pooled event wire on the as-trained loop.

Measures the full device-queue training loop (host pad + compact +
pool/stack + upload + fused window step) in ONE process: padded f32,
pooled f32, pooled u16, then padded f32 again (the D2H-poison rule:
after the first fetch every upload runs in the slow per-byte mode —
training's steady state — so the repeat leg confirms leg 1 was already
in it).

Batches are truncated to the accuracy-config fill profile (the
synth_slow shards average 52% of the auto event capacity, see
PERFORMANCE.md), because the pooled wire's saving is exactly the
padding fraction: at 100% fill it ships the same bytes as the padded
wire.

Usage: JAX_PLATFORMS=axon python scripts/benchmarks/ab_wire_pool.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from dvs_of_training_framework_tpu.utils.compilation_cache import \
    enable_compilation_cache  # noqa: E402

ITERS = int(os.environ.get('AB_ITERS', 64))
WINDOW = int(os.environ.get('BENCH_WINDOW', 16))
# per-batch fill targets, cycled; mean 0.52 like the accuracy shards
FILLS = (0.35, 0.62, 0.55, 0.44, 0.58, 0.49, 0.65, 0.48)


def truncate_batch(batch, fill):
    """Keep the leading ``fill * capacity`` events (padding layout intact)."""
    from dvs_of_training_framework_tpu.data.schema import Batch, EventBuffer
    ev = batch.events
    cap = ev.x.shape[0]
    n = min(int(ev.num_events), int(fill * cap))
    sentinel = np.int32(batch.size)

    def cut(arr, fill_value):
        out = np.asarray(arr).copy()
        out[n:] = fill_value
        return out

    return Batch(events=EventBuffer(
        x=cut(ev.x, 0), y=cut(ev.y, 0),
        timestamp=cut(ev.timestamp, 0.0),
        polarity=cut(ev.polarity, 0.0),
        element_index=cut(ev.element_index, 0),
        sample_index=cut(ev.sample_index, sentinel),
        num_events=np.int32(n)),
        data=batch.data, timestamps=batch.timestamps,
        sample_idx=batch.sample_idx, images=batch.images, size=batch.size)


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from dvs_of_training_framework_tpu.data.device_queue import \
        prefetch_windows
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_fused_window_step)

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=bench.DEPTH,
                         base_channels=bench.BASE, dtype='bfloat16',
                         scatter_method=bench.SCATTER)
    rng = np.random.default_rng(0)
    batch0 = bench.make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch0.events,
                        batch0.timestamps, batch0.sample_idx,
                        bench.IMSIZE)['params']
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=1000000, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in bench.IMSIZE) for i in range(4)][::-1],
        bf16x2=True)
    fused = make_fused_window_step(model, evaluator, tx, [0.5, 1, 1],
                                   accumulation_steps=1, window=WINDOW,
                                   is_raw=True)
    host_batches = [
        truncate_batch(bench.make_batch(rng,
                                        sample_offset=i * bench.BATCH_SIZE),
                       FILLS[i % len(FILLS)])
        for i in range(ITERS + WINDOW)]
    mean_fill = np.mean([int(b.events.num_events) for b in host_batches]) \
        / bench.CAPACITY
    print(f'window={WINDOW} iters={ITERS} mean fill='
          f'{mean_fill:.2f} of capacity {bench.CAPACITY}', flush=True)

    def run(pool, quantize_ts=False):
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, params), tx)
        n_run, n_warm, t0 = 0, 0, None
        for _h, win, n_valid, _sk in prefetch_windows(
                iter(host_batches), lambda b: b, window=WINDOW, depth=2,
                quantize_ts=quantize_ts, pool_events=pool):
            state, (loss, _) = fused(state, win)
            n_run += n_valid
            if t0 is None:
                jax.block_until_ready(state.params)
                n_warm = n_run
                t0 = time.perf_counter()
            if n_run >= ITERS + WINDOW:
                break
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / (n_run - n_warm)
        return dt, float(loss[-1])

    legs = (('padded_f32', False, False), ('pooled_f32', True, False),
            ('pooled_u16', True, True), ('padded_f32_2', False, False))
    for name, pool, q in legs:
        dt, loss = run(pool, q)
        print(f'wire={name:13s} as-trained {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:.1f} b/s) loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
