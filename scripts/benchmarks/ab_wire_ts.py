#!/usr/bin/env python3
"""A/B: f32 vs u16 event-timestamp wire on the as-trained loop.

Measures the full device-queue training loop (host pad + compact +
stack + upload + fused window step) twice in ONE process — first f32,
then u16, then f32 again (the D2H-poison rule: after the first fetch
every upload runs in the slow per-byte mode, which is exactly the mode
training lives in, so the repeat-f32 leg confirms the process was
already in steady state for the first leg).

Usage: JAX_PLATFORMS=axon python scripts/benchmarks/ab_wire_ts.py
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

ITERS = int(os.environ.get('AB_ITERS', 48))
WINDOW = int(os.environ.get('BENCH_WINDOW', 8))


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
    host_batches = [bench.make_batch(rng, sample_offset=i * bench.BATCH_SIZE)
                    for i in range(ITERS + WINDOW)]

    def run(quantize_ts):
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, params), tx)
        n_run, n_warm, t0 = 0, 0, None
        for _h, win, n_valid, _sk in prefetch_windows(
                iter(host_batches), lambda b: b, window=WINDOW, depth=2,
                quantize_ts=quantize_ts):
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

    for name, q in (('f32', False), ('u16', True), ('f32_2', False)):
        dt, loss = run(q)
        print(f'wire={name:6s} as-trained {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:.1f} b/s) loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
