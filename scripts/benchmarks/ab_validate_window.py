#!/usr/bin/env python3
"""Measure validation wall time per ``-vp`` firing: per-batch vs windowed.

``training.train.validate`` pads and dispatches each validation batch on
its own, so every batch pays a dispatch RPC plus the fresh-input-buffer
first-use penalty (CLAUDE.md "D2H poison") — exactly the costs the
device queue amortises in training.  ``validate_windowed`` stages K
padded batches per upload and scans the loss in one dispatch
(state.make_fused_eval_step) with bit-identical scalars (pinned by
tests/training/test_training.py::test_validation_windowed_matches_per_batch).

This times one full validation pass (V batches, the per-firing cost of
a ``-vp`` hook) for the per-batch loop and for windows of 4/8/16, all
in ONE process (tunnel cross-process variance rule), and checks the
aggregated scalar agrees.  Reference analogue of the per-batch loop:
utils/training.py:244-271.

Usage: python scripts/benchmarks/ab_validate_window.py [n_batches]
"""
import sys
import time

import numpy as np

from step_harness import REPO

sys.path.insert(0, str(REPO))

import bench  # noqa: E402


class _NullLogger:
    def add_scalar(self, *a, **k):
        pass


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import jax
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.state import (
        make_eval_step, make_fused_eval_step)
    from dvs_of_training_framework_tpu.training.train import (
        validate, validate_windowed)
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=bench.DEPTH,
                         base_channels=bench.BASE, dtype='bfloat16',
                         scatter_method=bench.SCATTER)
    rng = np.random.default_rng(0)
    first = bench.make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), first.events,
                        first.timestamps, first.sample_idx, bench.IMSIZE)
    params = params['params']
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in bench.IMSIZE) for i in range(4)][::-1],
        bf16x2=True)
    eval_step = make_eval_step(model, evaluator, [0.5, 1, 1], is_raw=True)
    hosts = [bench.make_collated(rng, sample_offset=i * bench.BATCH_SIZE)
             for i in range(n_batches)]
    logger, tags = _NullLogger(), ['32x32', '64x64', '128x128', '256x256']
    capacity = bench.CAPACITY

    def run_per_batch():
        return validate(eval_step, params, iter(hosts), 0, logger, tags,
                        is_raw=True, event_capacity=capacity)

    # build the fused step for each window size ONCE, outside the timed
    # region: a fresh jax.jit wrapper per pass would re-pay trace/lowering
    # (or compile-cache deserialization) on every timed call and bias the
    # windowed legs (the per-batch leg's eval_step is built once too)
    fused_steps = {w: make_fused_eval_step(model, evaluator, [0.5, 1, 1],
                                           window=w, is_raw=True)
                   for w in (4, 8, 16)}

    def run_windowed(window):
        return validate_windowed(fused_steps[window], params, iter(hosts),
                                 0, logger, tags, window=window,
                                 is_raw=True, event_capacity=capacity)

    results = {}
    # warmup compile for every variant first, then time 2 passes each
    legs = [('per-batch', run_per_batch)] + [
        (f'window-{w}', (lambda w=w: run_windowed(w))) for w in (4, 8, 16)]
    for name, fn in legs:
        ref = fn()                       # compile + warm
        t0 = time.perf_counter()
        for _ in range(2):
            val = fn()
        dt = (time.perf_counter() - t0) / 2
        results[name] = (dt, val)
        base = results['per-batch']
        print(f'{name:>10}: {dt * 1000:8.1f} ms/firing '
              f'({n_batches} batches), loss {val:.6f}, '
              f'speedup x{base[0] / dt:.2f}, '
              f'|dloss| {abs(val - base[1]):.2e}', flush=True)
        assert abs(val - base[1]) < 5e-4 * max(1.0, abs(base[1]))


if __name__ == '__main__':
    main()
