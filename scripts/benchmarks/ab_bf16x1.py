#!/usr/bin/env python3
"""A/B the recipe step: bf16x2 vs bf16x1 loss precision.

bf16x1 keeps only the hi pass of the warp's image split (~2^-8
relative): one MXU pass per corner contraction instead of two.
Accuracy is validated separately (ACCURACY.md); this measures the
throughput side in ONE process.

Usage: python scripts/benchmarks/ab_bf16x1.py [iters]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def measure(mode, iters):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=bench.DEPTH,
                         base_channels=bench.BASE, dtype='bfloat16',
                         scatter_method=bench.SCATTER)
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
        [tuple(x // 2 ** i for x in bench.IMSIZE)
         for i in range(4)][::-1], bf16x2=mode)
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=1, is_raw=True)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    staged = jax.device_put(batch)
    for _ in range(3):
        state, (loss, _) = step(state, staged)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, (loss, _) = step(state, staged)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    return dt, float(loss)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for name, mode in [('bf16x2', True), ('bf16x1', 'x1'),
                       ('bf16x2', True), ('bf16x1', 'x1')]:
        dt, loss = measure(mode, iters)
        print(f'recipe loss={name:7s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
