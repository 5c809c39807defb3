#!/usr/bin/env python3
"""A/B the recipe-mode staged step: Pallas warp corners vs bf16x2 einsum.

`ab_warp_fp32.py` showed the XLA einsum corner path beats the Pallas
kernel by ~1.7 ms/step at fp32 HIGHEST.  This measures the production
recipe config (bf16 model compute + bf16x2 loss) with both warp
backends, now that ops/warp.py `_corner_values` supports the same hi+lo
bf16 split as the kernel.  Both variants run in ONE process (the tunnel
latency rule, CLAUDE.md).

Usage: python scripts/benchmarks/ab_warp_recipe.py [iters]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def measure(use_pallas, iters):
    import jax
    from dvs_of_training_framework_tpu.ops import warp as warp_mod
    orig = warp_mod._use_pallas
    warp_mod._use_pallas = lambda images, up, *a: bool(use_pallas)
    try:
        from types import SimpleNamespace
        from dvs_of_training_framework_tpu.losses import MultiScaleLoss
        from dvs_of_training_framework_tpu.models import load_model_class
        from dvs_of_training_framework_tpu.training.optimizers import \
            construct_optimizer
        from dvs_of_training_framework_tpu.training.state import (
            create_train_state, make_train_step)
        import jax.numpy as jnp

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
             for i in range(4)][::-1], bf16x2=True)
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
    finally:
        warp_mod._use_pallas = orig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    for name, flag in [('pallas', True), ('einsum', False),
                       ('pallas2', True), ('einsum2', False)]:
        dt, loss = measure(flag, iters)
        print(f'recipe warp={name:8s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
