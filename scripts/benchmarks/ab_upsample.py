#!/usr/bin/env python3
"""A/B the decoder upsample: reshape-broadcast vs jax.image.resize.

The UNet decoder 2x-upsamples features and the coarser flow before every
decode conv.  ``jax.image.resize(method='nearest')`` lowers to a gather
whose transpose is a scatter-add — the irregular-memory slow path on TPU —
while the bit-identical reshape-broadcast form lowers to a broadcast with a
cheap tiled-reduce transpose.  This script measures the full staged train
step with each form in ONE process (cross-process tunnel spread is ±5%,
CLAUDE.md), in both the golden fp32 and bf16-recipe configs.

Usage: python scripts/benchmarks/ab_upsample.py [iters]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def resize_upsample(x):
    import jax
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method='nearest')


def measure(cfg, upsample_fn, iters):
    from types import SimpleNamespace
    import jax
    import jax.numpy as jnp
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)

    module = load_model_class(REPO / 'EVFlowNet')
    orig = module.upsample2x_nearest
    module.upsample2x_nearest = upsample_fn
    try:
        model = module.Model(event_representation_depth=bench.DEPTH,
                             base_channels=bench.BASE, dtype=cfg['dtype'],
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
             for i in range(4)][::-1],
            bf16x2=cfg['loss_prec'] == 'bf16x2')
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
        module.upsample2x_nearest = orig


def main():
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    variants = [('broadcast', None), ('resize', resize_upsample),
                ('broadcast2', None), ('resize2', resize_upsample)]
    for mode in ['golden', 'recipe']:
        cfg = bench.CONFIGS[mode]
        for name, fn in variants:
            import dvs_of_training_framework_tpu.models as m
            real = m.load_model_class(REPO / 'EVFlowNet').upsample2x_nearest
            dt, loss = measure(cfg, fn or real, iters)
            print(f'{mode:6s} upsample={name:10s}: {dt * 1e3:7.2f} ms/step '
                  f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
