#!/usr/bin/env python3
"""Size the per-event kernel-MLP's share of the recipe step.

The quantization layer evaluates a 1->30->30->1 tanh MLP per
(event, channel) — [E*C, 30] activations round-trip HBM in both passes.
This measures the full recipe step with (a) the real learnable kernel
and (b) the fixed triangular kernel only (MLP skipped), in ONE process.
The delta bounds what a fused Pallas event-kernel could recover.

Usage: python scripts/benchmarks/ab_mlp_cost.py [iters]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def measure(skip_mlp, iters):
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
    import importlib
    # the plugin module object exposes its net module via Model.__module__
    net_mod = importlib.import_module(module.Model.__module__)

    orig_call = net_mod.QuantizationLayer.__call__

    if skip_mlp:
        def tri_only(self, events, timestamps, sample_idx, imsize,
                     num_elements, batch_size):
            # identical to the real layer but weight = tri (keeps the
            # Dense params in the tree so the optimizer state matches)
            H, W = imsize
            C = self.depth
            L = num_elements
            from dvs_of_training_framework_tpu.ops import segment_starts
            starts = segment_starts(sample_idx, batch_size)
            valid = events.sample_index < batch_size
            safe_sample = jnp.clip(events.sample_index, 0, batch_size - 1)
            safe_elem = jnp.clip(events.element_index, 0, L - 1)
            ts_base = starts[safe_sample] + safe_elem
            t0 = timestamps[ts_base]
            t1 = timestamps[ts_base + 1]
            denom = jnp.maximum(t1 - t0, 1e-9)
            t_norm = jnp.clip((events.timestamp - t0) / denom, 0.0, 1.0)
            centers = jnp.arange(C, dtype=jnp.float32) / max(C - 1, 1)
            delta = t_norm[:, None] - centers[None, :]
            # no MLP params at all: the optimizer tree is built from this
            # same init, so the step stays self-consistent; ~2k fewer
            # params is noise next to the 14M predictor
            tri = jnp.maximum(0.0, 1.0 - jnp.abs(delta) * max(C - 1, 1))
            weight = tri.astype(self.dtype)
            value = weight * events.polarity[:, None].astype(self.dtype)
            value = jnp.where(valid[:, None], value, 0.0)
            from dvs_of_training_framework_tpu.ops.voxel_pallas import \
                voxelize_pallas
            plane = safe_sample * L + safe_elem
            grid = voxelize_pallas(events.x, events.y, plane, value, valid,
                                   batch_size * L, H, W)
            grid = grid.reshape(batch_size, L, H, W, C).astype(self.dtype)
            grid = grid.transpose(0, 2, 3, 1, 4).reshape(
                batch_size, H, W, L * C)
            return grid
        net_mod.QuantizationLayer.__call__ = tri_only
    try:
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
        net_mod.QuantizationLayer.__call__ = orig_call


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for name, flag in [('mlp', False), ('tri-only', True),
                       ('mlp2', False), ('tri-only2', True)]:
        dt, loss = measure(flag, iters)
        print(f'recipe kernel={name:9s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
