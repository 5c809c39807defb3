#!/usr/bin/env python3
"""Size the per-event kernel-MLP's share of the recipe step.

The quantization layer evaluates a 1->30->30->1 tanh MLP per
(event, channel) — [E*C, 30] activations round-trip HBM in both passes.
This measures the full recipe step with (a) the real learnable kernel
and (b) the fixed triangular kernel only (MLP skipped), in ONE process.
The delta bounds what a fused Pallas event-kernel could recover.

Result (recorded): 19.9 -> 15.5 ms/step, i.e. the XLA-form MLP cost
4.4 ms — the evidence behind ops/kernel_mlp_pallas.py.

Usage: python scripts/benchmarks/ab_mlp_cost.py [iters]
"""
import importlib
import sys

from step_harness import REPO, measure_step

sys.path.insert(0, str(REPO))

from dvs_of_training_framework_tpu.models import load_model_class  # noqa


def measure(skip_mlp, iters):
    import jax.numpy as jnp
    module = load_model_class(REPO / 'EVFlowNet')
    # the plugin module object exposes its net module via Model.__module__
    net_mod = importlib.import_module(module.Model.__module__)
    orig_call = net_mod.QuantizationLayer.__call__

    if skip_mlp:
        def tri_only(self, events, timestamps, sample_idx, imsize,
                     num_elements, batch_size):
            # identical to the real layer but weight = tri; the MLP's
            # params (and their optimizer-state cost, ~2k elements —
            # noise) are removed along with its compute
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
            delta = t_norm[None, :] - centers[:, None]        # [C, E]
            tri = jnp.maximum(0.0, 1.0 - jnp.abs(delta) * max(C - 1, 1))
            weight = tri.astype(self.dtype)
            value = weight * events.polarity[None, :].astype(self.dtype)
            value = jnp.where(valid[None, :], value, 0.0).T
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
        return measure_step(iters=iters)
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
