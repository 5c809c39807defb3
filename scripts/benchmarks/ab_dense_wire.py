#!/usr/bin/env python3
"""Dense (--ev_images) as-trained wire A/B: f32 vs bf16 data wire.

The dense training mode ships ``[B, C, H, W]`` float tensors every step —
at bs 8 x 27ch x 256^2 that is ~56 MB/batch in f32, which binds the
as-trained rate on upload-bandwidth-bound hosts (the tunnelled runtime's
poisoned mode runs ~80 MB/s: ~0.7 s/batch of wire alone, the round-4
``experiments/evimg3k`` observation).  ``--wire-data bf16`` halves that
leg; this measures both legs in ONE process (tunnel variance rule)
through the exact as-trained path: host batches -> device-queue window
upload -> fused scan steps.

Usage: python scripts/benchmarks/ab_dense_wire.py [iters] [channels]
"""
import sys
import time

import numpy as np

from step_harness import REPO

sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    window = 8
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from dvs_of_training_framework_tpu.data.device_queue import \
        prefetch_windows
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                      load_model_class)
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_fused_window_step)
    from types import SimpleNamespace

    H, W = bench.IMSIZE
    B = bench.BATCH_SIZE
    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(**filter_kwargs(module.Model, dict(
        event_representation_depth=9, base_channels=bench.BASE,
        dtype='bfloat16', max_sequence_length=1)))
    rng = np.random.default_rng(0)

    def make_dense_collated(i):
        # dense batches as decoded from quantized shards: data + 2
        # timestamps/images per sample (prepare path identical to the CLI)
        return {
            'data': rng.normal(size=(B, channels, H, W)).astype(np.float32),
            'timestamps': np.tile(np.array([0.0, 0.05], np.float32), B),
            'sample_idx': np.repeat(np.arange(B), 2).astype(np.int32),
            'images': rng.integers(0, 255, (2 * B, 1, H, W)).astype(
                np.float32),
            'size': B,
        }

    from dvs_of_training_framework_tpu.data.schema import pad_batch
    probe = pad_batch(make_dense_collated(0))
    params = model.init(jax.random.PRNGKey(0), probe.data,
                        probe.timestamps, probe.sample_idx, (H, W),
                        raw=False)['params']
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=1000000, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in (H, W)) for i in range(4)][::-1],
        bf16x2=True)
    fused = make_fused_window_step(model, evaluator, tx, [0.5, 1, 1],
                                   accumulation_steps=1, window=window,
                                   is_raw=False)
    hosts = [make_dense_collated(i) for i in range(iters + window)]
    wire_bytes = {'f32': B * channels * H * W * 4,
                  'bf16': B * channels * H * W * 2}

    results = {}
    for wire in ('f32', 'bf16'):
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, params), tx)
        n_run, n_warm, t0 = 0, 0, None
        for _h, dev_window, n_valid, _sk in prefetch_windows(
                iter(list(hosts)), lambda b: pad_batch(b), window=window,
                depth=2, data_wire=wire):
            state, (loss, _) = fused(state, dev_window)
            n_run += n_valid
            if t0 is None:
                jax.block_until_ready(state.params)
                n_warm = n_run
                t0 = time.perf_counter()
            if n_run >= iters + window:
                break
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / (n_run - n_warm)
        results[wire] = dt
        print(f'dense wire {wire}: {dt * 1000:8.1f} ms/step '
              f'({1 / dt:6.2f} steps/s), data leg '
              f'{wire_bytes[wire] / 1e6:.1f} MB/batch, loss '
              f'{float(loss[-1]) if hasattr(loss, "shape") else float(loss):.4f}',
              flush=True)
    print(f'speedup bf16/f32: x{results["f32"] / results["bf16"]:.2f}')


if __name__ == '__main__':
    main()
