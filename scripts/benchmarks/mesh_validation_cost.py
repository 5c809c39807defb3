#!/usr/bin/env python3
"""Measure mesh-mode validation: localized single-device vs sharded eval.

VERDICT round 4 weak #4: under ``--mesh`` validation used to run
single-device on localized params — at n devices that is 1/n-speed with
the other devices idle, plus a whole-params fetch per firing (through
the tunnelled runtime the fetch also flips the process into the
D2H-poisoned upload mode, CLAUDE.md).  Round 5 routes single-process
mesh validation through ``parallel.make_sharded_eval_step`` (the train
step minus the update; same split + shard placement as training).

This times one validation firing (V batches) on the 8-device virtual
CPU mesh, production-shaped batches, both paths in ONE process:

  A. localized:  jax.device_get(params) once per firing, then the
     single-device eval_step per batch (the round-4 behaviour).
  B. sharded:    split_batch_for_mesh + make_global_batch per batch,
     sharded eval step (the round-5 behaviour).

Scalar agreement is asserted (equal shards -> pmean of shard means ==
full-batch mean; exact equality is pinned by
tests/training/test_parallel.py::test_sharded_eval_step_matches_single_device_validate).

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python scripts/benchmarks/mesh_validation_cost.py [V]
(from the default axon env it self-switches to the virtual CPU mesh).
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def force_cpu(n=8):
    import jax
    import jax.extend.backend
    jax.extend.backend.clear_backends()
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', n)


class _NullLogger:
    def add_scalar(self, *a, **k):
        pass


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    force_cpu(8)
    import jax
    import numpy as np

    import bench

    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.parallel import (
        make_global_batch, make_mesh, make_sharded_eval_step,
        split_batch_for_mesh)
    from dvs_of_training_framework_tpu.training.state import make_eval_step
    from dvs_of_training_framework_tpu.training.train import validate

    n_dev = len(jax.devices())
    mesh = make_mesh(f'data:{n_dev}')
    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=bench.DEPTH,
                         base_channels=bench.BASE,
                         scatter_method=bench.SCATTER)
    rng = np.random.default_rng(0)
    first = bench.make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), first.events,
                        first.timestamps, first.sample_idx,
                        bench.IMSIZE)['params']
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in bench.IMSIZE) for i in range(4)][::-1])
    weights = [0.5, 1, 1]
    hosts = [bench.make_collated(rng, sample_offset=i * bench.BATCH_SIZE)
             for i in range(V)]
    capacity = bench.CAPACITY
    logger, tags = _NullLogger(), ['32x32', '64x64', '128x128', '256x256']

    # params committed to the mesh exactly like a training run
    from jax.sharding import NamedSharding, PartitionSpec as P
    params_mesh = jax.device_put(params,
                                 NamedSharding(mesh, P()))

    eval_single = make_eval_step(model, evaluator, weights, is_raw=True)
    eval_dp = make_sharded_eval_step(model, evaluator, weights, mesh)

    def run_localized():
        local = jax.device_get(params_mesh)   # the round-4 fetch
        return validate(eval_single, local, iter(hosts), 0, logger, tags,
                        is_raw=True, event_capacity=capacity)

    def prepare(collated, cap):
        if int(collated['size']) % n_dev:
            raise ValueError('indivisible')
        return make_global_batch(
            split_batch_for_mesh(collated, n_dev,
                                 capacity_per_shard=max(cap // n_dev,
                                                        4096)),
            mesh)

    def run_sharded():
        return validate(eval_dp, params_mesh, iter(hosts), 0, logger,
                        tags, is_raw=True, event_capacity=capacity,
                        prepare_batch=prepare)

    results = {}
    for name, fn in (('localized', run_localized),
                     ('sharded', run_sharded)):
        ref = fn()                       # compile + warm
        t0 = time.perf_counter()
        for _ in range(2):
            val = fn()
        dt = (time.perf_counter() - t0) / 2
        results[name] = (dt, val)
        base = results['localized']
        print(f'{name:>10}: {dt * 1000:8.1f} ms/firing ({V} batches), '
              f'loss {val:.6f}, speedup x{base[0] / dt:.2f}, '
              f'|dloss| {abs(val - base[1]):.2e}', flush=True)
        assert abs(val - base[1]) < 1e-4 * max(1.0, abs(base[1]))


if __name__ == '__main__':
    main()
