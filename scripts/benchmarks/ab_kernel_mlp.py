#!/usr/bin/env python3
"""A/B the recipe step: Pallas kernel-MLP vs the XLA Dense path.

Follow-up to ab_mlp_cost.py (which showed the per-event MLP costs
4.4 ms/step): measures the full recipe step with kernel_mlp='pallas'
(ops/kernel_mlp_pallas.py) vs 'xla', both in ONE process.

Usage: python scripts/benchmarks/ab_kernel_mlp.py [iters]
"""
import sys

from step_harness import measure_step


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for name in ['pallas', 'xla', 'pallas', 'xla']:
        dt, loss = measure_step(iters=iters,
                                model_kwargs={'kernel_mlp': name})
        print(f'recipe kernel_mlp={name:7s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
