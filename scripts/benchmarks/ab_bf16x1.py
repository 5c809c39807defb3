#!/usr/bin/env python3
"""A/B the recipe step: bf16x2 vs bf16x1 loss precision.

bf16x1 keeps only the hi pass of the warp's image split (~2^-8
relative): one MXU pass per corner contraction instead of two.
Accuracy is validated separately (ACCURACY.md); this measures the
throughput side in ONE process.

Usage: python scripts/benchmarks/ab_bf16x1.py [iters]
"""
import sys

from step_harness import measure_step


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for name, mode in [('bf16x2', True), ('bf16x1', 'x1'),
                       ('bf16x2', True), ('bf16x1', 'x1')]:
        dt, loss = measure_step(loss_bf16x2=mode, iters=iters)
        print(f'recipe loss={name:7s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
