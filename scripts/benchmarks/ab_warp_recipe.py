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

from step_harness import measure_step


def measure(use_pallas, iters):
    from dvs_of_training_framework_tpu.ops import warp as warp_mod
    orig = warp_mod._use_pallas
    warp_mod._use_pallas = lambda images, up, *a: bool(use_pallas)
    try:
        return measure_step(iters=iters)
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
