#!/usr/bin/env python3
"""A/B the fp32 (golden-mode) staged step: Pallas warp corners vs einsum.

Round 3 made the one-launch Pallas corner kernel the TPU default for the
warp's corner extraction (ops/warp.py `_use_pallas`).  At fp32 HIGHEST it
measured time-neutral in the round-3 pass, but the cross-process spread
is ±5%, so this script re-measures BOTH variants in ONE process (the
tunnel latency rule, CLAUDE.md) to decide the fp32 default.

Result (recorded): einsum 24.7 vs Pallas 26.4 ms/step — `_use_pallas`
auto now picks einsum at fp32 and Pallas only under bf16x2/bf16x1.

Usage: python scripts/benchmarks/ab_warp_fp32.py [iters]
"""
import sys

from step_harness import measure_step


def measure(use_pallas, iters):
    from dvs_of_training_framework_tpu.ops import warp as warp_mod
    orig = warp_mod._use_pallas
    warp_mod._use_pallas = lambda images, up, *a: bool(use_pallas)
    try:
        return measure_step(dtype='float32', loss_bf16x2=False,
                            iters=iters)
    finally:
        warp_mod._use_pallas = orig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    for name, flag in [('pallas', True), ('einsum', False),
                       ('pallas2', True), ('einsum2', False)]:
        dt, loss = measure(flag, iters)
        print(f'fp32 warp={name:8s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
