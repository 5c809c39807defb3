#!/usr/bin/env python3
"""A/B the voxel kernel's event-chunk size inside the full recipe step.

The Pallas voxelizer streams events in fixed chunks (double-buffered
DMA); bigger chunks mean fewer DMAs and bigger MXU contractions per
launch at the cost of VMEM. Measures chunk = 256 (default) vs 512 vs
1024 in ONE process.

Usage: python scripts/benchmarks/ab_voxel_chunk.py [iters]
"""
import functools
import sys

from step_harness import REPO, measure_step

sys.path.insert(0, str(REPO))

import dvs_of_training_framework_tpu.ops.voxel_pallas as vp  # noqa


def measure(chunk, iters):
    orig = vp.voxelize_pallas

    def patched(x, y, plane, weights, valid, num_planes, height, width,
                _chunk=256, interpret=False):
        return orig(x, y, plane, weights, valid, num_planes, height,
                    width, chunk, interpret)

    vp.voxelize_pallas = functools.wraps(orig)(patched)
    try:
        return measure_step(iters=iters)
    finally:
        vp.voxelize_pallas = orig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for chunk in (256, 512, 1024, 256, 512, 1024):
        dt, loss = measure(chunk, iters)
        print(f'recipe voxel chunk={chunk:5d}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
