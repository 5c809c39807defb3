#!/usr/bin/env python3
"""Numerical parity sweep of the accelerated kernels on the current backend.

Checks, on real hardware (run with JAX_PLATFORMS=tpu/axon) or CPU:

- MXU one-hot warp vs 4-corner gather grid_sample (values + flow-grads),
- Pallas voxelizer vs XLA scatter (values + weight-grads),
Prints max abs/rel differences; exits non-zero if any exceed tolerance.
"""
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TOL = 1e-4


def check(name, a, b, tol=TOL):
    a = np.asarray(a)
    b = np.asarray(b)
    diff = np.abs(a - b).max()
    rel = diff / max(np.abs(b).max(), 1e-9)
    ok = diff < tol or rel < tol
    print(f'{"OK " if ok else "FAIL"} {name}: max abs {diff:.3e} '
          f'(rel {rel:.3e})')
    return ok


def main():
    import jax
    import jax.numpy as jnp
    from dvs_of_training_framework_tpu.ops.warp import (grid_sample,
                                                        grid_sample_onehot)
    from dvs_of_training_framework_tpu.ops.voxel import voxelize_scatter
    from dvs_of_training_framework_tpu.ops.voxel_pallas import \
        voxelize_pallas
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss

    print(f'backend: {jax.default_backend()}')
    rng = np.random.default_rng(0)
    ok = True

    # --- warp ----------------------------------------------------------
    N, C, H, W = 2, 1, 32, 32
    images = jnp.asarray(rng.normal(size=(N, C, H, W)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (N, H, W, 2))
                       .astype(np.float32))
    ok &= check('warp values', grid_sample_onehot(images, grid, 512),
                grid_sample(images, grid))
    cot = jnp.asarray(rng.normal(size=(N, C, H, W)).astype(np.float32))
    g1 = jax.grad(lambda g: (grid_sample_onehot(images, g, 512)
                             * cot).sum())(grid)
    g2 = jax.grad(lambda g: (grid_sample(images, g) * cot).sum())(grid)
    ok &= check('warp flow-grads', g1, g2)

    # --- voxelizer -----------------------------------------------------
    E, P = 2048, 4
    plane = jnp.asarray(np.sort(rng.integers(0, P, E)).astype(np.int32))
    x = jnp.asarray(rng.integers(0, W, E).astype(np.int32))
    y = jnp.asarray(rng.integers(0, H, E).astype(np.int32))
    wts = jnp.asarray(rng.normal(size=(E, 9)).astype(np.float32))
    valid = jnp.ones(E, bool)
    interpret = jax.default_backend() in ('cpu', 'gpu')
    ok &= check('voxel values',
                voxelize_pallas(x, y, plane, wts, valid, P, H, W, 128,
                                interpret),
                voxelize_scatter(x, y, plane, wts, valid,
                                 num_planes=P, height=H, width=W))
    gv1 = jax.grad(lambda w: (voxelize_pallas(x, y, plane, w, valid, P, H,
                                              W, 128, interpret) ** 2)
                   .sum())(wts)
    gv2 = jax.grad(lambda w: (voxelize_scatter(x, y, plane, w, valid,
                                               num_planes=P, height=H,
                                               width=W) ** 2).sum())(wts)
    ok &= check('voxel weight-grads', gv1, gv2, tol=1e-3)

    print('ALL OK' if ok else 'FAILURES PRESENT')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
