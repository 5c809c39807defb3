#!/usr/bin/env python3
"""Size the loss tail's share of the recipe step.

The recipe-step breakdown (PERFORMANCE.md) attributes ~5 ms of the
~17 ms staged step to "loss reductions + elementwise tail" — the
charbonnier pow evaluations, the 4-direction smoothness crops, the
outborder mask math and their backwards, spread across 4 scales.  This
measures the full recipe step with parts of the objective replaced by
cheap stand-ins, in ONE process (tunnel cross-process variance rule):

- full:        the real objective.
- mse-charb:   ``charbonnier_loss`` -> masked mean of squares (removes
               the pow transcendentals, keeps every reduction/layout).
- no-smooth:   smoothness term -> 0 (removes 4 shifted-crop charbonniers
               + backward).
- no-outborder: outborder term -> 0 (removes the mask + per-sample
               denominator path).
- photo-only-warp: photometric -> plain mean of (warped - prev)
               (keeps the warp contraction, drops its charbonnier).

Each delta vs `full` bounds what a fused Pallas kernel for that term
could recover.  The `full2` repeat leg bounds in-process drift.

Usage: python scripts/benchmarks/ab_loss_cost.py [iters]
"""
import sys

from step_harness import REPO, measure_step

sys.path.insert(0, str(REPO))

import jax.numpy as jnp  # noqa: E402

from dvs_of_training_framework_tpu.losses import loss as loss_mod  # noqa


def _mse(x, alpha=0.45, epsilon=1e-3, mask=None, denominator=None):
    sq = x.astype(jnp.float32) ** 2
    if mask is not None:
        sq = jnp.where(mask, sq, 0.0)
    if denominator is not None:
        return (sq / jnp.maximum(denominator, 1.0)).sum()
    return sq.mean()


VARIANTS = {
    'full': {},
    'mse-charb': {'charbonnier_loss': _mse},
    'no-smooth': {'smoothness_loss':
                  lambda self, flow: jnp.float32(0.0)},
    'no-outborder': {'outborder_regularization_loss':
                     lambda self, flow, warp_grid: jnp.float32(0.0)},
    'photo-only-warp': {'photometric_loss': None},  # filled below
    'full2': {},
}


def _photo_no_charb(self, prev_images, next_images, warp_grid):
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_onehot
    nhwc_grid = warp_grid.transpose(0, 2, 3, 1)
    warped = grid_sample_onehot(next_images, nhwc_grid, 8192, None,
                                self.bf16x2)
    return (warped - prev_images).mean()


VARIANTS['photo-only-warp']['photometric_loss'] = _photo_no_charb


def measure(patches, iters):
    saved = {}
    for name, fn in patches.items():
        if name == 'charbonnier_loss':
            saved[name] = loss_mod.charbonnier_loss
            loss_mod.charbonnier_loss = fn
        else:
            saved[name] = getattr(loss_mod.SingleScaleLoss, name)
            setattr(loss_mod.SingleScaleLoss, name, fn)
    try:
        return measure_step(iters=iters)
    finally:
        for name, fn in saved.items():
            if name == 'charbonnier_loss':
                loss_mod.charbonnier_loss = fn
            else:
                setattr(loss_mod.SingleScaleLoss, name, fn)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for name, patches in VARIANTS.items():
        dt, loss = measure(patches, iters)
        print(f'recipe loss={name:15s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
