#!/usr/bin/env python3
"""A/B the recipe step: flattened vs per-leaf optimizer chains.

optax.flatten was a round-1 win when the step was dispatch-bound
(~200 fewer kernel launches).  The step is now device-bound and the
flatten wrapper costs two 53 MB concats (grads + params) plus flat
copies per step — re-measure both forms in ONE process.

Usage: python scripts/benchmarks/ab_optflat.py [iters]
"""
import sys

from step_harness import REPO, measure_step

sys.path.insert(0, str(REPO))

import dvs_of_training_framework_tpu.training.optimizers as opt_mod  # noqa


def measure(flatten, iters):
    orig = opt_mod._base_transform

    def patched(name, wd, schedule, flatten_arg=True):
        return orig(name, wd, schedule, flatten=flatten)

    opt_mod._base_transform = patched
    try:
        return measure_step(iters=iters)
    finally:
        opt_mod._base_transform = orig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for name, flag in [('leaf', False), ('flat', True),
                       ('leaf2', False), ('flat2', True),
                       ('leaf3', False), ('flat3', True)]:
        dt, loss = measure(flag, iters)
        print(f'recipe opt={name:6s}: {dt * 1e3:7.2f} ms/step '
              f'({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
