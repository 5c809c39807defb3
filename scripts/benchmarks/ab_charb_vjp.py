#!/usr/bin/env python3
"""A/B: charbonnier custom VJP (backward reuses the forward pow) vs the
plain autodiff backward (a second pow(s, alpha-1) transcendental pass).

Both variants run in ONE process (tunnel variance rule, CLAUDE.md) inside
the full staged step — isolation lies (round-3 layout lessons).

Usage: JAX_PLATFORMS=axon python scripts/benchmarks/ab_charb_vjp.py
"""
import sys
from pathlib import Path

import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from dvs_of_training_framework_tpu.ops import charbonnier as _charb  # noqa
from dvs_of_training_framework_tpu.utils.compilation_cache import \
    enable_compilation_cache  # noqa: E402
from scripts.benchmarks.step_harness import measure_step  # noqa: E402


def plain_value(delta, alpha, epsilon):
    return jnp.power(delta * delta + epsilon * epsilon, alpha)


def main():
    enable_compilation_cache()
    results = {}
    custom = _charb.charbonnier_value
    for name, fn in (('custom_vjp', custom), ('autodiff', plain_value),
                     ('custom_vjp_2', custom)):
        _charb.charbonnier_value = fn
        for mode, kw in (('recipe', dict(dtype='bfloat16',
                                         loss_bf16x2=True)),
                         ('golden', dict(dtype='float32',
                                         loss_bf16x2=False))):
            dt, loss = measure_step(iters=30, **kw)
            results[(name, mode)] = (dt, loss)
            print(f'{name:13s} {mode}: {dt * 1e3:7.2f} ms/step '
                  f'loss={loss:.6f}', flush=True)
    _charb.charbonnier_value = custom
    for mode in ('recipe', 'golden'):
        a = results[('custom_vjp', mode)][0]
        a2 = results[('custom_vjp_2', mode)][0]
        b = results[('autodiff', mode)][0]
        print(f'{mode}: custom {min(a, a2) * 1e3:.2f} ms vs autodiff '
              f'{b * 1e3:.2f} ms -> {"KEEP" if min(a, a2) < b else "REVERT"}')


if __name__ == '__main__':
    main()
