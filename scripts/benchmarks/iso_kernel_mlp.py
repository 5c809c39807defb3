#!/usr/bin/env python3
"""Isolate the kernel-MLP: fwd / fwd+bwd timings, Pallas vs XLA.

Sizes match the bench workload (E*C ~ 1M points).  Isolation numbers
guide kernel micro-optimisation only — the A/B inside the full step
(ab_kernel_mlp.py) remains the decision metric (CLAUDE.md rule).

Usage: python scripts/benchmarks/iso_kernel_mlp.py [n_points]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_010_000
    import jax
    import jax.numpy as jnp
    from dvs_of_training_framework_tpu.ops.kernel_mlp_pallas import \
        kernel_mlp_pallas
    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    hd = 30
    rng = np.random.default_rng(0)
    delta = jnp.asarray(rng.uniform(-1.2, 1.2, n).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(1, hd)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * .1)
    w2 = jnp.asarray((rng.normal(size=(hd, hd)) / np.sqrt(hd))
                     .astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(hd,)).astype(np.float32) * .1)
    w3 = jnp.asarray((rng.normal(size=(hd, 1)) / np.sqrt(hd))
                     .astype(np.float32))
    b3 = jnp.asarray(rng.normal(size=(1,)).astype(np.float32) * .1)
    args = (delta, w1, b1, w2, b2, w3, b3)
    cot = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def xla_mlp(delta, w1, b1, w2, b2, w3, b3):
        x = delta.reshape(-1, 1).astype(jnp.bfloat16)
        h = jnp.tanh(x @ w1.astype(jnp.bfloat16) + b1.astype(jnp.bfloat16))
        h = jnp.tanh(h @ w2.astype(jnp.bfloat16) + b2.astype(jnp.bfloat16))
        out = h @ w3.astype(jnp.bfloat16) + b3.astype(jnp.bfloat16)
        return out.reshape(delta.shape).astype(jnp.float32)

    def pal_mlp(*a):
        return kernel_mlp_pallas(*a)

    def bench(label, fn):
        f_fwd = jax.jit(lambda *a: jnp.sum(fn(*a) * cot))
        f_grad = jax.jit(jax.grad(
            lambda *a: jnp.sum(fn(*a) * cot), argnums=tuple(range(7))))
        for tag, f in [('fwd ', f_fwd), ('grad', f_grad)]:
            r = f(*args)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(50):
                r = f(*args)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 50
            print(f'{label} {tag}: {dt * 1e3:7.3f} ms', flush=True)

    bench('pallas', pal_mlp)
    bench('xla   ', xla_mlp)
    bench('pallas2', pal_mlp)
    bench('xla2  ', xla_mlp)


if __name__ == '__main__':
    main()
