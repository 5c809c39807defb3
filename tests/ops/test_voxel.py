"""Voxelization: scatter vs MXU-matmul equivalence + padding handling."""
import numpy as np
import jax.numpy as jnp

from dvs_of_training_framework_tpu.ops.voxel import (voxelize_matmul,
                                                     voxelize_scatter)


def make_case(seed=0, E=1000, P=4, H=16, W=24, C=5):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, W, E).astype(np.int32)
    y = rng.integers(0, H, E).astype(np.int32)
    plane = rng.integers(0, P, E).astype(np.int32)
    weights = rng.normal(size=(E, C)).astype(np.float32)
    valid = rng.uniform(size=E) > 0.2
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(plane),
            jnp.asarray(weights), jnp.asarray(valid), P, H, W)


def reference_numpy(x, y, plane, weights, valid, P, H, W):
    C = weights.shape[1]
    out = np.zeros((P, H, W, C), np.float32)
    for e in range(len(x)):
        if valid[e]:
            out[plane[e], y[e], x[e]] += weights[e]
    return out


def test_scatter_matches_numpy():
    case = make_case()
    got = np.asarray(voxelize_scatter(*case[:5], num_planes=case[5],
                                      height=case[6], width=case[7]))
    want = reference_numpy(*[np.asarray(c) for c in case[:5]],
                           case[5], case[6], case[7])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matmul_matches_scatter():
    case = make_case(seed=3, E=3000)
    ref = np.asarray(voxelize_scatter(*case[:5], num_planes=case[5],
                                      height=case[6], width=case[7]))
    # precise (bf16x2) mode: near-fp32 agreement
    got = np.asarray(voxelize_matmul(*case[:5], num_planes=case[5],
                                     height=case[6], width=case[7],
                                     chunk=512))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # fast single-pass bf16 mode: ~0.4% relative tolerance
    fast = np.asarray(voxelize_matmul(*case[:5], num_planes=case[5],
                                      height=case[6], width=case[7],
                                      chunk=512, precise=False))
    np.testing.assert_allclose(fast, ref, rtol=2e-2, atol=2e-2)
    assert ((np.abs(fast) > 1e-3) == (np.abs(ref) > 1e-3)).mean() > 0.999


def test_invalid_rows_dropped():
    x = jnp.array([0, 1], jnp.int32)
    y = jnp.array([0, 1], jnp.int32)
    plane = jnp.array([0, 0], jnp.int32)
    w = jnp.ones((2, 2), jnp.float32)
    valid = jnp.array([True, False])
    for fn in (voxelize_scatter, voxelize_matmul):
        out = np.asarray(fn(x, y, plane, w, valid, 1, 4, 4))
        assert out.sum() == 2.0  # only the valid event's 2 channels
        assert out[0, 1, 1].sum() == 0.0
