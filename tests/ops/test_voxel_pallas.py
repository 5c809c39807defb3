"""Pallas voxelizer: forward + VJP equivalence vs the scatter reference
(interpret mode on CPU; the real kernel runs on TPU via bench/graft)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvs_of_training_framework_tpu.ops.voxel import voxelize_scatter
from dvs_of_training_framework_tpu.ops.voxel_pallas import voxelize_pallas


def make_case(seed=0, E=700, P=4, H=16, W=24, C=5, capacity=768):
    """Plane-major sorted events with tail padding (collation invariant)."""
    rng = np.random.default_rng(seed)
    plane = np.sort(rng.integers(0, P, E)).astype(np.int32)
    x = rng.integers(0, W, E).astype(np.int32)
    y = rng.integers(0, H, E).astype(np.int32)
    weights = rng.normal(size=(E, C)).astype(np.float32)
    # pad to capacity: padding gets the last plane id (clipped), zero weight
    pad = capacity - E
    plane = np.concatenate([plane, np.full(pad, P - 1, np.int32)])
    x = np.concatenate([x, np.zeros(pad, np.int32)])
    y = np.concatenate([y, np.zeros(pad, np.int32)])
    weights = np.concatenate([weights, np.zeros((pad, C), np.float32)])
    valid = np.arange(capacity) < E
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(plane),
            jnp.asarray(weights), jnp.asarray(valid), P, H, W)


def test_forward_matches_scatter():
    case = make_case()
    ref = np.asarray(voxelize_scatter(*case[:5], num_planes=case[5],
                                      height=case[6], width=case[7]))
    got = np.asarray(voxelize_pallas(*case[:5], case[5], case[6], case[7],
                                     64, True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_forward_empty_plane():
    """A plane with zero events must come out all-zero."""
    case = list(make_case(seed=2))
    plane = np.asarray(case[2])
    # remove all events of plane 1 by reassigning to plane 2 (stays sorted)
    plane = np.where(plane == 1, 2, plane)
    case[2] = jnp.asarray(np.sort(plane))
    ref = np.asarray(voxelize_scatter(*case[:5], num_planes=case[5],
                                      height=case[6], width=case[7]))
    got = np.asarray(voxelize_pallas(*case[:5], case[5], case[6], case[7],
                                     64, True))
    assert np.abs(got[1]).max() == 0.0
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_vjp_matches_scatter():
    case = make_case(seed=5)
    x, y, plane, weights, valid, P, H, W = case

    def f_ref(w):
        return (voxelize_scatter(x, y, plane, w, valid,
                                 num_planes=P, height=H, width=W) ** 2).sum()

    def f_pal(w):
        return (voxelize_pallas(x, y, plane, w, valid,
                                P, H, W, 64, True) ** 2).sum()

    g_ref = np.asarray(jax.grad(f_ref)(weights))
    g_pal = np.asarray(jax.grad(f_pal)(weights))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-3, atol=1e-3)


def test_vjp_zero_for_padding():
    case = make_case(seed=7, E=100, capacity=192)
    x, y, plane, weights, valid, P, H, W = case

    def f(w):
        return (voxelize_pallas(x, y, plane, w, valid,
                                P, H, W, 64, True)).sum()

    g = np.asarray(jax.grad(f)(weights))
    assert np.abs(g[100:]).max() == 0.0


def test_bf16_weights_single_pass():
    """bf16-valued weights (recipe mode) take the single-pass contraction:
    bit-identical to two-pass (the lo split of a bf16 value is zero) and
    the returned weight-cotangent keeps the bf16 dtype."""
    case = make_case(seed=9)
    x, y, plane, weights, valid, P, H, W = case
    w16 = weights.astype(jnp.bfloat16)

    ref = np.asarray(voxelize_scatter(x, y, plane,
                                      w16.astype(jnp.float32), valid,
                                      num_planes=P, height=H, width=W))
    got = np.asarray(voxelize_pallas(x, y, plane, w16, valid,
                                     P, H, W, 64, True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def f(w):
        return (voxelize_pallas(x, y, plane, w, valid,
                                P, H, W, 64, True) ** 2).sum()

    def f_ref(w):
        return (voxelize_scatter(x, y, plane, w.astype(jnp.float32),
                                 valid, num_planes=P, height=H,
                                 width=W) ** 2).sum()

    g = jax.grad(f)(w16)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(f_ref)(w16)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=1e-2, atol=1e-2)
