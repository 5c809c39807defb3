"""Parity of JAX warp/resize ops against torch (the reference's backend).

torch (CPU build) serves as the behavioural oracle for
``grid_sample(align_corners=True)`` and
``F.interpolate(bilinear, align_corners=True)`` — the two ops whose exact
semantics the reference loss goldens depend on.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dvs_of_training_framework_tpu.ops import grid_sample, resize_bilinear  # noqa: E402


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('shape', [(2, 1, 16, 24), (1, 3, 7, 5)])
def test_grid_sample_parity(seed, shape):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=shape).astype(np.float32)
    N, C, H, W = shape
    # grid spanning in-bounds and out-of-bounds locations
    grid = rng.uniform(-1.4, 1.4, size=(N, H, W, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(images), jnp.asarray(grid)))
    theirs = F.grid_sample(torch.tensor(images), torch.tensor(grid),
                           mode='bilinear', padding_mode='zeros',
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity():
    rng = np.random.default_rng(0)
    images = rng.normal(size=(1, 1, 8, 12)).astype(np.float32)
    ys, xs = np.mgrid[0:8, 0:12].astype(np.float32)
    gx = xs / (12 - 1) * 2 - 1
    gy = ys / (8 - 1) * 2 - 1
    grid = np.stack([gx, gy], axis=-1)[None]
    out = np.asarray(grid_sample(jnp.asarray(images), jnp.asarray(grid)))
    np.testing.assert_allclose(out, images, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('in_shape,out_shape', [
    ((256, 256), (32, 32)),
    ((256, 256), (64, 64)),
    ((246, 340), (123, 170)),
    ((16, 16), (33, 31)),
    ((5, 6), (5, 6)),
])
def test_resize_parity(in_shape, out_shape):
    rng = np.random.default_rng(42)
    images = rng.normal(size=(2, 1, *in_shape)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(images), out_shape))
    theirs = F.interpolate(torch.tensor(images), size=out_shape,
                           mode='bilinear', align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_charbonnier_matches_reference_formula():
    from dvs_of_training_framework_tpu.ops import charbonnier_loss
    rng = np.random.default_rng(5)
    delta = rng.normal(size=(17,)).astype(np.float32)
    expected = np.mean((delta ** 2 + 1e-3 ** 2) ** 0.45)
    got = float(charbonnier_loss(jnp.asarray(delta)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    # masked variant with empty mask -> 0 (reference numel()==0 early-out)
    got0 = float(charbonnier_loss(jnp.asarray(delta),
                                  mask=jnp.zeros(17, dtype=bool)))
    assert got0 == 0.0

    # denominator variant: sum(charb/denom) over masked elements
    den = rng.uniform(1, 3, size=(17,)).astype(np.float32)
    mask = rng.uniform(size=17) > 0.5
    expected = ((delta ** 2 + 1e-3 ** 2) ** 0.45 / den)[mask].sum()
    got = float(charbonnier_loss(jnp.asarray(delta), mask=jnp.asarray(mask),
                                 denominator=jnp.asarray(den)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_get_local_idx():
    import jax.numpy as jnp
    from dvs_of_training_framework_tpu.ops import get_local_idx
    ids = jnp.array([0, 0, 1, 1, 1, 2, 3, 3], dtype=jnp.int32)
    local, sizes = get_local_idx(ids, 4)
    assert list(np.asarray(local)) == [0, 1, 0, 1, 2, 0, 0, 1]
    assert list(np.asarray(sizes)) == [2, 3, 1, 2]
    # with padding entries (id == num_segments) dropped
    ids_p = jnp.array([0, 0, 1, 2, 2, 2], dtype=jnp.int32)
    local, sizes = get_local_idx(ids_p, 2)
    assert list(np.asarray(sizes)) == [2, 1]


@pytest.mark.parametrize('seed', [0, 3])
def test_patch_gather_variant_matches(seed):
    """The opt-in patch-gather form agrees with the default exactly."""
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_patch
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(2, 3, 15, 21)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(2, 10, 12, 2)).astype(np.float32)
    a = np.asarray(grid_sample(jnp.asarray(images), jnp.asarray(grid)))
    b = np.asarray(grid_sample_patch(jnp.asarray(images),
                                     jnp.asarray(grid)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('seed', [0, 2])
def test_onehot_variant_matches_values_and_grads(seed):
    """The MXU one-hot warp matches torch in value AND in grad w.r.t. the
    sampling grid (images are constants in the photometric loss)."""
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_onehot
    import jax

    rng = np.random.default_rng(seed)
    N, C, H, W = 2, 1, 12, 18
    Ho, Wo = 10, 14
    images = rng.normal(size=(N, C, H, W)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(N, Ho, Wo, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                         jnp.asarray(grid), 64))
    theirs = F.grid_sample(torch.tensor(images), torch.tensor(grid),
                           mode='bilinear', padding_mode='zeros',
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    # gradient w.r.t. grid
    cot = rng.normal(size=theirs.shape).astype(np.float32)

    def f(g):
        return (grid_sample_onehot(jnp.asarray(images), g, 64)
                * jnp.asarray(cot)).sum()

    dgrid = np.asarray(jax.grad(f)(jnp.asarray(grid)))

    tgrid = torch.tensor(grid, requires_grad=True)
    tout = F.grid_sample(torch.tensor(images), tgrid, mode='bilinear',
                         padding_mode='zeros', align_corners=True)
    (tout * torch.tensor(cot)).sum().backward()
    # torch's grad at exact integer coordinates can differ in measure-zero
    # floor boundary cases; tolerance covers fp noise only
    np.testing.assert_allclose(dgrid, tgrid.grad.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('seed', [0, 1])
def test_pallas_corner_kernel_matches(seed):
    """The one-launch Pallas corner kernel (interpret mode on CPU) is
    bit-identical to the XLA einsum path in value and grid-grad."""
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_onehot
    import jax

    rng = np.random.default_rng(seed)
    N, C, H, W = 2, 1, 16, 24
    Ho, Wo = 13, 17
    images = rng.uniform(0, 255, size=(N, C, H, W)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(N, Ho, Wo, 2)).astype(np.float32)
    cot = rng.normal(size=(N, C, Ho, Wo)).astype(np.float32)

    def run(use_pallas):
        def f(g):
            return (grid_sample_onehot(jnp.asarray(images), g, 64,
                                       use_pallas)
                    * jnp.asarray(cot)).sum()
        val = grid_sample_onehot(jnp.asarray(images), jnp.asarray(grid),
                                 64, use_pallas)
        dgrid = jax.grad(f)(jnp.asarray(grid))
        return np.asarray(val), np.asarray(dgrid)

    v_ref, g_ref = run(False)
    v_pal, g_pal = run('interpret')
    np.testing.assert_array_equal(v_pal, v_ref)
    np.testing.assert_array_equal(g_pal, g_ref)


def test_pallas_bf16x2_close_to_fp32():
    """The bf16x2 hi+lo split (2 MXU passes) tracks the fp32 corner
    values to ~2^-16 relative — the documented bound of the opt-in
    --loss-precision bf16x2 recipe."""
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_onehot
    rng = np.random.default_rng(7)
    N, C, H, W = 2, 1, 16, 24
    images = rng.uniform(0, 255, size=(N, C, H, W)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(N, 9, 11, 2)).astype(np.float32)
    ref = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                        jnp.asarray(grid), 64,
                                        'interpret', False))
    fast = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                         jnp.asarray(grid), 64,
                                         'interpret', True))
    np.testing.assert_allclose(fast, ref, rtol=0, atol=255 * 2 ** -15)


def test_einsum_bf16x2_close_to_fp32():
    """The XLA einsum corner path honours bf16x2 with the same hi+lo
    split and error bound as the Pallas kernel (both backends must be
    interchangeable under --loss-precision bf16x2)."""
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_onehot
    rng = np.random.default_rng(11)
    N, C, H, W = 2, 1, 16, 24
    images = rng.uniform(0, 255, size=(N, C, H, W)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(N, 9, 11, 2)).astype(np.float32)
    ref = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                        jnp.asarray(grid), 64,
                                        False, False))
    fast = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                         jnp.asarray(grid), 64,
                                         False, True))
    np.testing.assert_allclose(fast, ref, rtol=0, atol=255 * 2 ** -15)
    # multi-chunk scan path too (chunk < P)
    fast2 = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                          jnp.asarray(grid), 32,
                                          False, True))
    np.testing.assert_allclose(fast2, ref, rtol=0, atol=255 * 2 ** -15)


def test_bf16x1_close_to_fp32_both_backends():
    """The single-pass bf16x1 mode tracks fp32 corner values to ~2^-8
    relative (its documented bound) on both warp backends."""
    from dvs_of_training_framework_tpu.ops.warp import grid_sample_onehot
    rng = np.random.default_rng(13)
    N, C, H, W = 2, 1, 16, 24
    images = rng.uniform(0, 255, size=(N, C, H, W)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(N, 9, 11, 2)).astype(np.float32)
    ref = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                        jnp.asarray(grid), 64,
                                        False, False))
    for backend in (False, 'interpret'):
        fast = np.asarray(grid_sample_onehot(jnp.asarray(images),
                                             jnp.asarray(grid), 64,
                                             backend, 'x1'))
        np.testing.assert_allclose(fast, ref, rtol=0, atol=255 * 2 ** -7,
                                   err_msg=str(backend))


def test_charbonnier_custom_vjp_grads():
    """The custom backward (alpha*u/s with the forward's own pow) agrees
    with plain autodiff of the same expression to rounding."""
    import jax
    from dvs_of_training_framework_tpu.ops import charbonnier_loss

    rng = np.random.default_rng(7)
    delta = rng.normal(0, 2.0, (4, 2, 33, 33)).astype(np.float32)
    mask = rng.uniform(size=delta.shape) < 0.5
    den = np.abs(rng.normal(1.0, 0.2, delta.shape)).astype(np.float32)

    def plain(d, **kw):
        value = jnp.power(d * d + 1e-3 ** 2, 0.45)
        kw2 = dict(kw)
        m = kw2.get('mask')
        dn = kw2.get('denominator')
        if dn is not None:
            safe = jnp.where(dn > 0, dn, 1.0)
            value = value / safe
            if m is None:
                return value.sum()
            return jnp.where(m & (dn > 0), value, 0.0).sum()
        if m is None:
            return value.mean()
        count = m.sum()
        total = jnp.where(m, value, 0.0).sum()
        return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

    for kw in ({}, {'mask': jnp.asarray(mask)},
               {'mask': jnp.asarray(mask), 'denominator': jnp.asarray(den)}):
        v = float(charbonnier_loss(jnp.asarray(delta), **kw))
        v_ref = float(plain(jnp.asarray(delta), **kw))
        assert abs(v - v_ref) < 1e-7 * max(abs(v_ref), 1), kw
        g = np.asarray(jax.grad(
            lambda d: charbonnier_loss(d, **kw))(jnp.asarray(delta)))
        g_ref = np.asarray(jax.grad(plain)(jnp.asarray(delta), **kw))
        np.testing.assert_allclose(g, g_ref, rtol=2e-6, atol=1e-12,
                                   err_msg=str(kw))
