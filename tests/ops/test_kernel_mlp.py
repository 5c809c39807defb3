"""The Pallas per-event kernel-MLP matches the XLA reference.

Values and all seven gradients (delta + six parameters) are pinned
against a plain-jnp float32 reference of the same math (the
quantization layer's 1 -> hd -> hd -> 1 tanh MLP, EVFlowNet/net.py).
Interpret mode keeps the kernel testable on the CPU suite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvs_of_training_framework_tpu.ops.kernel_mlp_pallas import \
    kernel_mlp_pallas


def _ref_mlp(delta, w1, b1, w2, b2, w3, b3):
    x = delta.reshape(-1, 1).astype(jnp.float32)
    h = jnp.tanh(x @ w1 + b1)
    h = jnp.tanh(h @ w2 + b2)
    return (h @ w3 + b3).reshape(delta.shape)


def _make(seed, n, hd=30):
    rng = np.random.default_rng(seed)
    delta = rng.uniform(-1.2, 1.2, size=n).astype(np.float32)
    w1 = rng.normal(size=(1, hd)).astype(np.float32)
    b1 = rng.normal(size=(hd,)).astype(np.float32) * 0.1
    w2 = (rng.normal(size=(hd, hd)) / np.sqrt(hd)).astype(np.float32)
    b2 = rng.normal(size=(hd,)).astype(np.float32) * 0.1
    w3 = (rng.normal(size=(hd, 1)) / np.sqrt(hd)).astype(np.float32)
    b3 = rng.normal(size=(1,)).astype(np.float32) * 0.1
    return tuple(jnp.asarray(a) for a in (delta, w1, b1, w2, b2, w3, b3))


@pytest.mark.parametrize('n', [7, 4096, 5000])
def test_forward_matches_reference(n):
    args = _make(0, n)
    got = kernel_mlp_pallas(*args, 512, True)
    want = _ref_mlp(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_forward_2d_shape_preserved():
    args = _make(1, 600)
    delta2 = args[0].reshape(100, 6)
    got = kernel_mlp_pallas(delta2, *args[1:], 512, True)
    assert got.shape == (100, 6)
    want = _ref_mlp(delta2, *args[1:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_gradients_match_reference():
    args = _make(2, 3000)
    cot = jnp.asarray(np.random.default_rng(3).normal(size=3000)
                      .astype(np.float32))

    def loss_pallas(*a):
        return jnp.sum(kernel_mlp_pallas(*a, 512, True) * cot)

    def loss_ref(*a):
        return jnp.sum(_ref_mlp(*a) * cot)

    g_pal = jax.grad(loss_pallas, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ['delta', 'w1', 'b1', 'w2', 'b2', 'w3', 'b3']
    for name, gp, gr in zip(names, g_pal, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-5,
            atol=1e-5 * scale, err_msg=f'grad mismatch: {name}')


def test_bf16_params_accepted():
    """Model-dtype (bf16) parameters are accepted; math stays f32 on the
    f32 copies, so the result tracks the f32 reference of the ROUNDED
    params exactly."""
    args = _make(4, 1024)
    b16 = (args[0],) + tuple(a.astype(jnp.bfloat16) for a in args[1:])
    got = kernel_mlp_pallas(*b16, 512, True)
    want = _ref_mlp(args[0], *[a.astype(jnp.float32) for a in b16[1:]])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
