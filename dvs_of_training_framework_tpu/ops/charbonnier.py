"""Charbonnier penalty ``(delta^2 + eps^2)^alpha``.

Reference: utils/loss.py:24-35.  Fixed-shape variants take an optional mask
(so "no selected elements" degenerates to 0 like the reference's
``numel() == 0`` early-out) and an optional per-element denominator for the
out-of-border term.

The elementwise penalty carries a custom VJP: autodiff of ``pow(s, a)``
evaluates a SECOND transcendental ``pow(s, a - 1)`` in the backward, but
``a * u / s`` with the forward's own ``u = s^a`` is algebraically the same
value at one division — the loss backward traverses every pixel of every
scale, so the transcendental count matters on the VPU.  Forward values are
bit-identical (same expression), so the 5e-6 loss goldens and reference
anchors are untouched; gradients agree with plain autodiff to ~1 ulp
(tests/ops/test_warp_parity.py::test_charbonnier_custom_vjp_grads).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def charbonnier_value(delta: jnp.ndarray, alpha: float,
                      epsilon: float) -> jnp.ndarray:
    """Elementwise ``(delta^2 + eps^2)^alpha``."""
    return jnp.power(delta * delta + epsilon * epsilon, alpha)


def _charb_fwd(delta, alpha, epsilon):
    u = jnp.power(delta * delta + epsilon * epsilon, alpha)
    return u, (delta, u)


def _charb_bwd(alpha, epsilon, res, g):
    delta, u = res
    s = delta * delta + epsilon * epsilon
    # d/d(delta) s^alpha = alpha * s^(alpha-1) * 2*delta
    #                    = 2*alpha * delta * u / s   (u = s^alpha, s > 0)
    return (g * (2.0 * alpha) * delta * (u / s),)


charbonnier_value.defvjp(_charb_fwd, _charb_bwd)


def charbonnier_loss(delta: jnp.ndarray,
                     alpha: float = 0.45,
                     epsilon: float = 1e-3,
                     mask: Optional[jnp.ndarray] = None,
                     denominator: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """Charbonnier penalty.

    Args:
        delta: arbitrary-shape residuals.
        alpha, epsilon: penalty parameters.
        mask: optional boolean array broadcastable to ``delta``; only masked
            elements contribute.
        denominator: optional per-element divisor (same/broadcastable shape).
            When given the result is ``sum(charb/denominator)`` over masked
            elements, otherwise the mean over masked elements (0 when the
            mask is empty).
    """
    value = charbonnier_value(delta, alpha, epsilon)
    if denominator is not None:
        safe_den = jnp.where(denominator > 0, denominator, 1.0)
        value = value / safe_den
        if mask is None:
            return value.sum()
        return jnp.where(mask & (denominator > 0), value, 0.0).sum()
    if mask is None:
        return value.mean() if value.size else jnp.zeros((), value.dtype)
    count = mask.sum()
    total = jnp.where(mask, value, 0.0).sum()
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
