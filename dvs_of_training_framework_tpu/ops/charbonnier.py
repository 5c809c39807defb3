"""Charbonnier penalty ``(delta^2 + eps^2)^alpha``.

Reference: utils/loss.py:24-35.  Fixed-shape variants take an optional mask
(so "no selected elements" degenerates to 0 like the reference's
``numel() == 0`` early-out) and an optional per-element denominator for the
out-of-border term.
"""
from typing import Optional

import jax.numpy as jnp


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
    value = jnp.power(delta * delta + epsilon * epsilon, alpha)
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
