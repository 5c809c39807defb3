"""Bilinear resize with align_corners=True as dense matrix contractions.

The multi-scale loss downsamples frames per prediction scale with
``F.interpolate(mode='bilinear', align_corners=True)`` (reference
utils/loss.py:20-21, 209-211).  On TPU the separable interpolation is
expressed as two small dense matmuls (``A_h @ img @ A_w^T``) so it runs on
the MXU instead of as scalar gathers.  Parity pinned by
tests/ops/test_warp_parity.py.
"""
import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def make_interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Row-stochastic ``[out, in]`` bilinear interpolation matrix
    (align_corners=True)."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # degenerate: align_corners maps the single output to input 0
        A[0, 0] = 1.0
        return A
    # Source positions follow torch's fp32 index arithmetic
    # (area_pixel_compute_source_index) so weights agree bit-for-bit with
    # F.interpolate(align_corners=True).
    scale = np.float32(in_size - 1) / np.float32(out_size - 1)
    for o in range(out_size):
        src = np.float32(o) * scale
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        w1 = np.float32(src) - np.float32(i0)
        A[o, i0] += np.float32(1.0) - w1
        A[o, i1] += w1
    return A


def resize_bilinear(images: jnp.ndarray, out_shape) -> jnp.ndarray:
    """Resize ``[..., H, W]`` images to ``[..., Ho, Wo]``.

    align_corners=True bilinear, exact match of the torch semantics used by
    the reference loss.
    """
    Ho, Wo = int(out_shape[0]), int(out_shape[1])
    H, W = images.shape[-2:]
    if (Ho, Wo) == (H, W):
        return images
    A_h = jnp.asarray(make_interp_matrix(Ho, H))
    A_w = jnp.asarray(make_interp_matrix(Wo, W))
    # precision='highest' keeps fp32 accumulation on the MXU; the default
    # bf16 passthrough breaks the reference loss-golden tolerances.
    out = jnp.einsum('oh,...hw->...ow', A_h, images, precision='highest')
    out = jnp.einsum('pw,...ow->...op', A_w, out, precision='highest')
    return out
