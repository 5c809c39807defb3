"""Bilinear image warping (grid_sample) with align_corners=True semantics.

The photometric loss warps grayscale frames with the predicted flow; the
reference uses ``torch.nn.functional.grid_sample(align_corners=True)``
(reference utils/loss.py:8-12, 58-70).  This implementation reproduces those
semantics exactly (bilinear, zero padding for out-of-border corners) as a
gather-based JAX op that XLA fuses into the surrounding loss computation.
Parity is pinned by tests/ops/test_warp_parity.py against torch on CPU.
"""
import jax.numpy as jnp


def grid_sample(images: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``images`` at normalized ``grid`` locations.

    Args:
        images: ``[N, C, H, W]`` input images.
        grid: ``[N, Ho, Wo, 2]`` sampling locations in ``[-1, 1]``,
            last axis ordered ``(x, y)``.

    Returns:
        ``[N, C, Ho, Wo]`` sampled images; out-of-border contributions are
        zero (padding_mode='zeros').
    """
    N, C, H, W = images.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    # align_corners=True: -1 -> 0, +1 -> size-1
    ix = (gx + 1.0) * 0.5 * (W - 1)
    iy = (gy + 1.0) * 0.5 * (H - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def corner(x_idx, y_idx, weight):
        valid = ((x_idx >= 0) & (x_idx <= W - 1)
                 & (y_idx >= 0) & (y_idx <= H - 1))
        xc = jnp.clip(x_idx, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(y_idx, 0, H - 1).astype(jnp.int32)
        # flat gather over the (H, W) plane, batched over N
        flat = images.reshape(N, C, H * W)
        idx = (yc * W + xc).reshape(N, -1)              # [N, Ho*Wo]
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        vals = vals.reshape(N, C, *x_idx.shape[1:])
        w = (weight * valid.astype(images.dtype))[:, None]
        return vals * w

    out = (corner(ix0, iy0, wx0 * wy0)
           + corner(ix1, iy0, wx1 * wy0)
           + corner(ix0, iy1, wx0 * wy1)
           + corner(ix1, iy1, wx1 * wy1))
    return out
