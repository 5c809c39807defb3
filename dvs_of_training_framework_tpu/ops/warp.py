"""Bilinear image warping (grid_sample) with align_corners=True semantics.

The photometric loss warps grayscale frames with the predicted flow; the
reference uses ``torch.nn.functional.grid_sample(align_corners=True)``
(reference utils/loss.py:8-12, 58-70).  Both implementations here reproduce
those semantics exactly (bilinear, zero padding for out-of-border corners);
parity is pinned by tests/ops/test_warp_parity.py against torch on CPU.

``grid_sample`` (default) is the 4-corner gather form.  The patch-gather
variant (``grid_sample_patch``: one 2x2-slice ``lax.gather`` + tent-weight
blend) is numerically identical and fast in isolation, but measured ~10x
slower inside the full jitted training program on TPU v5e (XLA's
multi-element-slice gather takes a slow path there), so it stays opt-in.
"""
import jax.lax as lax
import jax.numpy as jnp


def grid_sample(images: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """4-corner gather bilinear sampling (default).

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


def grid_sample_patch(images: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Patch-gather bilinear sampling (same semantics; opt-in, see module
    docstring for the TPU performance caveat).

    One ``lax.gather`` fetches the 2x2 neighbourhood of every sampling
    point (base clamped so the patch stays in bounds); the bilinear blend
    uses tent weights of each patch cell's *absolute* coordinate with an
    in-bounds mask, which reproduces zeros-padding exactly even when the
    base was clamped at the border.
    """
    N, C, H, W = images.shape
    Ho, Wo = grid.shape[1:3]
    P = Ho * Wo
    gx = grid[..., 0].reshape(N, P)
    gy = grid[..., 1].reshape(N, P)
    # align_corners=True: -1 -> 0, +1 -> size-1
    ix = (gx + 1.0) * 0.5 * (W - 1)
    iy = (gy + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    xb = jnp.clip(x0, 0, W - 2).astype(jnp.int32)
    yb = jnp.clip(y0, 0, H - 2).astype(jnp.int32)

    starts = jnp.stack([yb, xb], axis=-1)            # [N, P, 2]
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(2, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    patches = lax.gather(images, starts, dnums,
                         slice_sizes=(1, C, 2, 2),
                         mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    # [N, P, C, 2, 2]

    def tent(coord, target):
        return jnp.maximum(0.0, 1.0 - jnp.abs(coord - target))

    out = jnp.zeros((N, P, C), images.dtype)
    for a in (0, 1):
        for b in (0, 1):
            ya = (yb + a).astype(images.dtype)
            xa = (xb + b).astype(images.dtype)
            inb = ((ya >= 0) & (ya <= H - 1)
                   & (xa >= 0) & (xa <= W - 1))
            w = tent(iy, ya) * tent(ix, xa) * inb.astype(images.dtype)
            out = out + patches[:, :, :, a, b] * w[:, :, None]
    return out.transpose(0, 2, 1).reshape(N, C, Ho, Wo)
