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
import functools

import jax
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


# ---------------------------------------------------------------------------
# One-hot matmul formulation (MXU; images treated as constants).
# ---------------------------------------------------------------------------

def _split_bf16(x):
    """hi+lo bf16 split of a float32 array (relative error ~2^-16)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _corner_values(images, iy, ix, chunk, bf16x2=False):
    """Corner values V_ab[o] = img[y0+a, x0+b] (zero outside the image).

    Row extraction runs as batched one-hot matmuls on the MXU (out-of-range
    rows produce all-zero one-hots, giving zeros-padding for free); column
    extraction is a masked reduction.  Events are processed in P-chunks via
    ``lax.scan`` to bound the one-hot footprint.

    Args:
        images: [N, C, H, W] float32.
        iy, ix: [N, P] unnormalized sampling coordinates.
        chunk: chunk length over the P axis (P padded to a multiple).
        bf16x2: contract hi+lo bf16 splits (2 MXU passes each, one-hots
            exact, ~2^-16 relative error) instead of fp32 HIGHEST —
            the same trade as the Pallas kernel's bf16x2 mode.

    Returns:
        V: [2, 2, N, P, C]  (a = y-corner, b = x-corner)
    """
    N, C, H, W = images.shape
    P = iy.shape[1]
    pad = (-P) % chunk
    if pad:
        iy = jnp.pad(iy, ((0, 0), (0, pad)), constant_values=-10.0)
        ix = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-10.0)
    n_chunks = (P + pad) // chunk

    y0 = jnp.floor(iy).astype(jnp.int32)     # [N, P']
    x0 = jnp.floor(ix).astype(jnp.int32)

    row_iota = jnp.arange(H, dtype=jnp.int32)
    col_iota = jnp.arange(W, dtype=jnp.int32)

    def body(_, args):
        y0c, x0c = args                       # [N, chunk] each
        c = y0c.shape[1]
        # BOTH corner rows in ONE batched MXU contraction: the y0 and
        # y0+1 one-hots are stacked along the point axis (3 einsums per
        # chunk instead of 6 — kernel launches are a measurable cost of
        # this program, see PERFORMANCE.md)
        y_two = jnp.concatenate([y0c, y0c + 1], axis=1)        # [N, 2c]
        if bf16x2:
            onehot = (y_two[:, :, None] == row_iota).astype(jnp.bfloat16)
            img_parts = _split_bf16(images)
            if bf16x2 == 'x1':        # hi pass only (~2^-8 relative)
                img_parts = img_parts[:1]
            rows = sum(
                jnp.einsum('nph,nchw->npcw', onehot, part,
                           preferred_element_type=jnp.float32)
                for part in img_parts)               # [N, 2c, C, W]
        else:
            onehot = (y_two[:, :, None] == row_iota).astype(jnp.float32)
            rows = jnp.einsum('nph,nchw->npcw', onehot, images,
                              precision='highest')   # [N, 2c, C, W]

        def pick_col(x_corner):
            two = jnp.concatenate([x_corner, x_corner], axis=1)
            if bf16x2:
                mask = (two[:, :, None] == col_iota).astype(jnp.bfloat16)
                row_parts = _split_bf16(rows)
                if bf16x2 == 'x1':
                    row_parts = row_parts[:1]
                return sum(
                    jnp.einsum('npcw,npw->npc', part, mask,
                               preferred_element_type=jnp.float32)
                    for part in row_parts)           # [N, 2c, C]
            mask = (two[:, :, None] == col_iota).astype(jnp.float32)
            return jnp.einsum('npcw,npw->npc', rows, mask,
                              precision='highest')   # [N, 2c, C]

        col0 = pick_col(x0c)          # [rows(y0)@x0 ; rows(y0+1)@x0]
        col1 = pick_col(x0c + 1)
        V = jnp.stack([
            jnp.stack([col0[:, :c], col1[:, :c]]),
            jnp.stack([col0[:, c:], col1[:, c:]]),
        ])                                    # [2, 2, N, chunk, C]
        return None, V

    if n_chunks == 1:
        # no scan machinery for a single chunk (small scales)
        _, V = body(None, (y0, x0))
    else:
        _, Vs = lax.scan(
            body, None,
            (y0.reshape(N, n_chunks, chunk).transpose(1, 0, 2),
             x0.reshape(N, n_chunks, chunk).transpose(1, 0, 2)))
        # [n_chunks, 2, 2, N, chunk, C] -> [2, 2, N, P', C]
        V = Vs.transpose(1, 2, 3, 0, 4, 5).reshape(2, 2, N, P + pad, C)
    return V[:, :, :, :P, :]


def _unnormalize(grid, H, W):
    gx = grid[..., 0]
    gy = grid[..., 1]
    ix = (gx + 1.0) * 0.5 * (W - 1)
    iy = (gy + 1.0) * 0.5 * (H - 1)
    return iy, ix


def _blend(V, iy, ix):
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy1 = (iy - y0)[None, None, :, :, None]   # weight of the +1 row
    wx1 = (ix - x0)[None, None, :, :, None]
    wy = jnp.concatenate([1.0 - wy1, wy1], axis=0)   # [2,1,N,P,1]
    wx = jnp.concatenate([1.0 - wx1, wx1], axis=1)   # [1,2,N,P,1] -> bcast
    return (V * wy * wx).sum(axis=(0, 1))            # [N, P, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_sample_onehot(images, grid, chunk=8192, use_pallas=None,
                       bf16x2=False):
    """MXU grid_sample: differentiable w.r.t. ``grid`` only.

    Same semantics as ``grid_sample`` but the per-pixel gathers become
    one-hot contractions (fast on TPU).  ``images`` are treated as
    constants (stop-gradient) — exactly the photometric-loss use-case,
    where frames are inputs, not parameters.

    ``use_pallas``: None = auto (single-channel images on TPU use the
    one-launch Pallas corner kernel, ops/warp_pallas.py — but only in
    bf16x2 mode, where it measures faster; at fp32 HIGHEST the einsum
    path wins, see ``_use_pallas``); True/False force it; 'interpret'
    runs the kernel in interpret mode (CPU tests).

    ``bf16x2``: tri-state — False (fp32 HIGHEST, keeps the 5e-6
    goldens), True (hi+lo bf16 split, 2 MXU passes each, ~2^-16
    relative — the bf16x2 loss recipe) or ``'x1'`` (hi pass only,
    ~2^-8 — the bf16x1 mode).  Both backends honour all three.
    """
    out, _ = _gso_fwd(images, grid, chunk, use_pallas, bf16x2)
    return out


def _use_pallas(images, use_pallas, bf16x2=False):
    # Auto policy, measured on v5e in single-process A/Bs (tunnel rule):
    # at fp32 HIGHEST the XLA einsum path wins (24.7 vs 26.4 ms/step,
    # scripts/benchmarks/ab_warp_fp32.py); under the bf16x2 recipe the
    # one-launch Pallas kernel wins (20.0 vs 21.7 ms/step,
    # ab_warp_recipe.py) — so auto picks per precision mode.
    if use_pallas is None:
        return bf16x2 and images.shape[1] == 1 and \
            jax.default_backend() not in ('cpu', 'gpu')
    return bool(use_pallas)


def _gso_fwd(images, grid, chunk, use_pallas, bf16x2):
    images = lax.stop_gradient(images)
    N, C, H, W = images.shape
    Ho, Wo = grid.shape[1:3]
    iy, ix = _unnormalize(grid.reshape(N, Ho * Wo, 2), H, W)
    if _use_pallas(images, use_pallas, bf16x2):
        from .warp_pallas import corner_values_pallas
        V = corner_values_pallas(images, iy, ix,
                                 interpret=use_pallas == 'interpret',
                                 bf16x2=bf16x2)
    else:
        V = _corner_values(images, iy, ix, chunk, bf16x2=bf16x2)
    out = _blend(V, iy, ix)
    out = out.transpose(0, 2, 1).reshape(N, C, Ho, Wo)
    return out, (V, iy, ix, (N, C, H, W, Ho, Wo))


def _gso_fwd_vjp(images, grid, chunk, use_pallas, bf16x2):
    # (custom_vjp fwd rules receive arguments in primal order in this JAX
    # version; only the bwd rule gets nondiff args prepended)
    return _gso_fwd(images, grid, chunk, use_pallas, bf16x2)


def _gso_bwd_vjp(chunk, use_pallas, bf16x2, residuals, g):
    V, iy, ix, (N, C, H, W, Ho, Wo) = residuals
    g2 = g.reshape(N, C, Ho * Wo).transpose(0, 2, 1)   # [N, P, C]

    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy1 = iy - y0
    wx1 = ix - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    # d out / d ix = sum_a wy_a * (V_a1 - V_a0); similarly for iy
    dV_dx = (wy0[..., None] * (V[0, 1] - V[0, 0])
             + wy1[..., None] * (V[1, 1] - V[1, 0]))    # [N, P, C]
    dV_dy = (wx0[..., None] * (V[1, 0] - V[0, 0])
             + wx1[..., None] * (V[1, 1] - V[0, 1]))

    dix = (g2 * dV_dx).sum(-1)                          # [N, P]
    diy = (g2 * dV_dy).sum(-1)
    # chain through the [-1, 1] normalization
    dgx = dix * ((W - 1) * 0.5)
    dgy = diy * ((H - 1) * 0.5)
    dgrid = jnp.stack([dgx, dgy], axis=-1).reshape(N, Ho, Wo, 2)
    return jnp.zeros((N, C, H, W), g.dtype), dgrid


grid_sample_onehot.defvjp(_gso_fwd_vjp, _gso_bwd_vjp)
