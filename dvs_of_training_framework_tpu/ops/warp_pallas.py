"""Pallas TPU kernel for the photometric-warp corner values.

The MXU one-hot warp (ops/warp.py grid_sample_onehot) is exact and fast,
but its XLA form is a scan of 3 einsums per 8192-point chunk — ~40 kernel
launches per step across the four loss scales, each with HBM round-trips
for the intermediate row matrices.  This kernel computes all four corner
values V_ab = img[y0+a, x0+b] for a whole image batch in ONE
``pallas_call``: the frames stay resident in VMEM across all their
chunks, both corner-row one-hots are contracted against them in a single
MXU ``dot_general`` per sample, and the column picks are in-register
masked reductions.

Mosaic layout notes (see also ops/voxel_pallas.py):
- the point axis rides the LANES everywhere: one-hots are built
  transposed ``[H, chunk]`` by comparing a 2-D iota against the
  broadcast ``[1, chunk]`` coordinate row, so no vector transpose or
  1-column DMA is ever needed;
- ``dot_general`` contracts the H axis directly (no explicit transpose);
- block shapes keep the full batch axis (TPU blocks need their
  second-to-last dim divisible by 8 or whole) and the per-sample work is
  a statically unrolled loop — N is a static batch size;
- out-of-image corners match no one-hot row/column, giving zeros-padding
  for free (same semantics as grid_sample's zeros mode).

The blend and the analytic grid-VJP stay in XLA (ops/warp.py) — they are
cheap elementwise code that fuses with the Charbonnier loss; the saved V
makes the backward kernel-free.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(img_ref,        # VMEM [N, H, W] f32
            iy_ref,         # VMEM [N, chunk] f32 (unnormalized y)
            ix_ref,         # VMEM [N, chunk] f32
            out_ref,        # VMEM [4*N, chunk] f32: corner-major rows
            *, height, width, chunk, batch, bf16x2):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (height, 2 * chunk), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (width, 2 * chunk), 0)
    for n in range(batch):
        iy = iy_ref[n:n + 1, :]                          # [1, chunk]
        ix = ix_ref[n:n + 1, :]
        y0 = jnp.floor(iy).astype(jnp.int32)
        x0 = jnp.floor(ix).astype(jnp.int32)
        img = img_ref[n]                                 # [H, W]

        # y-corner one-hots, transposed [H, 2*chunk]: lanes = (chunk
        # points for y0) ++ (chunk points for y0+1); ONE MXU contraction
        # extracts BOTH corner rows of every point
        y_two = jnp.concatenate([y0, y0 + 1], axis=1)    # [1, 2c]
        if bf16x2:
            # one-hots are exact in bf16; the image rides a hi+lo split
            # (relative error ~2^-16): two bf16 MXU passes replace the
            # 6-pass fp32 HIGHEST contraction — the bf16x2 loss recipe
            # (PERFORMANCE.md round 3), opt-in via --loss-precision.
            # bf16x2='x1' keeps only the hi pass (~2^-8 relative — the
            # bf16x1 mode, accuracy-validated separately in ACCURACY.md)
            rowsT = (row_iota == y_two).astype(jnp.bfloat16)
            img_hi = img.astype(jnp.bfloat16)
            if bf16x2 == 'x1':
                parts = (img_hi,)
            else:
                parts = (img_hi,
                         (img - img_hi.astype(jnp.float32))
                         .astype(jnp.bfloat16))
            vals = jnp.zeros((width, 2 * chunk), jnp.float32)
            for part in parts:
                vals += jax.lax.dot_general(
                    part, rowsT,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [W, 2c]
        else:
            rowsT = (row_iota == y_two).astype(jnp.float32)  # [H, 2c]
            vals = jax.lax.dot_general(
                img, rowsT, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)     # [W, 2c]

        x_two = jnp.concatenate([x0, x0], axis=1)        # [1, 2c]
        m0 = (col_iota == x_two).astype(jnp.float32)     # [W, 2c]
        m1 = (col_iota == x_two + 1).astype(jnp.float32)
        c0 = jnp.sum(vals * m0, axis=0, keepdims=True)   # [1, 2c]
        c1 = jnp.sum(vals * m1, axis=0, keepdims=True)

        out_ref[n:n + 1, :] = c0[:, :chunk]              # V00
        out_ref[batch + n:batch + n + 1, :] = c1[:, :chunk]      # V01
        out_ref[2 * batch + n:2 * batch + n + 1, :] = c0[:, chunk:]  # V10
        out_ref[3 * batch + n:3 * batch + n + 1, :] = c1[:, chunk:]  # V11


@functools.partial(jax.jit,
                   static_argnames=('chunk', 'interpret', 'bf16x2'))
def corner_values_pallas(images, iy, ix, chunk=512, interpret=False,
                         bf16x2=False):
    """All four bilinear corner values on the MXU, one kernel launch.

    Args:
        images: ``[N, 1, H, W]`` float32 frames (grayscale — the
            photometric-loss case).
        iy, ix: ``[N, P]`` float32 unnormalized sampling coordinates.
        chunk: points per grid step (lane-axis length; multiple of 128).
        bf16x2: contract with a hi+lo bf16 image split (2 MXU passes,
            ~2^-16 relative error) instead of fp32 HIGHEST (6 passes).

    Returns:
        V: ``[2, 2, N, P, 1]`` corner values (a = y-corner, b = x-corner),
        zeros for out-of-image corners — identical to
        ``ops.warp._corner_values``.
    """
    N, C, H, W = images.shape
    assert C == 1, 'pallas warp path is single-channel (grayscale frames)'
    P = iy.shape[1]
    chunk = min(chunk, _round_up(P, 128))
    pad = (-P) % chunk
    if pad:
        # -10 sits outside every image: all-zero one-hots for padding
        iy = jnp.pad(iy, ((0, 0), (0, pad)), constant_values=-10.0)
        ix = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-10.0)
    Pp = P + pad
    n_chunks = Pp // chunk

    kernel = functools.partial(_kernel, height=H, width=W, chunk=chunk,
                               batch=N, bf16x2=bf16x2)
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, H, W), lambda k: (0, 0, 0)),
            pl.BlockSpec((N, chunk), lambda k: (0, k)),
            pl.BlockSpec((N, chunk), lambda k: (0, k)),
        ],
        out_specs=pl.BlockSpec((4 * N, chunk), lambda k: (0, k)),
        out_shape=jax.ShapeDtypeStruct((4 * N, Pp), jnp.float32),
        interpret=interpret,
    )(images.reshape(N, H, W), iy, ix)
    # corner-major rows [4*N, Pp] -> [2, 2, N, P, 1]
    V = out.reshape(2, 2, N, Pp, 1)[:, :, :, :P]
    return V


def _round_up(v, m):
    return (v + m - 1) // m * m
