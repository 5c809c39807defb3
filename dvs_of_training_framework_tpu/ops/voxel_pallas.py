"""Pallas TPU voxelization kernel.

Replaces the XLA scatter-add (and its backward gather) for the event ->
voxel-grid binning — the framework's hot irregular op.  Strategy: one grid
step per (sample, element) plane; the plane's ``[H, W*C]`` accumulator
lives in VMEM; events stream in fixed-size chunks by DMA from HBM using
scalar-prefetched per-plane offsets (events are sample-major sorted, so a
plane's events are one contiguous range); each chunk turns into a dense
one-hot row matrix and a weighted column matrix multiplied on the MXU::

    accum[H, W*C] += onehot_y[chunk, H]^T @ (tile_C(w)[chunk, W*C]
                                             * onehot_x[chunk, W*C])

The backward pass reuses the same structure: per plane, the incoming
gradient block ``[H, W*C]`` sits in VMEM and each event chunk computes
``dW[e, c] = g[y_e, x_e*C + c]`` as one MXU contraction plus a masked
reduction — no HBM gather.

``voxelize_pallas`` wires both into a ``jax.custom_vjp`` drop-in for
``ops.voxel.voxelize_scatter`` (float32-exact: all contractions accumulate
in fp32).  Interpret mode keeps the kernels testable on CPU.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return (v + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------

def _fwd_kernel(offsets_ref,               # scalar prefetch: i32[P+1]
                x_hbm, y_hbm, w_hbm,       # HBM: i32[Ep], i32[Ep], f32[Ep,C]
                out_ref,                   # VMEM block: f32[1, H, W*C]
                x_v, y_v, w_v, sem,        # scratch
                *, chunk, height, width, channels):
    p = pl.program_id(0)
    start = offsets_ref[p]
    end = offsets_ref[p + 1]
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    wc = width * channels
    col_w = jax.lax.broadcasted_iota(jnp.int32, (chunk, wc), 1) // channels

    def body(k, _):
        base = start + k * chunk
        cp_x = pltpu.make_async_copy(x_hbm.at[pl.ds(base, chunk)], x_v,
                                     sem.at[0])
        cp_y = pltpu.make_async_copy(y_hbm.at[pl.ds(base, chunk)], y_v,
                                     sem.at[1])
        cp_w = pltpu.make_async_copy(w_hbm.at[pl.ds(base, chunk), :], w_v,
                                     sem.at[2])
        cp_x.start()
        cp_y.start()
        cp_w.start()
        cp_x.wait()
        cp_y.wait()
        cp_w.wait()

        idx = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        evalid = (idx < end).astype(jnp.float32)          # [chunk, 1]

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, height), 1)
        rows = (y_v[:].reshape(chunk, 1) == row_iota)
        rows = rows.astype(jnp.float32) * evalid          # [chunk, H]

        # weighted columns: w[e, c] at column x_e * C + c
        wtile = jnp.broadcast_to(w_v[:][:, None, :],
                                 (chunk, width, channels)).reshape(chunk, wc)
        colmask = (x_v[:].reshape(chunk, 1) == col_w).astype(jnp.float32)
        wcols = wtile * colmask                           # [chunk, W*C]

        contrib = jax.lax.dot_general(
            rows, wcols, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [H, W*C]
        out_ref[0] += contrib
        return 0

    n_chunks = pl.cdiv(end - start, chunk)
    jax.lax.fori_loop(0, n_chunks, body, 0)


# ---------------------------------------------------------------------------
# Backward kernel (gradient w.r.t. the per-event channel weights).
# ---------------------------------------------------------------------------

def _bwd_kernel(offsets_ref,               # i32[P+1]
                x_hbm, y_hbm, g_hbm,       # i32[Ep], i32[Ep], f32[P, H, W*C]
                dw_ref,                    # VMEM out block: f32[chunk, C]
                x_v, y_v, g_v, sem,        # scratch
                *, chunk, height, width, channels, num_planes):
    """Grid: (n_total_chunks,).  Chunk c covers events
    [c*chunk, (c+1)*chunk); its plane is looked up per event, but since a
    chunk may straddle a plane boundary, the kernel loads the grad plane of
    the *first* event and masks events belonging to other planes; straddled
    tails are handled because chunks are aligned so each chunk touches at
    most ... — instead, simpler: grid is (num_planes,) like the forward and
    dW is written back per event-range with dynamic stores.

    This kernel uses the forward's plane-major structure: one grid step per
    plane; for each event chunk of that plane compute
    ``tmp = rows @ g_plane`` ([chunk, W*C]) and reduce the masked columns
    to ``dW [chunk, C]``, then DMA the slice back to HBM output.
    """
    p = pl.program_id(0)
    start = offsets_ref[p]
    end = offsets_ref[p + 1]

    wc = width * channels
    col_w = jax.lax.broadcasted_iota(jnp.int32, (chunk, wc), 1) // channels

    # grad plane for this grid step is already in VMEM via block spec g_v
    def body(k, _):
        base = start + k * chunk
        cp_x = pltpu.make_async_copy(x_hbm.at[pl.ds(base, chunk)], x_v,
                                     sem.at[0])
        cp_y = pltpu.make_async_copy(y_hbm.at[pl.ds(base, chunk)], y_v,
                                     sem.at[1])
        cp_x.start()
        cp_y.start()
        cp_x.wait()
        cp_y.wait()

        idx = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        evalid = (idx < end).astype(jnp.float32)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, height), 1)
        rows = (y_v[:].reshape(chunk, 1) == row_iota)
        rows = rows.astype(jnp.float32) * evalid          # [chunk, H]

        tmp = jax.lax.dot_general(
            rows, g_hbm[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [chunk, W*C]
        colmask = (x_v[:].reshape(chunk, 1) == col_w).astype(jnp.float32)
        dw = (tmp * colmask).reshape(chunk, width, channels).sum(axis=1)

        # store the chunk's gradient back to HBM (fill the staging buffer
        # before the copy starts)
        g_v[...] = dw
        cp_o = pltpu.make_async_copy(g_v, dw_ref.at[pl.ds(base, chunk), :],
                                     sem.at[2])
        cp_o.start()
        cp_o.wait()
        return 0

    n_chunks = pl.cdiv(end - start, chunk)
    jax.lax.fori_loop(0, n_chunks, body, 0)


# ---------------------------------------------------------------------------
# Host-side wiring.
# ---------------------------------------------------------------------------

def _plane_offsets(plane, valid, num_planes, total):
    """Contiguous [start, end) event range per plane.

    Events are sample-major sorted (collation invariant); padding events sit
    at the tail.  Offsets index the *padded* arrays; padding is excluded by
    clamping ends to the valid count.
    """
    n_valid = valid.sum()
    plane_clipped = jnp.where(jnp.arange(plane.shape[0]) < n_valid,
                              plane, num_planes)
    offsets = jnp.searchsorted(plane_clipped,
                               jnp.arange(num_planes + 1, dtype=jnp.int32),
                               side='left').astype(jnp.int32)
    return jnp.minimum(offsets, total)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def voxelize_pallas(x, y, plane, weights, valid,
                    num_planes, height, width, chunk=256, interpret=False):
    """Pallas voxelization: drop-in for ``voxelize_scatter``.

    Args match ``ops.voxel.voxelize_scatter`` (events must be plane-major
    sorted — true for collated batches); returns
    ``[num_planes, height, width, C]`` float32.
    """
    out, _ = _fwd(x, y, plane, weights, valid,
                  num_planes, height, width, chunk, interpret)
    return out


def _prep(x, y, plane, weights, valid, num_planes, chunk):
    E, C = weights.shape
    Ep = _round_up(E, chunk) + chunk   # slack so chunked DMA never overruns
    pad = Ep - E
    x = jnp.pad(x.astype(jnp.int32), (0, pad))
    y = jnp.pad(y.astype(jnp.int32), (0, pad))
    w = jnp.pad(weights.astype(jnp.float32), ((0, pad), (0, 0)))
    offsets = _plane_offsets(plane, valid, num_planes, E)
    return x, y, w, offsets, C


def _fwd(x, y, plane, weights, valid,
         num_planes, height, width, chunk, interpret):
    xp, yp, wp, offsets, C = _prep(x, y, plane, weights, valid,
                                   num_planes, chunk)
    wc = width * C

    kernel = functools.partial(_fwd_kernel, chunk=chunk, height=height,
                               width=width, channels=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_planes,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, height, wc), lambda p, off: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, C), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ])
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_planes, height, wc),
                                       jnp.float32),
        interpret=interpret,
    )(offsets, xp, yp, wp)
    out = out.reshape(num_planes, height, width, C)
    residuals = (x, y, plane, valid)
    return out, residuals


def _fwd_vjp(x, y, plane, weights, valid,
             num_planes, height, width, chunk, interpret):
    out, residuals = _fwd(x, y, plane, weights, valid,
                          num_planes, height, width, chunk, interpret)
    return out, residuals


def _bwd_vjp(num_planes, height, width, chunk, interpret, residuals, g):
    x, y, plane, valid = residuals
    E = x.shape[0]
    C = g.shape[-1]
    xp, yp, _, offsets, _ = _prep(x, y, plane,
                                  jnp.zeros((E, C), jnp.float32), valid,
                                  num_planes, chunk)
    Ep = xp.shape[0]
    wc = width * C
    g2 = g.reshape(num_planes, height, wc).astype(jnp.float32)

    kernel = functools.partial(_bwd_kernel, chunk=chunk, height=height,
                               width=width, channels=C,
                               num_planes=num_planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_planes,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, height, wc), lambda p, off: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, C), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ])
    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ep, C), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, xp, yp, g2)
    # where() not multiply: rows past the last written chunk are
    # uninitialised (NaN) and 0*NaN would propagate
    dw = jnp.where(valid[:, None], dw[:E], 0.0)
    # x, y, plane, weights, valid
    return None, None, None, dw, None


voxelize_pallas.defvjp(_fwd_vjp, _bwd_vjp)
