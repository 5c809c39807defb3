"""Pallas TPU voxelization kernel.

Replaces the XLA scatter-add (and its backward gather) for the event ->
voxel-grid binning — the framework's hot irregular op.  Strategy: one grid
step per (sample, element) plane; the plane's ``[H, C*W]`` accumulator
lives in VMEM; events stream in fixed-size chunks by DMA from HBM using
scalar-prefetched per-plane offsets (events are sample-major sorted, so a
plane's events are one contiguous range); each chunk turns into a dense
one-hot row matrix and a weighted column matrix multiplied on the MXU::

    accum[H, C*W] += onehot_y[chunk, H]^T @ wcols[chunk, C*W]
    wcols[:, c*W:(c+1)*W] = w[:, c:c+1] * onehot_x[chunk, W]

TPU-shape discipline (Mosaic constraints discovered the hard way):
- all in-kernel vectors are 2-D with 128-aligned minor dims,
- event records are packed host-side into one ``[Ep, 128]`` float32 array
  (columns: x, y, w_0..w_{C-1}, zeros) so each chunk is ONE aligned DMA,
- columns are channel-major (``c*W + x``) to avoid 3-D shape casts; the
  host wrapper transposes the result back to ``[P, H, W, C]``.

The backward pass mirrors the structure: per plane, the incoming gradient
block ``[H, C*W]`` sits in VMEM and each event chunk computes
``dW[e, c] = g[y_e, c*W + x_e]`` as one MXU contraction plus per-channel
masked reductions — no HBM gather.  ``voxelize_pallas`` wires both into a
``jax.custom_vjp`` drop-in for ``ops.voxel.voxelize_scatter``
(float32-exact: contractions run at ``Precision.HIGHEST``).  Interpret
mode keeps the kernels testable on CPU.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(v, m):
    return (v + m - 1) // m * m


def _onehot_rows(y_col, end, base, chunk, height):
    """[chunk, H] one-hot of y with rows beyond the event range zeroed."""
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    evalid = (idx < end).astype(jnp.float32)              # [chunk, 1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, height), 1)
    rows = (y_col.astype(jnp.int32) == row_iota).astype(jnp.float32)
    return rows * evalid


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------

def _fwd_kernel(offsets_ref,               # scalar prefetch: i32[P+1]
                ev_hbm,                    # HBM: f32[Ep, 128] packed events
                out_ref,                   # VMEM block: f32[1, H, C*W]
                ev_v, sem,                 # scratch (double-buffered)
                *, chunk, height, width, channels, single_pass=False):
    p = pl.program_id(0)
    start = offsets_ref[p]
    end = offsets_ref[p + 1]
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, width), 1)
    n_chunks = pl.cdiv(end - start, chunk)

    def in_dma(slot, k):
        return pltpu.make_async_copy(
            ev_hbm.at[pl.ds(start + k * chunk, chunk), :],
            ev_v.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        in_dma(0, 0).start()

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < n_chunks)
        def _():
            in_dma((k + 1) % 2, k + 1).start()

        in_dma(slot, k).wait()

        base = start + k * chunk
        ev = ev_v[slot]
        rows = _onehot_rows(ev[:, 1:2], end, base, chunk, height) \
            .astype(jnp.bfloat16)                 # 0/1: exact in bf16
        xmask = (ev[:, 0:1].astype(jnp.int32)
                 == col_iota).astype(jnp.bfloat16)
        # bf16x2 weight split: w = hi + lo to ~2^-16 relative, so two
        # bf16 MXU passes replace the 6-pass fp32 HIGHEST contraction.
        # single_pass: the incoming weights are already bf16-valued
        # (recipe mode) — w_lo is identically zero, skip its pass.
        w32 = ev[:, 2:2 + channels]
        w_hi = w32.astype(jnp.bfloat16)
        parts = (w_hi,) if single_pass else (
            w_hi, (w32 - w_hi.astype(jnp.float32)).astype(jnp.bfloat16))
        contrib = jnp.zeros((height, channels * width), jnp.float32)
        for part in parts:
            # channel-major weighted columns [chunk, C*W]; products of
            # bf16 one-hots with bf16 weights are exact
            wcols = jnp.concatenate(
                [part[:, c:c + 1] * xmask for c in range(channels)],
                axis=1)
            contrib += jax.lax.dot_general(
                rows, wcols, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [H, C*W]
        out_ref[0] += contrib
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


# ---------------------------------------------------------------------------
# Backward kernel (gradient w.r.t. the per-event channel weights).
# ---------------------------------------------------------------------------

def _bwd_kernel(offsets_ref,               # i32[P+1]
                ev_hbm, g_ref,             # f32[Ep,128], VMEM f32[1,H,C*W]
                dw_ref,                    # HBM out: f32[Ep, 128]
                ev_v, dw_v, sem, out_sem,  # scratch (double-buffered)
                *, chunk, height, width, channels, single_pass=False):
    p = pl.program_id(0)
    start = offsets_ref[p]
    end = offsets_ref[p + 1]

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, width), 1)
    n_chunks = pl.cdiv(end - start, chunk)

    def in_dma(slot, k):
        return pltpu.make_async_copy(
            ev_hbm.at[pl.ds(start + k * chunk, chunk), :],
            ev_v.at[slot], sem.at[slot])

    def out_dma(slot, k):
        return pltpu.make_async_copy(
            dw_v.at[slot],
            dw_ref.at[pl.ds(start + k * chunk, chunk), :],
            out_sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        in_dma(0, 0).start()

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < n_chunks)
        def _():
            in_dma((k + 1) % 2, k + 1).start()

        in_dma(slot, k).wait()

        base = start + k * chunk
        ev = ev_v[slot]
        rows = _onehot_rows(ev[:, 1:2], end, base, chunk, height) \
            .astype(jnp.bfloat16)
        g_plane = g_ref[0]
        g_hi = g_plane.astype(jnp.bfloat16)
        # single_pass: the primal weights were bf16, so the returned
        # cotangent is rounded to bf16 anyway — the lo half of g is
        # below that rounding and its pass is skipped
        parts = (g_hi,) if single_pass else (
            g_hi, (g_plane - g_hi.astype(jnp.float32)).astype(jnp.bfloat16))
        tmp = jnp.zeros((chunk, channels * width), jnp.float32)
        for part in parts:
            tmp += jax.lax.dot_general(
                rows, part,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [chunk, C*W]
        xmask = (ev[:, 0:1].astype(jnp.int32)
                 == col_iota).astype(jnp.float32)

        # the slot's previous store must have drained before reuse
        @pl.when(k >= 2)
        def _():
            out_dma(slot, k - 2).wait()

        dw_v[slot] = jnp.zeros((chunk, _LANE), jnp.float32)
        for c in range(channels):
            dw_v[slot, :, c:c + 1] = jnp.sum(
                tmp[:, c * width:(c + 1) * width] * xmask,
                axis=1, keepdims=True)
        out_dma(slot, k).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(n_chunks >= 2)
    def _():
        out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()


# ---------------------------------------------------------------------------
# Host-side wiring.
# ---------------------------------------------------------------------------

def _plane_offsets(plane, valid, num_planes, total):
    """Contiguous [start, end) event range per plane (plane-major sorted;
    padding at the tail)."""
    n_valid = valid.sum()
    plane_clipped = jnp.where(jnp.arange(plane.shape[0]) < n_valid,
                              plane, num_planes)
    offsets = jnp.searchsorted(plane_clipped,
                               jnp.arange(num_planes + 1, dtype=jnp.int32),
                               side='left').astype(jnp.int32)
    return jnp.minimum(offsets, total)


def _pack_events(x, y, weights, num_planes, plane, valid, chunk):
    """Pack (x, y, w_0..w_{C-1}) into a DMA-aligned [Ep, 128] f32 array.

    One concatenate + pad (a single 67 MB write at bench shapes) — NOT a
    chain of ``.at[].set`` dynamic-update-slices, which re-wrote the full
    buffer once per column group (~1.3 ms/step profiled, round 3).
    """
    E, C = weights.shape
    assert C <= _LANE - 2, f'at most {_LANE - 2} channels supported'
    Ep = _round_up(E, chunk) + chunk   # slack so chunked DMA never overruns
    cols = jnp.concatenate([x.astype(jnp.float32)[:, None],
                            y.astype(jnp.float32)[:, None],
                            weights.astype(jnp.float32)], axis=1)
    packed = jnp.pad(cols, ((0, Ep - E), (0, _LANE - 2 - C)))
    offsets = _plane_offsets(plane, valid, num_planes, E)
    return packed, offsets, C, Ep


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


def _fwd(x, y, plane, weights, valid,
         num_planes, height, width, chunk, interpret):
    packed, offsets, C, Ep = _pack_events(x, y, weights, num_planes, plane,
                                          valid, chunk)
    cw = C * width

    # bf16-valued weights (recipe mode) have an identically-zero lo
    # split: run the contraction single-pass (same result, half the MXU
    # and mask work)
    single = weights.dtype == jnp.bfloat16
    kernel = functools.partial(_fwd_kernel, chunk=chunk, height=height,
                               width=width, channels=C,
                               single_pass=single)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_planes,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, height, cw), lambda p, off: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_planes, height, cw),
                                       jnp.float32),
        interpret=interpret,
    )(offsets, packed)
    # channel-major [P, H, C, W] -> [P, H, W, C]
    out = out.reshape(num_planes, height, C, width).transpose(0, 1, 3, 2)
    # the backward kernel reads only the x/y columns of the packed
    # records, so the forward's packed buffer and offsets are carried as
    # residuals instead of re-packing (a full [Ep, 128] write at bench
    # shapes); the empty array is a dtype carrier (residual pytrees may
    # only hold arrays)
    residuals = (packed, offsets, valid, jnp.zeros((0,), weights.dtype))
    return out, residuals


def _fwd_vjp(x, y, plane, weights, valid,
             num_planes, height, width, chunk, interpret):
    return _fwd(x, y, plane, weights, valid,
                num_planes, height, width, chunk, interpret)


def _bwd_vjp(num_planes, height, width, chunk, interpret, residuals, g):
    packed, offsets, valid, w_proto = residuals
    E = valid.shape[0]
    C = g.shape[-1]
    Ep = packed.shape[0]
    cw = C * width
    # [P, H, W, C] -> channel-major [P, H, C*W]
    g2 = g.transpose(0, 1, 3, 2).reshape(num_planes, height, cw) \
        .astype(jnp.float32)

    kernel = functools.partial(_bwd_kernel, chunk=chunk, height=height,
                               width=width, channels=C,
                               single_pass=w_proto.dtype == jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_planes,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, height, cw), lambda p, off: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _LANE), jnp.float32),
            pltpu.VMEM((2, chunk, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ep, _LANE), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, packed, g2)
    # where() not multiply: rows past the last written chunk are
    # uninitialised (NaN) and 0*NaN would propagate
    dw = jnp.where(valid[:, None], dw[:E, :C], 0.0)
    # x, y, plane, weights, valid — the cotangent must match the primal
    # weights dtype (bf16 model dtype feeds bf16 weights in)
    return None, None, None, dw.astype(w_proto.dtype), None


voxelize_pallas.defvjp(_fwd_vjp, _bwd_vjp)
