"""Pallas TPU kernel for the per-event temporal-kernel MLP.

The quantization layer evaluates a 1 -> hidden -> hidden -> 1 tanh MLP at
every (event, channel) pair (EVFlowNet/net.py QuantizationLayer; the
learnable event representation, reference analogue: the trainable
quantization layer loaded by /root/reference/train_flownet.py:50-54).
In XLA that is three dots over a ``[E*C, hidden]`` activation matrix that
round-trips HBM in both passes — measured **4.4 ms of the 19.9 ms recipe
step** (scripts/benchmarks/ab_mlp_cost.py, v5e).  The arithmetic is tiny;
the cost is pure bandwidth.

Kernel layout:

- the (event, channel) axis rides the LANES: inputs arrive as
  ``[ROWS, chunk]`` blocks of the flattened delta array;
- the hidden axis rides the SUBLANES.  A naive [32, chunk] formulation
  uses 32x32 of the 128x128 MXU (one point per cycle per layer) and
  measured MXU-latency-bound — v1 of this kernel was ~1.7 ms/step
  SLOWER than XLA.  v2 packs **4 block-diagonal point groups** per
  contraction: four delta rows broadcast to a ``[128, chunk]`` stack,
  ``W2`` tiled block-diagonally to ``[128, 128]``, so every MXU pass
  advances 4 points per lane column (15/16 of the K axis live);
- dots run at DEFAULT precision (bf16 passthrough on TPU — exactly what
  the XLA ``nn.Dense`` path does for these matmuls; interpret mode on
  CPU is plain f32, which the tests pin);
- the backward pass recomputes ``h1``/``h2`` per block (cheap, saves
  residual traffic) and accumulates parameter gradients into two
  constant-index output blocks (zeroed at the first grid step, flushed
  once at the end); the host sums the 4 group copies and unpads.

Parameter gradients come back packed: ``dW2`` as the [128, 128] group
matrix (host sums the 4 diagonal 32x32 blocks), the vector grads in a
[128, 128] carrier (see ``_unpack_grads``).

Measured in the full recipe step on v5e (profile_step_trace.py with
BENCH_KERNEL_MLP=pallas): fwd 0.17 ms + bwd 0.38 ms — the XLA Dense
form cost ~4 ms in-program because every [E*C, 30] intermediate (and
the [E, 9] event tensors around it) round-tripped HBM in padded
layouts.  The channel-major [C, E] orientation of the quantization
layer (EVFlowNet/net.py) is part of the same fix.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128
_HP = 32          # padded hidden size per group (sublane axis)
_G = 4            # block-diagonal point groups per contraction
_ROWS = 16        # delta rows per input block (multiple of _G)

# vector-carrier column layout ([128, 128] float32)
_C_W1T = slice(0, 1)      # w1 tiled x4        [128, 1]
_C_B1T = slice(1, 2)      # b1 tiled x4
_C_W3T = slice(2, 3)      # w3 tiled x4
_C_B2T = slice(3, 4)      # b2 tiled x4
_C_W3BD = slice(4, 4 + _G)    # w3 block-diag columns [128, 4]
_C_W1BD = slice(8, 8 + _G)    # w1 block-diag columns [128, 4]
# (b3 is a scalar: added on the host after the kernel — Mosaic has no
# two-axis scalar broadcast; its gradient is a plain sum, also host-side)

# gradient vector-carrier columns
_C_DW1 = slice(0, 1)
_C_DB1 = slice(1, 2)
_C_DW3 = slice(2, 2 + _G)     # dw3 per group g in column 2+g
_C_DB2 = slice(6, 7)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _stack_groups(d_ref, r):
    """Rows r.._G-1 of the block, each broadcast x_HP -> [128, chunk]."""
    parts = [jnp.broadcast_to(d_ref[r + g:r + g + 1, :],
                              (_HP, d_ref.shape[1]))
             for g in range(_G)]
    return jnp.concatenate(parts, axis=0)


def _mlp_stack(v_ref, w2_ref, dstack):
    """Forward for a [128, chunk] 4-group delta stack."""
    w1t = v_ref[:, _C_W1T]
    b1t = v_ref[:, _C_B1T]
    b2t = v_ref[:, _C_B2T]
    w3bd = v_ref[:, _C_W3BD]                 # [128, 4]
    h1 = jnp.tanh(w1t * dstack + b1t)        # [128, chunk]
    z2 = jax.lax.dot_general(
        w2_ref[...], h1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2t
    h2 = jnp.tanh(z2)
    k4 = jax.lax.dot_general(
        w3bd, h2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [4, chunk]
    return h1, h2, k4


def _fwd_kernel(d_ref, w2_ref, v_ref, out_ref, *, rows):
    for r in range(0, rows, _G):
        dstack = _stack_groups(d_ref, r)
        _, _, k4 = _mlp_stack(v_ref, w2_ref, dstack)
        out_ref[r:r + _G, :] = k4


def _bwd_kernel(d_ref, w2_ref, v_ref, g_ref,
                dd_ref, dw2_ref, dv_ref, *, rows):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    w1bd = v_ref[:, _C_W1BD]                 # [128, 4]
    w3t = v_ref[:, _C_W3T]                   # [128, 1]
    for r in range(0, rows, _G):
        dstack = _stack_groups(d_ref, r)
        g4 = g_ref[r:r + _G, :]              # [4, chunk] cotangent of k
        gstack = _stack_groups(g_ref, r)     # [128, chunk]
        h1, h2, _ = _mlp_stack(v_ref, w2_ref, dstack)
        # k = w3^T h2 + b3 (per group)
        dh2 = w3t * gstack                   # [128, chunk]
        dz2 = dh2 * (1.0 - h2 * h2)
        dw3_4 = jax.lax.dot_general(
            h2, g4, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [128, 4]
        # z2 = W2^T h1 + b2  ->  dW2[h, i] = sum_l h1[h, l] dz2[i, l]
        dw2_4 = jax.lax.dot_general(
            h1, dz2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [128, 128]
        db2_4 = jnp.sum(dz2, axis=1, keepdims=True)  # [128, 1]
        dh1 = jax.lax.dot_general(
            w2_ref[...], dz2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [128, chunk]
        dz1 = dh1 * (1.0 - h1 * h1)
        dw1_4 = jnp.sum(dz1 * dstack, axis=1, keepdims=True)  # [128, 1]
        db1_4 = jnp.sum(dz1, axis=1, keepdims=True)
        dd_ref[r:r + _G, :] = jax.lax.dot_general(
            w1bd, dz1, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [4, chunk]

        dw2_ref[...] += dw2_4
        dv_ref[:, _C_DW1] += dw1_4
        dv_ref[:, _C_DB1] += db1_4
        dv_ref[:, _C_DW3] += dw3_4
        dv_ref[:, _C_DB2] += db2_4


def _pack_params(w1, b1, w2, b2, w3):
    """(w2_blockdiag [128, 128], vectors [128, 128]) float32 carriers."""
    hd = w2.shape[0]
    w2p = jnp.zeros((_HP, _HP), jnp.float32)
    w2p = w2p.at[:hd, :hd].set(w2.astype(jnp.float32))
    w2bd = jax.scipy.linalg.block_diag(*([w2p] * _G))        # [128, 128]

    col = jnp.zeros((_HP, 1), jnp.float32)
    w1c = col.at[:hd, 0].set(w1.astype(jnp.float32).reshape(hd))
    b1c = col.at[:hd, 0].set(b1.astype(jnp.float32).reshape(hd))
    w3c = col.at[:hd, 0].set(w3.astype(jnp.float32).reshape(hd))
    b2c = col.at[:hd, 0].set(b2.astype(jnp.float32).reshape(hd))

    v = jnp.zeros((_G * _HP, _LANE), jnp.float32)
    v = v.at[:, _C_W1T].set(jnp.tile(w1c, (_G, 1)))
    v = v.at[:, _C_B1T].set(jnp.tile(b1c, (_G, 1)))
    v = v.at[:, _C_W3T].set(jnp.tile(w3c, (_G, 1)))
    v = v.at[:, _C_B2T].set(jnp.tile(b2c, (_G, 1)))
    for g in range(_G):
        v = v.at[g * _HP:(g + 1) * _HP, 4 + g:5 + g].set(w3c)
        v = v.at[g * _HP:(g + 1) * _HP, 8 + g:9 + g].set(w1c)
    return w2bd, v


def _unpack_grads(dw2_pk, dv, hd):
    """Sum the 4 group copies and unpad."""
    dw2 = sum(dw2_pk[g * _HP:g * _HP + hd, g * _HP:g * _HP + hd]
              for g in range(_G))
    seg = [dv[g * _HP:g * _HP + hd, :] for g in range(_G)]
    dw1 = sum(s[:, _C_DW1] for s in seg).reshape(1, hd)
    db1 = sum(s[:, _C_DB1] for s in seg).reshape(hd)
    dw3 = sum(seg[g][:, 2 + g:3 + g] for g in range(_G)).reshape(hd, 1)
    db2 = sum(s[:, _C_DB2] for s in seg).reshape(hd)
    return dw1, db1, dw2, db2, dw3


def _blocks(flat, chunk):
    """[n] -> ([M, chunk], grid) padded to whole [ROWS, chunk] blocks."""
    n = flat.shape[0]
    block = _ROWS * chunk
    np_ = _round_up(max(n, 1), block)
    flat = jnp.pad(flat, (0, np_ - n))
    return flat.reshape(np_ // chunk, chunk), np_ // block


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def kernel_mlp_pallas(delta, w1, b1, w2, b2, w3, b3,
                      chunk=512, interpret=False):
    """tanh MLP ``1 -> hd -> hd -> 1`` over every element of ``delta``.

    Args:
        delta: any-shape float array (the per-(event, channel) kernel
            argument ``t_norm - center``).
        w1: ``[1, hd]``; b1: ``[hd]``; w2: ``[hd, hd]``; b2: ``[hd]``;
        w3: ``[hd, 1]``; b3: ``[1]`` — the three Dense layers' params
        (any float dtype; dots run at DEFAULT precision like nn.Dense).

    Returns:
        float32 array shaped like ``delta``:
        ``w3^T tanh(W2^T tanh(w1 delta + b1) + b2) + b3``.
    """
    out, _ = _fwd(delta, w1, b1, w2, b2, w3, b3, chunk, interpret)
    return out


def _fwd(delta, w1, b1, w2, b2, w3, b3, chunk, interpret):
    assert w2.shape[0] == w2.shape[1] and w2.shape[0] <= _HP, \
        f'hidden size must be <= {_HP}'
    shape = delta.shape
    flat = delta.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    d2, grid = _blocks(flat, chunk)
    w2bd, vec = _pack_params(w1, b1, w2, b2, w3)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rows=_ROWS),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
            pl.BlockSpec((_G * _HP, _G * _HP), lambda k: (0, 0)),
            pl.BlockSpec((_G * _HP, _LANE), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct(d2.shape, jnp.float32),
        interpret=interpret,
    )(d2, w2bd, vec)
    out = out.reshape(-1)[:n].reshape(shape)
    out = out + b3.astype(jnp.float32).reshape(())
    return out, (delta, w1, b1, w2, b2, w3, b3)


def _fwd_vjp(delta, w1, b1, w2, b2, w3, b3, chunk, interpret):
    return _fwd(delta, w1, b1, w2, b2, w3, b3, chunk, interpret)


def _bwd_vjp(chunk, interpret, residuals, g):
    delta, w1, b1, w2, b2, w3, b3 = residuals
    hd = w2.shape[0]
    shape = delta.shape
    flat = delta.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    d2, grid = _blocks(flat, chunk)
    # padded rows carry g = 0 -> no spurious parameter gradient
    g2, _ = _blocks(g.reshape(-1).astype(jnp.float32), chunk)
    w2bd, vec = _pack_params(w1, b1, w2, b2, w3)
    dd, dw2_pk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, rows=_ROWS),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
            pl.BlockSpec((_G * _HP, _G * _HP), lambda k: (0, 0)),
            pl.BlockSpec((_G * _HP, _LANE), lambda k: (0, 0)),
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
            pl.BlockSpec((_G * _HP, _G * _HP), lambda k: (0, 0)),
            pl.BlockSpec((_G * _HP, _LANE), lambda k: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(d2.shape, jnp.float32),
            jax.ShapeDtypeStruct((_G * _HP, _G * _HP), jnp.float32),
            jax.ShapeDtypeStruct((_G * _HP, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(d2, w2bd, vec, g2)
    d_delta = dd.reshape(-1)[:n].reshape(shape).astype(delta.dtype)
    dw1, db1, dw2, db2, dw3 = _unpack_grads(dw2_pk, dv, hd)
    db3 = jnp.sum(g.astype(jnp.float32)).reshape(1)
    return (d_delta,
            dw1.astype(w1.dtype).reshape(w1.shape),
            db1.astype(b1.dtype).reshape(b1.shape),
            dw2.astype(w2.dtype).reshape(w2.shape),
            db2.astype(b2.dtype).reshape(b2.shape),
            dw3.astype(w3.dtype).reshape(w3.shape),
            db3.astype(b3.dtype).reshape(b3.shape))


kernel_mlp_pallas.defvjp(_fwd_vjp, _bwd_vjp)
