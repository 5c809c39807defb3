"""Pallas TPU kernel for the per-event temporal-kernel MLP.

The quantization layer evaluates a 1 -> hidden -> hidden -> 1 tanh MLP at
every (event, channel) pair (EVFlowNet/net.py QuantizationLayer; the
learnable event representation, reference analogue: the trainable
quantization layer loaded by /root/reference/train_flownet.py:50-54).
In XLA that is three dots over a ``[E*C, hidden]`` activation matrix that
round-trips HBM in both passes — measured **4.4 ms of the 19.9 ms recipe
step** (scripts/benchmarks/ab_mlp_cost.py, v5e).  The arithmetic is tiny;
the cost is pure bandwidth.

This kernel keeps every activation in VMEM:

- the (event, channel) axis rides the LANES: inputs arrive as
  ``[8, chunk]`` blocks of the flattened delta array, each sublane row is
  processed by a statically unrolled loop;
- the hidden axis rides the SUBLANES (padded to 32): ``h1`` is an outer
  product ``w1[:, None] * delta[None, :]``, the two inner dots contract
  sublanes on the MXU, and nothing ever leaves VMEM;
- the backward pass recomputes ``h1``/``h2`` per block (cheap, saves
  residual traffic) and accumulates the six parameter gradients into a
  VMEM output block whose index map is constant — zeroed at the first
  grid step, flushed once at the end (d_delta streams out per block).

Parameters are packed into one ``[32, 128]`` float32 carrier (columns:
w2 | w1 | b1 | w3 | b2 | b3) so the kernel has a single small VMEM
parameter input; gradients come back in the same layout.

Numerics: all in-kernel math is float32 with HIGHEST-precision dots —
slightly *more* exact than the XLA path, whose ``nn.Dense`` dots run in
the model dtype (bf16 under the recipe).  Interpret mode keeps it
testable on CPU (tests/ops/test_kernel_mlp.py pins values and all seven
gradients against the XLA reference).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128
_HP = 32          # padded hidden size (sublane axis)
_ROWS = 8         # sublane rows per input block

# packed-parameter column layout in the [32, 128] carrier
_C_W2 = slice(0, _HP)          # [32, 32]  W2 (in x out)
_C_W1 = slice(_HP, _HP + 1)    # [32, 1]   W1 (column: hidden)
_C_B1 = slice(_HP + 1, _HP + 2)
_C_W3 = slice(_HP + 2, _HP + 3)
_C_B2 = slice(_HP + 3, _HP + 4)
_C_B3 = slice(_HP + 4, _HP + 5)  # scalar at row 0


def _round_up(v, m):
    return (v + m - 1) // m * m


def _mlp_rows(p_ref, d):
    """Forward for one [1, chunk] delta row; returns (h1, h2, k)."""
    w1 = p_ref[:, _C_W1]                     # [32, 1]
    b1 = p_ref[:, _C_B1]
    w2 = p_ref[:, _C_W2]                     # [32, 32]
    b2 = p_ref[:, _C_B2]
    w3 = p_ref[:, _C_W3]
    b3 = p_ref[0:1, _C_B3]                   # [1, 1]
    h1 = jnp.tanh(w1 * d + b1)               # [32, chunk]
    z2 = jax.lax.dot_general(
        w2, h1, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST) + b2
    h2 = jnp.tanh(z2)
    k = jax.lax.dot_general(
        w3, h2, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST) + b3    # [1, chunk]
    return h1, h2, k


def _fwd_kernel(d_ref, p_ref, out_ref, *, rows):
    for v in range(rows):
        _, _, k = _mlp_rows(p_ref, d_ref[v:v + 1, :])
        out_ref[v:v + 1, :] = k


def _bwd_kernel(d_ref, p_ref, g_ref, dd_ref, dp_ref, *, rows):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dp_ref[...] = jnp.zeros(dp_ref.shape, dp_ref.dtype)

    w1 = p_ref[:, _C_W1]
    w2 = p_ref[:, _C_W2]
    w3 = p_ref[:, _C_W3]
    hst = jax.lax.Precision.HIGHEST
    for v in range(rows):
        d = d_ref[v:v + 1, :]                # [1, chunk]
        g = g_ref[v:v + 1, :]                # [1, chunk] cotangent of k
        h1, h2, _ = _mlp_rows(p_ref, d)
        # k = w3^T h2 + b3
        dw3 = jax.lax.dot_general(
            h2, g, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=hst)                   # [32, 1]
        db3 = jnp.sum(g, axis=1, keepdims=True)          # [1, 1]
        dh2 = w3 * g                                     # [32, chunk]
        dz2 = dh2 * (1.0 - h2 * h2)
        # z2 = W2^T h1 + b2  ->  dW2[h, i] = sum_l h1[h, l] dz2[i, l]
        dw2 = jax.lax.dot_general(
            h1, dz2, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=hst)                   # [32, 32]
        db2 = jnp.sum(dz2, axis=1, keepdims=True)        # [32, 1]
        dh1 = jax.lax.dot_general(
            w2, dz2, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=hst)                   # [32, chunk]
        dz1 = dh1 * (1.0 - h1 * h1)
        dw1 = jax.lax.dot_general(
            dz1, d, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=hst)                   # [32, 1]
        db1 = jnp.sum(dz1, axis=1, keepdims=True)        # [32, 1]
        dd_ref[v:v + 1, :] = jax.lax.dot_general(
            w1, dz1, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=hst)                   # [1, chunk]

        dp_ref[:, _C_W2] += dw2
        dp_ref[:, _C_W1] += dw1
        dp_ref[:, _C_B1] += db1
        dp_ref[:, _C_W3] += dw3
        dp_ref[:, _C_B2] += db2
        dp_ref[0:1, _C_B3] += db3


def _pack_params(w1, b1, w2, b2, w3, b3):
    """[32, 128] float32 carrier; see module docstring for the layout."""
    hd = w2.shape[0]
    p = jnp.zeros((_HP, _LANE), jnp.float32)
    p = p.at[:hd, _C_W2].set(
        jnp.pad(w2.astype(jnp.float32), ((0, 0), (0, _HP - hd))))
    p = p.at[:hd, _C_W1].set(w1.astype(jnp.float32).reshape(hd, 1))
    p = p.at[:hd, _C_B1].set(b1.astype(jnp.float32).reshape(hd, 1))
    p = p.at[:hd, _C_W3].set(w3.astype(jnp.float32).reshape(hd, 1))
    p = p.at[:hd, _C_B2].set(b2.astype(jnp.float32).reshape(hd, 1))
    p = p.at[0, _C_B3].set(b3.astype(jnp.float32).reshape(1))
    return p


def _unpack_grads(dp, hd):
    dw2 = dp[:hd, _C_W2][:, :hd]
    dw1 = dp[:hd, _C_W1].reshape(1, hd)
    db1 = dp[:hd, _C_B1].reshape(hd)
    dw3 = dp[:hd, _C_W3].reshape(hd, 1)
    db2 = dp[:hd, _C_B2].reshape(hd)
    db3 = dp[0, _C_B3].reshape(1)
    return dw1, db1, dw2, db2, dw3, db3


def _blocks(flat, chunk):
    """[n] -> ([M, chunk], grid) padded to whole [8, chunk] blocks."""
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
        (any float dtype; math runs in float32).

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
    packed = _pack_params(w1, b1, w2, b2, w3, b3)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rows=_ROWS),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
            pl.BlockSpec((_HP, _LANE), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct(d2.shape, jnp.float32),
        interpret=interpret,
    )(d2, packed)
    out = out.reshape(-1)[:n].reshape(shape)
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
    packed = _pack_params(w1, b1, w2, b2, w3, b3)
    dd, dp = pl.pallas_call(
        functools.partial(_bwd_kernel, rows=_ROWS),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
            pl.BlockSpec((_HP, _LANE), lambda k: (0, 0)),
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, chunk), lambda k: (k, 0)),
            pl.BlockSpec((_HP, _LANE), lambda k: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(d2.shape, jnp.float32),
            jax.ShapeDtypeStruct((_HP, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(d2, packed, g2)
    d_delta = dd.reshape(-1)[:n].reshape(shape).astype(delta.dtype)
    dw1, db1, dw2, db2, dw3, db3 = _unpack_grads(dp, hd)
    return (d_delta,
            dw1.astype(w1.dtype).reshape(w1.shape),
            db1.astype(b1.dtype).reshape(b1.shape),
            dw2.astype(w2.dtype).reshape(w2.shape),
            db2.astype(b2.dtype).reshape(b2.shape),
            dw3.astype(w3.dtype).reshape(w3.shape),
            db3.astype(b3.dtype).reshape(b3.shape))


kernel_mlp_pallas.defvjp(_fwd_vjp, _bwd_vjp)
