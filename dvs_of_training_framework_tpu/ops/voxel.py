"""Event voxelization: scatter-add and MXU (matmul) formulations.

The event->voxel-grid binning is the framework's hot irregular op (the
torch-scatter dependency of the reference, SURVEY.md §2.3).  Two
fixed-shape implementations:

- ``voxelize_scatter``: one fused XLA scatter-add over ``B*L*H*W*C`` bins.
  Simple, memory-light; XLA lowers it to sort+segment machinery on TPU.
- ``voxelize_matmul``: reformulates the 2-D scatter as dense one-hot
  contractions that run on the MXU::

      out[(b,y), (x,c)] = sum_e onehot_row[e,(b,y)] * weights[e,(x,c)]

  Events are processed in chunks via ``lax.scan``; each chunk builds a
  row one-hot ``[chunk, B*L*H]`` (bf16 — exact for 0/1) and a weighted
  column matrix ``[chunk, W*C]`` holding the kernel weights, and one
  ``dot_general`` accumulates into the fp32 grid.  Padding events carry an
  out-of-range sample index; their one-hot row is all-zero.

Both return ``[B*L, H, W, C]`` float32 and agree to float tolerance
(tests/ops/test_voxel.py).
"""
import jax
import jax.numpy as jnp


def voxelize_scatter(x, y, sample_elem, weights, valid,
                     num_planes: int, height: int, width: int):
    """Scatter-add voxelization.

    Args:
        x, y: int32 ``[E]`` pixel coordinates.
        sample_elem: int32 ``[E]`` flattened (sample * L + element) plane id.
        weights: ``[E, C]`` per-channel contribution of each event.
        valid: bool ``[E]`` mask (False rows are dropped).
        num_planes: B * L.
        height, width: grid shape.

    Returns:
        float32 ``[num_planes, height, width, C]``.
    """
    C = weights.shape[1]
    n_bins = num_planes * height * width * C
    pix = sample_elem * (height * width) + y * width + x
    flat = pix[:, None] * C + jnp.arange(C, dtype=jnp.int32)[None, :]
    flat = jnp.where(valid[:, None], flat, n_bins)
    grid = jnp.zeros((n_bins,), jnp.float32)
    grid = grid.at[flat.reshape(-1)].add(
        weights.astype(jnp.float32).reshape(-1), mode='drop')
    return grid.reshape(num_planes, height, width, C)


def voxelize_matmul(x, y, sample_elem, weights, valid,
                    num_planes: int, height: int, width: int,
                    chunk: int = 8192, precise: bool = True):
    """MXU voxelization via chunked one-hot contractions (see module doc).

    Args:
        precise: split the weights into two bfloat16 components
            (``w = hi + lo``, the classic bf16x2 trick) so the MXU result
            matches fp32 scatter to ~1e-6 relative; ``False`` uses a single
            bf16 pass (~0.4% relative error, 2x cheaper).
    """
    E, C = weights.shape
    pad = (-E) % chunk
    if pad:
        x = jnp.pad(x, (0, pad))
        y = jnp.pad(y, (0, pad))
        sample_elem = jnp.pad(sample_elem, (0, pad))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    n_chunks = (E + pad) // chunk

    rows = sample_elem * height + y                     # [(E)], < P*H
    rows = jnp.where(valid, rows, num_planes * height)  # OOB -> zero one-hot
    cols_x = x

    def body(acc, args):
        r, cx, w = args
        onehot_rows = jax.nn.one_hot(r, num_planes * height,
                                     dtype=jnp.bfloat16)      # [chunk, P*H]
        # weighted column matrix: w[e, c] placed at column x_e * C + c
        col_onehot = jax.nn.one_hot(cx, width,
                                    dtype=jnp.bfloat16)       # [chunk, W]
        w32 = w.astype(jnp.float32)
        hi = w32.astype(jnp.bfloat16)
        parts = [hi]
        if precise:
            lo = (w32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            parts.append(lo)
        contrib = 0.0
        for part in parts:
            wcols = (col_onehot[:, :, None]
                     * part[:, None, :])                  # [chunk, W, C]
            wcols = wcols.reshape(chunk, width * C)
            contrib = contrib + jax.lax.dot_general(
                onehot_rows, wcols,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [P*H, W*C]
        return acc + contrib, None

    init = jnp.zeros((num_planes * height, width * C), jnp.float32)
    acc, _ = jax.lax.scan(
        body, init,
        (rows.reshape(n_chunks, chunk),
         cols_x.reshape(n_chunks, chunk),
         weights.reshape(n_chunks, chunk, C)))
    return acc.reshape(num_planes, height, width, C)
