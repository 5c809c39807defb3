"""Segment-index utilities for ragged data under static shapes.

The reference derives per-sample local indices from ragged sample-index
vectors with scatter+cumsum (reference DummyNet/net.py:5-39 get_local_idx).
These fixed-shape equivalents underpin timestamp bookkeeping in model
plugins.
"""
import jax.numpy as jnp


def segment_starts(segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """First position of each segment id in a sorted segment vector.

    Args:
        segment_ids: int ``[N]`` non-decreasing segment ids (padding may use
            ``num_segments``).
        num_segments: static number of segments.

    Returns:
        int32 ``[num_segments]`` index of the first element of each segment
        (N for empty segments at the tail).
    """
    n = segment_ids.shape[0]
    positions = jnp.arange(n, dtype=jnp.int32)
    # scatter-min of position into segment slot
    starts = jnp.full((num_segments,), n, dtype=jnp.int32)
    starts = starts.at[segment_ids].min(positions, mode='drop')
    return starts


def get_local_idx(segment_ids: jnp.ndarray, num_segments: int):
    """Local index within each segment + segment sizes (fixed shapes).

    Example::

        segment_ids [0, 0, 1, 1, 2]  (sorted)
        local_idx   [0, 1, 0, 1, 0]
        sizes       [2, 2, 1]

    Unlike the reference's scatter/cumsum construction this assumes sorted
    segment ids — which collation guarantees — and computes local indices by
    subtracting gathered segment starts.
    """
    starts = segment_starts(segment_ids, num_segments)
    safe_ids = jnp.clip(segment_ids, 0, num_segments - 1)
    local = jnp.arange(segment_ids.shape[0], dtype=jnp.int32) \
        - starts[safe_ids]
    ones = jnp.ones_like(segment_ids, dtype=jnp.int32)
    sizes = jnp.zeros((num_segments,), dtype=jnp.int32) \
        .at[segment_ids].add(ones, mode='drop')
    return local, sizes
