"""Device-side batch schemas: fixed-capacity padded event buffers.

The reference keeps batches as ragged flat tensors with per-event
sample/element indices (reference utils/dataset.py:961-1020).  Under XLA every
shape must be static, so the TPU build pads the flat event axis to a fixed
``capacity`` (bucketable) and marks padding by an out-of-range
``sample_index`` — scatter/segment ops then drop padding for free by using
``num_segments = batch_size``.
"""
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EventBuffer:
    """Fixed-capacity padded event buffer.

    Attributes:
        x, y: int32 ``[capacity]`` pixel coordinates (0 for padding).
        timestamp: float32 ``[capacity]`` seconds from sample start.
        polarity: float32 ``[capacity]`` in {-1, +1} (0 for padding).
        element_index: int32 ``[capacity]`` element within the sample.
        sample_index: int32 ``[capacity]``; padding entries hold
            ``batch_size`` (one past the last valid segment).
        num_events: int32 scalar — number of valid leading entries.
    """
    x: jnp.ndarray
    y: jnp.ndarray
    timestamp: jnp.ndarray
    polarity: jnp.ndarray
    element_index: jnp.ndarray
    sample_index: jnp.ndarray
    num_events: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.num_events


@struct.dataclass
class Batch:
    """Device-ready training batch.

    Exactly one of ``events`` (raw path) / ``data`` (quantized path) is set.

    Attributes:
        events: padded EventBuffer or None.
        data: float32 ``[B, C, H, W]`` dense event representation or None.
        timestamps: float32 ``[D]`` image timestamps (D = sum of
            elements_per_sample + 1; padded entries are 0).
        sample_idx: int32 ``[D]`` sample of each timestamp (``size`` marks
            padding slots in the dynamic-length layout).
        images: float32 ``[D, 1, H, W]`` grayscale frames at the timestamps.
        size: static python int — number of samples B.
    """
    events: Optional[EventBuffer]
    data: Optional[jnp.ndarray]
    timestamps: jnp.ndarray
    sample_idx: jnp.ndarray
    images: jnp.ndarray
    size: int = struct.field(pytree_node=False)


@struct.dataclass
class PackedEventBuffer:
    """Bit-packed event wire record (8 B/event vs the 13 B int16 wire).

    ``packed`` holds, little-to-big: x (10 bits), y (10), polarity + 1
    (2), element_index (4), sample_index (6).  The timestamp stays
    float32 by default (the loss normalises with it at full precision).
    Only used on the wire — ``expand_events`` unpacks back to an
    ``EventBuffer`` on device.  Packability is a STATIC property of the
    run (image dims <= 1024, sequence length <= 16, batch size <= 63 —
    the padding sentinel ``sample_index == batch_size`` must fit), so
    the batch pytree structure never flips between steps.

    With the opt-in u16 timestamp wire (``--wire-timestamps u16``)
    ``timestamp`` is uint16 quantized against the per-batch
    ``timestamp_scale`` (f32 scalar): ``t ≈ u * scale`` with
    ``scale = t_max / 65535`` — absolute error <= t_max / 131070
    (~5 µs on a 0.64 s sample window, i.e. DVS-sensor-resolution
    fidelity, but NOT lossless; the default f32 wire keeps exactness).
    The choice is fixed per run so the wire pytree stays stable.
    """
    packed: jnp.ndarray
    timestamp: jnp.ndarray
    num_events: jnp.ndarray
    timestamp_scale: Optional[jnp.ndarray] = None


@struct.dataclass
class PooledEventWire:
    """Window-level event pool: only VALID events ride the wire.

    The padded wire ships ``K x capacity`` event records per device-queue
    window even though batches average well under full capacity (52% in
    the accuracy config's shards) — and upload bytes linearly bound the
    as-trained rate under this runtime's slow H2D mode (the D2H poison,
    PERFORMANCE.md).  The pooled wire concatenates each batch's leading
    ``num_events`` packed records into ONE flat pool plus per-batch
    ``offsets``; on device, step ``k`` takes a capacity-sized
    ``dynamic_slice`` at ``offsets[k]`` and re-derives the padding-
    sentinel layout (``slice_pooled_events``) — bit-identical to the
    padded wire, ~`1 - fill` fewer event bytes on the wire.

    ``capacity`` is static (part of the jit cache key).  The pool length
    is ``ceil(sum / granule) * granule + capacity`` — the ``+ capacity``
    tail keeps every slice in bounds without clamping (a clamped start
    would silently misalign the slice), and the granule quantisation
    bounds recompiles.

    Attributes:
        packed: uint32 ``[P]`` bit-packed event records (pool).
        timestamp: float32 (or uint16, u16 wire) ``[P]`` (pool).
        offsets: int32 ``[K]`` start of each batch's events in the pool.
        num_events: int32 ``[K]`` valid events per batch.
        timestamp_scale: float32 ``[K]`` per-batch u16 scales, or None.
        capacity: static per-batch event capacity (the sliced size).
    """
    packed: jnp.ndarray
    timestamp: jnp.ndarray
    offsets: jnp.ndarray
    num_events: jnp.ndarray
    timestamp_scale: Optional[jnp.ndarray] = None
    capacity: int = struct.field(pytree_node=False, default=0)


def pool_packed_wires(buffers, n_valid: int, granule: int = 0,
                      min_pool: int = 0) -> PooledEventWire:
    """Build a window event pool from K per-batch ``PackedEventBuffer``s.

    Mesh-split buffers carry leading shard axes before the capacity axis
    (``[D, C]`` or ``[D, E, C]``, parallel/mesh.py split_batch_for_mesh):
    the pool is then built PER SHARD CELL — every cell concatenates its
    own valid events across the window's K batches, all cells share one
    (max-derived) pool length so the arrays stay rectangular, and the
    device-side slice (``slice_pooled_events``) vmaps over the shard
    axes.  Sharding the pool over the mesh is then just a NamedSharding
    on the leading axes (parallel/mesh.py shard_host_batch).

    Args:
        buffers: K compacted wires (``pack_events_wire`` output; valid
            events lead, the trailing axis is the capacity).
        n_valid: real batches in the window; entries past it are repeat
            padding and alias the last real batch's pool region instead
            of duplicating its bytes.
        granule: pool-length quantum (default: the capacity) — coarser
            granules mean fewer distinct shapes, i.e. fewer recompiles.
        min_pool: lower bound on the pool length (callers keep it at the
            largest pool built so far, so shapes grow monotonically and
            a small final window reuses an already-compiled shape).
    """
    capacity = int(buffers[0].packed.shape[-1])
    lead = buffers[0].packed.shape[:-1]     # () flat | (D,) | (D, E)
    granule = granule or capacity
    K = len(buffers)
    # valid counts per (batch, cell); padding entries repeat the last
    # real batch, aliasing its pool region instead of re-shipping it
    ns = np.zeros((K,) + lead, np.int64)
    for k in range(n_valid):
        ns[k] = np.asarray(buffers[k].num_events)
    ns[n_valid:] = ns[n_valid - 1]
    real = ns[:n_valid]
    offsets = np.zeros((K,) + lead, np.int64)
    offsets[1:n_valid] = np.cumsum(real[:-1], axis=0)
    offsets[n_valid:] = offsets[n_valid - 1]
    total = int(real.sum(axis=0).max(initial=0))
    pool_len = max(-(-max(total, 1) // granule) * granule + capacity,
                   min_pool)
    packed = np.zeros(lead + (pool_len,), np.uint32)
    ts_dtype = np.asarray(buffers[0].timestamp).dtype
    timestamp = np.zeros(lead + (pool_len,), ts_dtype)
    for cell in np.ndindex(lead or (1,)):
        idx = cell if lead else ()
        pos = 0
        for k in range(n_valid):
            n = int(ns[(k,) + idx])
            packed[idx][pos:pos + n] = \
                np.asarray(buffers[k].packed)[idx][:n]
            timestamp[idx][pos:pos + n] = \
                np.asarray(buffers[k].timestamp)[idx][:n]
            pos += n
    scale = None
    if buffers[0].timestamp_scale is not None:
        # [K] flat (legacy layout) / [*lead, K] sharded — the window axis
        # stays LAST on shard-carrying leaves so leading-axis mesh specs
        # apply uniformly across the wire's arrays
        scale = np.stack([np.asarray(b.timestamp_scale, np.float32)
                          for b in buffers],
                         axis=-1 if lead else 0).astype(np.float32)
    if lead:   # window axis last (see scale comment)
        offsets = np.moveaxis(offsets, 0, -1)
        ns = np.moveaxis(ns, 0, -1)
    return PooledEventWire(packed=packed, timestamp=timestamp,
                           offsets=offsets.astype(np.int32),
                           num_events=ns.astype(np.int32),
                           timestamp_scale=scale, capacity=capacity)


def slice_pooled_events(ev: PooledEventWire, idx,
                        batch_size: int) -> EventBuffer:
    """Device-side batch ``idx`` of a window pool -> expanded EventBuffer.

    Bit-identical to slicing the padded wire then ``expand_events``: the
    slice may start mid-pool (neighbouring batches' records fill the
    tail), so every field is re-masked to the ``pad_events`` padding
    layout (zeros, ``sample_index == batch_size``) before use.

    Mesh pools carry leading shard axes (``pool_packed_wires``) with the
    window axis LAST on offsets/num_events: the per-cell slice is vmapped
    over each shard axis, and the padding marker is the PER-DATA-SHARD
    batch size (the packed records' sample indices are shard-local,
    parallel/mesh.py split_batch_for_mesh).
    """
    import jax
    C = ev.capacity
    lead = ev.packed.shape[:-1]

    def one(packed, timestamp, off, n, scale):
        p = jax.lax.dynamic_slice(packed, (off,), (C,))
        t = jax.lax.dynamic_slice(timestamp, (off,), (C,))
        if t.dtype != jnp.float32:   # u16 quantized wire
            t = t.astype(jnp.float32) * scale
        valid = jnp.arange(C, dtype=jnp.int32) < n
        zero = jnp.zeros([], jnp.int32)
        marker = batch_size // (lead[0] if lead else 1)
        return EventBuffer(
            x=jnp.where(valid, (p & 0x3FF).astype(jnp.int32), zero),
            y=jnp.where(valid, ((p >> 10) & 0x3FF).astype(jnp.int32),
                        zero),
            timestamp=jnp.where(valid, t, 0.0),
            polarity=jnp.where(
                valid, (((p >> 20) & 0x3).astype(jnp.int32) - 1), zero
            ).astype(jnp.float32),
            element_index=jnp.where(
                valid, ((p >> 22) & 0xF).astype(jnp.int32), zero),
            sample_index=jnp.where(
                valid, ((p >> 26) & 0x3F).astype(jnp.int32),
                jnp.int32(marker)),
            num_events=n)

    take = jax.lax.dynamic_index_in_dim
    if not lead:
        scale = None if ev.timestamp_scale is None else \
            take(ev.timestamp_scale, idx, 0, keepdims=False)
        return one(ev.packed, ev.timestamp,
                   take(ev.offsets, idx, 0, keepdims=False),
                   take(ev.num_events, idx, 0, keepdims=False), scale)

    # shard-carrying pool: window axis is last on offsets/num_events/scale
    off = take(ev.offsets, idx, ev.offsets.ndim - 1, keepdims=False)
    n = take(ev.num_events, idx, ev.num_events.ndim - 1, keepdims=False)
    scale = jnp.zeros(lead, jnp.float32) if ev.timestamp_scale is None \
        else take(ev.timestamp_scale, idx, ev.timestamp_scale.ndim - 1,
                  keepdims=False)
    fn = one
    for _ in lead:   # nested vmap over every shard axis
        fn = jax.vmap(fn)
    return fn(ev.packed, ev.timestamp, off, n, scale)


def packable(batch: Batch) -> bool:
    """May this batch's event wire use ``PackedEventBuffer``?

    Decided from shapes and the static batch size (image dims, the
    mean per-sample element count, size).  Callers that stream MANY
    batches through one jitted program (the device queue) must call
    this ONCE and pass the decision to every ``compact_batch`` — a
    per-batch flip would change the pytree structure mid-stream.
    ``pack_events_wire`` independently value-checks every batch and
    raises OverflowError when a field does not fit (ragged streams can
    exceed the mean-derived element bound), which the device queue
    turns into a skipped-and-reported batch instead of corruption.

    Mesh-split batches (``split_batch_for_mesh``: leading shard axis,
    5-D images, per-shard-localised sample indices) pack too — the bit
    bounds then apply to the PER-SHARD sample count (the padding
    sentinel is ``size / n_shards``).
    """
    if batch.events is None or batch.images is None:
        return False
    if batch.images.ndim == 4:          # single-device layout
        size = batch.size
    elif batch.images.ndim == 5:        # mesh layout: [shard, D, 1, H, W]
        n_shards = batch.images.shape[0]
        if n_shards == 0 or batch.size % n_shards:
            return False
        size = batch.size // n_shards   # per-shard samples (the sentinel)
    else:
        return False
    H, W = batch.images.shape[-2:]
    num_ts = batch.timestamps.shape[-1]
    if size == 0 or num_ts % size:
        return False
    L = num_ts // size - 1
    return H <= 1024 and W <= 1024 and L <= 16 and size <= 63


def pack_events_wire(ev: EventBuffer,
                     quantize_ts: bool = False) -> PackedEventBuffer:
    """Host-side bit packing (numpy); inverse is in ``expand_events``.

    Args:
        quantize_ts: ship timestamps as uint16 against a per-batch f32
            scale (t_max / 65535) instead of float32 — halves the
            second-largest wire leg.  Opt-in: quantization error is
            <= t_max / 131070 (see PackedEventBuffer docstring).

    Raises:
        OverflowError: when any field exceeds its bit width (x/y 10
            bits, polarity in {-1, 0, 1}, element_index 4 bits,
            sample_index 6 bits), or (u16 wire) when a timestamp is
            negative or non-finite — silent corruption is never an
            option.
    """
    x = np.asarray(ev.x, np.int64)
    y = np.asarray(ev.y, np.int64)
    pol_f = np.asarray(ev.polarity)
    pol = np.asarray(pol_f, np.int64) + 1
    if not np.array_equal(pol - 1, pol_f):
        raise OverflowError('polarity must be integral (-1/0/+1) for the '
                            'packed event wire')
    elem = np.asarray(ev.element_index, np.int64)
    sample = np.asarray(ev.sample_index, np.int64)
    for name, arr, hi in (('x', x, 1024), ('y', y, 1024),
                          ('polarity+1', pol, 3),
                          ('element_index', elem, 16),
                          ('sample_index', sample, 64)):
        lo_bad = arr.min(initial=0) < 0
        hi_bad = arr.max(initial=0) >= hi
        if lo_bad or hi_bad:
            raise OverflowError(
                f'event field {name} out of packed-wire range [0, {hi}) '
                f'(min {arr.min(initial=0)}, max {arr.max(initial=0)})')
    packed = (x | (y << 10) | (pol << 20) | (elem << 22)
              | (sample << 26)).astype(np.uint32)
    timestamp = np.asarray(ev.timestamp, np.float32)
    scale = None
    if quantize_ts:
        if not np.all(np.isfinite(timestamp)) or \
                timestamp.min(initial=0.0) < 0:
            raise OverflowError(
                'u16 timestamp wire requires finite non-negative '
                'timestamps (seconds from sample start)')
        # one scale per leading index (mesh-split buffers carry shard
        # axes before the capacity axis; flat buffers get a () scale)
        t_max = timestamp.max(axis=-1, initial=0.0) \
            if timestamp.ndim else np.float32(0.0)
        scale_v = np.where(t_max > 0, t_max / np.float32(65535.0),
                           np.float32(1.0)).astype(np.float32)
        q = np.rint(timestamp / scale_v[..., None])
        timestamp = np.minimum(q, 65535.0).astype(np.uint16)
        scale = scale_v
    return PackedEventBuffer(packed=packed,
                             timestamp=timestamp,
                             num_events=ev.num_events,
                             timestamp_scale=scale)


def compact_batch(batch: Batch, pack=None, quantize_ts: bool = False,
                  data_wire: str = 'f32') -> Batch:
    """Narrow a device-ready Batch to compact wire dtypes: bit-packed
    uint32 event records when the run's shapes allow it (8 B/event),
    int16 coordinates/indices + int8 polarity otherwise, and uint8
    images when they are integral (they come from the uint8
    codec/frames, so they are, unless a plugin injects fractional dense
    inputs).

    ``expand_batch`` is the exact inverse on device; pairing them is
    lossless.  Upload bytes matter on PCIe hosts and under tunnelled
    runtimes — after this environment's first D2H fetch, uploads run at
    only ~80 MB/s per byte (the D2H poison, PERFORMANCE.md round 3), so
    wire bytes directly bound the as-trained rate.

    Args:
        pack: tri-state — None decides per batch via ``packable``;
            streaming callers (device queue) pass an explicit bool,
            decided once, so the wire pytree structure stays constant.
        quantize_ts: ship event timestamps as uint16 + per-batch scale
            (packed wire only; ~5 µs absolute error on MVSEC-scale
            windows — see PackedEventBuffer).  Like ``pack`` this must
            be held constant across a streamed run.
        data_wire: 'f32' (default, exact) or 'bf16' — ship the dense
            quantized representation (--ev_images batches) as bfloat16,
            halving its wire bytes.  Under --precision bfloat16 this is
            effect-lossless: the model casts its input to bf16 before
            the first conv, and f32->bf16->f32->bf16 equals f32->bf16
            (the second rounding is exact).  Under fp32 precision it is
            a real ~2^-8 relative quantization — opt-in only.
    """
    ev = batch.events
    if pack is None:
        pack = packable(batch)
    if ev is not None and pack:
        ev = pack_events_wire(ev, quantize_ts=quantize_ts)
    elif ev is not None:
        # int16 holds VALUES (pixel coords < 32768, element/sample ids),
        # not buffer indices — any capacity is fine
        ev = EventBuffer(
            x=ev.x.astype(np.int16),
            y=ev.y.astype(np.int16),
            timestamp=ev.timestamp,
            polarity=ev.polarity.astype(np.int8),
            element_index=ev.element_index.astype(np.int16),
            sample_index=ev.sample_index.astype(np.int16),
            num_events=ev.num_events)
    images = batch.images
    if isinstance(images, np.ndarray) and images.dtype == np.float32 \
            and images.min(initial=0) >= 0 and images.max(initial=0) <= 255:
        as_u8 = images.astype(np.uint8)
        if np.array_equal(as_u8.astype(np.float32), images):
            images = as_u8
    data = batch.data
    if data is not None and data_wire == 'bf16':
        import ml_dtypes
        data = np.asarray(data).astype(ml_dtypes.bfloat16)
    return Batch(events=ev, data=data, timestamps=batch.timestamps,
                 sample_idx=batch.sample_idx, images=images,
                 size=batch.size)


def expand_events(ev) -> EventBuffer:
    """Device-side inverse of the EventBuffer leg of ``compact_batch``."""
    if isinstance(ev, PackedEventBuffer):
        p = ev.packed
        timestamp = ev.timestamp
        if timestamp.dtype != jnp.float32:   # u16 quantized wire
            timestamp = timestamp.astype(jnp.float32) \
                * jnp.expand_dims(ev.timestamp_scale, -1)
        return EventBuffer(
            x=(p & 0x3FF).astype(jnp.int32),
            y=((p >> 10) & 0x3FF).astype(jnp.int32),
            timestamp=timestamp,
            polarity=(((p >> 20) & 0x3).astype(jnp.int32) - 1)
            .astype(jnp.float32),
            element_index=((p >> 22) & 0xF).astype(jnp.int32),
            sample_index=((p >> 26) & 0x3F).astype(jnp.int32),
            num_events=ev.num_events)
    if ev.x.dtype == jnp.int32:
        return ev
    return EventBuffer(
        x=ev.x.astype(jnp.int32),
        y=ev.y.astype(jnp.int32),
        timestamp=ev.timestamp,
        polarity=ev.polarity.astype(jnp.float32),
        element_index=ev.element_index.astype(jnp.int32),
        sample_index=ev.sample_index.astype(jnp.int32),
        num_events=ev.num_events)


def expand_batch(batch: Batch) -> Batch:
    """Device-side inverse of ``compact_batch`` (callable under jit)."""
    ev = batch.events
    if ev is not None:
        ev = expand_events(ev)
    images = batch.images
    if images is not None and images.dtype != jnp.float32:
        images = images.astype(jnp.float32)
    data = batch.data
    if data is not None and data.dtype != jnp.float32:
        data = data.astype(jnp.float32)   # bf16 data wire
    return Batch(events=ev, data=data, timestamps=batch.timestamps,
                 sample_idx=batch.sample_idx, images=images,
                 size=batch.size)


def slice_window_batch(batch: Batch, idx) -> Batch:
    """Select batch ``idx`` from a window-stacked Batch (leading K axis on
    every array leaf) with on-device dynamic slices; callable under jit."""
    import jax

    def take(x):
        return jax.lax.dynamic_index_in_dim(x, idx, 0, keepdims=False)

    events = batch.events
    if isinstance(events, PooledEventWire):
        events = slice_pooled_events(events, idx, batch.size)
    elif events is not None:
        events = jax.tree_util.tree_map(take, events)
    return Batch(events=events,
                 data=None if batch.data is None else take(batch.data),
                 timestamps=take(batch.timestamps),
                 sample_idx=take(batch.sample_idx),
                 images=take(batch.images),
                 size=batch.size)


def round_up_to_bucket(n: int, buckets) -> int:
    """Smallest bucket >= n; buckets is a sorted iterable of capacities."""
    for b in buckets:
        if n <= b:
            return b
    raise OverflowError(f'{n} events exceed the largest bucket {buckets[-1]}')


def default_buckets(capacity: int):
    """Power-of-two bucket ladder up to ``capacity`` (limits recompiles)."""
    buckets = []
    b = 4096
    while b < capacity:
        buckets.append(b)
        b *= 2
    buckets.append(capacity)
    return buckets


def pad_events(events: dict, batch_size: int, capacity: int) -> EventBuffer:
    """Pad a ragged host-side event dict to a fixed-capacity EventBuffer.

    Args:
        events: dict with 1-d numpy arrays ``x, y, timestamp, polarity,
            element_index, sample_index``.
        batch_size: number of samples (padding sample_index = batch_size).
        capacity: target buffer length.

    Raises:
        OverflowError: when the batch holds more than ``capacity`` events.
    """
    n = int(np.asarray(events['x']).size)
    if n > capacity:
        raise OverflowError(f'{n} events exceed event buffer capacity '
                            f'{capacity}')

    def pad(arr, fill, dtype):
        arr = np.asarray(arr, dtype=dtype)
        out = np.full(capacity, fill, dtype=dtype)
        out[:n] = arr
        return out

    return EventBuffer(
        x=pad(events['x'], 0, np.int32),
        y=pad(events['y'], 0, np.int32),
        timestamp=pad(events['timestamp'], 0.0, np.float32),
        polarity=pad(events['polarity'], 0.0, np.float32),
        element_index=pad(events['element_index'], 0, np.int32),
        sample_index=pad(events['sample_index'], batch_size, np.int32),
        num_events=np.int32(n))


def layout_sample_slots(collated: dict, max_seq_length: int) -> dict:
    """Re-layout a variable-length batch into uniform per-sample slots.

    With ``--dynamic-sample-length`` samples carry different element counts
    ``L_b``, so the flat timestamp/image axis ``D = sum(L_b + 1)`` varies per
    batch — a fresh XLA compile each time.  This gives every sample a fixed
    block of ``S = max_seq_length + 1`` slots: real entries first, then
    padding marked by ``sample_idx = size`` (out of range: no prediction
    matches it in the loss and ``segment_starts`` drops it — a negative
    marker would WRAP in scatter ops), with zero images.  The result
    is statically shaped, so ONE compile covers every length mix — the TPU
    counterpart of the reference's ragged dynamic batches
    (utils/options.py:104-107, DummyNet/net.py:5-39 get_local_idx).

    A batch whose samples all already have ``max_seq_length`` elements maps
    to itself (the static layout is the special case).
    """
    size = int(collated['size'])
    S = max_seq_length + 1
    src_sample = np.asarray(collated['sample_idx'])
    timestamps = np.asarray(collated['timestamps'], dtype=np.float32)
    images = np.asarray(collated['images'], dtype=np.float32)
    if images.ndim == 3:
        images = images[:, None]

    counts = np.bincount(src_sample, minlength=size)
    if counts.max(initial=0) > S:
        raise OverflowError(
            f'sample with {counts.max()} timestamps exceeds slot size {S}')
    # destination of every source entry: sample_block_start + local_index
    local = np.arange(src_sample.size) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    dst = src_sample * S + local

    out_ts = np.zeros(size * S, np.float32)
    out_sidx = np.full(size * S, size, np.int64)
    out_images = np.zeros((size * S,) + images.shape[1:], np.float32)
    out_ts[dst] = timestamps
    out_sidx[dst] = src_sample
    out_images[dst] = images

    out = dict(collated)
    out['timestamps'] = out_ts
    out['sample_idx'] = out_sidx
    out['images'] = out_images
    return out


def pad_batch(collated: dict,
              capacity: Optional[int] = None,
              buckets=None,
              sequence_length: Optional[int] = None) -> Batch:
    """Convert a host-collated ragged batch dict into a device-ready Batch.

    Args:
        collated: output of ``collate.collate_wrapper`` (raw path, has
            'events') or a decoded quantized batch (has 'data').
        capacity: fixed event capacity; mutually exclusive with buckets.
        buckets: sorted capacities; the smallest fitting one is used.
        sequence_length: when set (dynamic sample length), re-layout the
            timestamp/image axis into uniform per-sample slots of
            ``sequence_length + 1`` entries (see layout_sample_slots).
    """
    if sequence_length is not None:
        collated = layout_sample_slots(collated, sequence_length)
    size = int(collated['size'])
    images = np.asarray(collated['images'], dtype=np.float32)
    if images.ndim == 3:
        images = images[:, None]
    timestamps = np.asarray(collated['timestamps'], dtype=np.float32)
    sample_idx = np.asarray(collated['sample_idx'], dtype=np.int32)

    events = None
    data = None
    if 'events' in collated and collated['events'] is not None:
        ev = collated['events']
        n = int(np.asarray(ev['x']).size)
        if buckets is not None:
            capacity = round_up_to_bucket(n, buckets)
        assert capacity is not None, 'capacity or buckets required'
        events = pad_events(ev, size, capacity)
    else:
        data = np.asarray(collated['data'], dtype=np.float32)

    return Batch(events=events,
                 data=data,
                 timestamps=timestamps,
                 sample_idx=sample_idx,
                 images=images,
                 size=size)
