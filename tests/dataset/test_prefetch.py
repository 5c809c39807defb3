"""Device prefetch iterator: ordering, overflow pass-through."""
import numpy as np

from dvs_of_training_framework_tpu.data.prefetch import prefetch_to_device
from dvs_of_training_framework_tpu.data.schema import pad_batch


def make_host_batch(n_events, seed=0):
    rng = np.random.default_rng(seed)
    return {
        'events': {
            'x': rng.integers(0, 32, n_events),
            'y': rng.integers(0, 32, n_events),
            'timestamp': rng.uniform(0, 0.04, n_events)
            .astype(np.float32),
            'polarity': rng.choice([-1.0, 1.0], n_events),
            'element_index': np.zeros(n_events, np.int64),
            'sample_index': np.zeros(n_events, np.int64),
        },
        'timestamps': np.array([0, 0.04], np.float32),
        'sample_idx': np.array([0, 0], np.int64),
        'images': np.zeros((2, 1, 32, 32), np.float32),
        'augmentation_params': None,
        'size': 1,
    }


def test_prefetch_preserves_order_and_flags_overflow():
    batches = [make_host_batch(10, 0), make_host_batch(999, 1),
               make_host_batch(20, 2)]

    def prepare(b):
        return pad_batch(b, capacity=64)

    out = list(prefetch_to_device(iter(batches), prepare, depth=2))
    assert len(out) == 3
    host0, dev0 = out[0]
    assert dev0 is not None
    assert int(dev0.events.num_events) == 10
    # the oversized batch comes through with device_batch=None
    host1, dev1 = out[1]
    assert dev1 is None
    assert host1['events']['x'].size == 999
    _, dev2 = out[2]
    assert int(dev2.events.num_events) == 20


def test_prefetch_closes_source_on_abandonment():
    """Abandoning the generator must stop the producer and close the
    source iterator (h5py atexit deadlocks on live daemon readers)."""
    import threading
    closed = threading.Event()

    def source():
        try:
            i = 0
            while True:  # infinite, like the training loader
                yield make_host_batch(10, i)
                i += 1
        finally:
            closed.set()

    def prepare(b):
        return pad_batch(b, capacity=64)

    gen = prefetch_to_device(source(), prepare, depth=2)
    next(gen)
    gen.close()  # consumer leaves early
    assert closed.wait(timeout=10), 'source iterator was not closed'


def test_compact_expand_roundtrip():
    """Wire compaction (bit-packed uint32 events, uint8 images) is
    lossless, and runs whose shapes exceed the packing bounds fall back
    to the int16/int8 wire."""
    import jax
    from dvs_of_training_framework_tpu.data.schema import (
        PackedEventBuffer, compact_batch, expand_batch)
    batch = pad_batch(make_host_batch(50), capacity=64)
    compact = compact_batch(batch)
    # packable shapes -> 8 B/event bit-packed records
    assert isinstance(compact.events, PackedEventBuffer)
    assert compact.events.packed.dtype == np.uint32
    assert compact.images.dtype == np.uint8
    restored = jax.jit(expand_batch)(compact)
    for name in ('x', 'y', 'timestamp', 'polarity', 'element_index',
                 'sample_index'):
        np.testing.assert_array_equal(np.asarray(getattr(restored.events,
                                                         name)),
                                      np.asarray(getattr(batch.events,
                                                         name)))
        assert getattr(restored.events, name).dtype == \
            getattr(batch.events, name).dtype
    np.testing.assert_array_equal(np.asarray(restored.images),
                                  batch.images)

    # fractional images must NOT be narrowed
    frac = batch.replace(images=batch.images + 0.5)
    assert compact_batch(frac).images.dtype == np.float32

    # shapes beyond the packing bounds (H > 1024) -> int16 fallback
    D = batch.images.shape[0]
    big = batch.replace(images=np.zeros((D, 1, 2000, 8), np.float32))
    fallback = compact_batch(big)
    assert not isinstance(fallback.events, PackedEventBuffer)
    assert fallback.events.x.dtype == np.int16
    assert fallback.events.polarity.dtype == np.int8
    restored2 = jax.jit(expand_batch)(fallback)
    np.testing.assert_array_equal(np.asarray(restored2.events.x),
                                  np.asarray(batch.events.x))


def test_prefetch_keeps_committed_arrays_in_place():
    """Already-committed jax.Arrays (mesh-sharded batches) must not be
    re-put onto the default device."""
    import jax
    import jax.numpy as jnp

    marker = jnp.arange(4.0)

    def prepare(b):
        return {'x': marker, 'y': np.arange(3.0)}

    (host, dev), = list(prefetch_to_device(
        iter([make_host_batch(5)]), prepare, depth=1))
    assert dev['x'] is marker           # untouched
    assert isinstance(dev['y'], jax.Array)  # numpy leaf transferred


def test_packed_wire_boundary_values():
    """Every bit field round-trips at its extremes (x=y=1023, elem=15,
    sample=63 sentinel, polarity in {-1, 0, +1}) — pins the exact
    shift/width layout."""
    import jax
    from dvs_of_training_framework_tpu.data.schema import (
        EventBuffer, expand_events, pack_events_wire)
    ev = EventBuffer(
        x=np.array([0, 1023, 512, 0], np.int32),
        y=np.array([1023, 0, 300, 0], np.int32),
        timestamp=np.array([0.0, 0.5, 1.0, 0.0], np.float32),
        polarity=np.array([-1.0, 1.0, 0.0, 1.0], np.float32),
        element_index=np.array([15, 0, 7, 0], np.int32),
        sample_index=np.array([0, 62, 63, 63], np.int32),
        num_events=np.int32(3))
    packed = pack_events_wire(ev)
    out = jax.jit(expand_events)(packed)
    for name in ('x', 'y', 'timestamp', 'polarity', 'element_index',
                 'sample_index'):
        np.testing.assert_array_equal(np.asarray(getattr(out, name)),
                                      np.asarray(getattr(ev, name)),
                                      err_msg=name)


def test_pooled_wire_slices_match_padded():
    """Every device slice of a window event pool reproduces the padded
    wire's expanded EventBuffer bit-for-bit — including the padding
    layout (zeros, sample sentinel), the masking of neighbouring
    batches' records that fill the slice tail, the repeat-padded window
    tail, the u16 timestamp wire, and the monotonic ``min_pool`` floor.
    """
    import jax
    from dvs_of_training_framework_tpu.data.schema import (
        expand_events, pack_events_wire, pool_packed_wires,
        slice_pooled_events)

    for quantize_ts in (False, True):
        batches = [pad_batch(make_host_batch(n, seed=n), capacity=64)
                   for n in (10, 64, 0)]
        wires = [pack_events_wire(b.events, quantize_ts=quantize_ts)
                 for b in batches]
        # repeat-padded window: 3 real batches, window of 4
        pool = pool_packed_wires(wires + [wires[-1]], n_valid=3)
        assert pool.capacity == 64
        assert pool.packed.shape[0] % 64 == 0
        expected = [jax.jit(expand_events)(w) for w in wires]
        slicer = jax.jit(lambda ev, i: slice_pooled_events(ev, i, 1))
        for k, exp in enumerate(expected + [expected[-1]]):
            got = slicer(pool, k)
            for name in ('x', 'y', 'timestamp', 'polarity',
                         'element_index', 'sample_index', 'num_events'):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, name)),
                    np.asarray(getattr(exp, name)),
                    err_msg=f'{name} (batch {k}, u16={quantize_ts})')
        # padding entries carry the pad_events sentinel layout
        got0 = slicer(pool, 0)
        assert np.all(np.asarray(got0.sample_index)[10:] == 1)
        assert np.all(np.asarray(got0.x)[10:] == 0)
        # monotonic floor: a larger min_pool only grows the buffer
        big = pool_packed_wires(wires + [wires[-1]], n_valid=3,
                                min_pool=1024)
        assert big.packed.shape[0] == 1024
        got_big = jax.jit(lambda ev, i: slice_pooled_events(ev, i, 1))(
            big, 1)
        np.testing.assert_array_equal(np.asarray(got_big.x),
                                      np.asarray(expected[1].x))


def test_packed_wire_rejects_out_of_range():
    """Out-of-range fields raise OverflowError (-> the device queue's
    skip-and-report path) instead of silently corrupting neighbours."""
    import pytest as _pytest
    from dvs_of_training_framework_tpu.data.schema import (
        EventBuffer, pack_events_wire)

    def ev(**kw):
        base = dict(
            x=np.zeros(4, np.int32), y=np.zeros(4, np.int32),
            timestamp=np.zeros(4, np.float32),
            polarity=np.ones(4, np.float32),
            element_index=np.zeros(4, np.int32),
            sample_index=np.zeros(4, np.int32),
            num_events=np.int32(4))
        base.update(kw)
        return EventBuffer(**base)

    for bad in (dict(x=np.array([0, 0, 0, 1024], np.int32)),
                dict(y=np.array([0, 0, 0, 5000], np.int32)),
                dict(element_index=np.array([0, 16, 0, 0], np.int32)),
                dict(sample_index=np.array([64, 0, 0, 0], np.int32)),
                dict(x=np.array([-1, 0, 0, 0], np.int32))):
        with _pytest.raises(OverflowError):
            pack_events_wire(ev(**bad))


def test_packed_wire_rejects_fractional_polarity():
    import pytest as _pytest
    from dvs_of_training_framework_tpu.data.schema import (
        EventBuffer, pack_events_wire)
    ev = EventBuffer(
        x=np.zeros(4, np.int32), y=np.zeros(4, np.int32),
        timestamp=np.zeros(4, np.float32),
        polarity=np.array([1.0, -1.0, 0.5, 0.0], np.float32),
        element_index=np.zeros(4, np.int32),
        sample_index=np.zeros(4, np.int32),
        num_events=np.int32(4))
    with _pytest.raises(OverflowError):
        pack_events_wire(ev)


def test_u16_timestamp_wire_error_bound():
    """The opt-in u16 timestamp wire reconstructs within the documented
    bound (<= t_max / 131070 + one f32 ulp) and keeps zeros exact."""
    import jax
    from dvs_of_training_framework_tpu.data.schema import (
        EventBuffer, expand_events, pack_events_wire)
    rng = np.random.default_rng(3)
    t = rng.uniform(0, 0.64, 1024).astype(np.float32)
    t[:8] = 0.0                      # padding entries stay exactly 0
    t[8] = 0.64                      # the max maps to u=65535 exactly
    ev = EventBuffer(
        x=np.zeros(1024, np.int32), y=np.zeros(1024, np.int32),
        timestamp=t,
        polarity=np.ones(1024, np.float32),
        element_index=np.zeros(1024, np.int32),
        sample_index=np.zeros(1024, np.int32),
        num_events=np.int32(1024))
    packed = pack_events_wire(ev, quantize_ts=True)
    assert packed.timestamp.dtype == np.uint16
    assert packed.timestamp_scale.dtype == np.float32
    out = jax.jit(expand_events)(packed)
    t_hat = np.asarray(out.timestamp)
    assert t_hat.dtype == np.float32
    np.testing.assert_array_equal(t_hat[:8], 0.0)
    t_max = float(t.max())
    bound = t_max / 131070 + np.spacing(np.float32(t_max))
    assert np.abs(t_hat - t).max() <= bound
    # exact wire (default) is untouched
    exact = pack_events_wire(ev)
    assert exact.timestamp.dtype == np.float32
    assert exact.timestamp_scale is None


def test_u16_timestamp_wire_rejects_bad_timestamps():
    import pytest as _pytest
    from dvs_of_training_framework_tpu.data.schema import (
        EventBuffer, pack_events_wire)

    def ev(t):
        return EventBuffer(
            x=np.zeros(4, np.int32), y=np.zeros(4, np.int32),
            timestamp=np.asarray(t, np.float32),
            polarity=np.ones(4, np.float32),
            element_index=np.zeros(4, np.int32),
            sample_index=np.zeros(4, np.int32),
            num_events=np.int32(4))

    for bad in ([0.0, -0.1, 0.2, 0.3], [0.0, np.nan, 0.2, 0.3],
                [0.0, np.inf, 0.2, 0.3]):
        with _pytest.raises(OverflowError):
            pack_events_wire(ev(bad), quantize_ts=True)
    # all-zero timestamps are fine (scale degenerates to 1)
    packed = pack_events_wire(ev([0.0] * 4), quantize_ts=True)
    assert packed.timestamp.dtype == np.uint16
    assert float(packed.timestamp_scale) == 1.0


def test_device_queue_u16_wire_trains_close_to_f32():
    """Windows staged with the u16 timestamp wire train within the
    quantization tolerance of the exact wire (same batches, same
    seeds)."""
    import jax
    from dvs_of_training_framework_tpu.data.device_queue import \
        prefetch_windows
    from dvs_of_training_framework_tpu.data.schema import (
        PackedEventBuffer, expand_batch, slice_window_batch)

    batches = [make_host_batch(40, seed=s) for s in range(4)]

    def prepare(b):
        return pad_batch(b, capacity=64)

    def collect(quantize_ts):
        out = []
        for _h, win, n_valid, _sk in prefetch_windows(
                iter(batches), prepare, window=2, depth=1,
                quantize_ts=quantize_ts):
            for i in range(n_valid):
                out.append(jax.jit(lambda w, i: expand_batch(
                    slice_window_batch(w, i)))(win, i))
        return out

    exact = collect(False)
    quant = collect(True)
    assert len(exact) == len(quant) == 4
    for e, q in zip(exact, quant):
        assert isinstance(e.events, type(q.events))
        t_e = np.asarray(e.events.timestamp)
        t_q = np.asarray(q.events.timestamp)
        t_max = t_e.max()
        assert np.abs(t_e - t_q).max() <= t_max / 131070 + 1e-9
        for name in ('x', 'y', 'polarity', 'element_index',
                     'sample_index'):
            np.testing.assert_array_equal(
                np.asarray(getattr(e.events, name)),
                np.asarray(getattr(q.events, name)))


def test_pooled_wire_skips_unpackable_batches():
    """A mid-stream batch whose values no longer fit the packed wire
    (ragged streams) must land in the skip report while the pooled
    window assembles from the surviving batches, bit-equal to the
    per-batch expansion of the same survivors."""
    import jax
    from dvs_of_training_framework_tpu.data.device_queue import \
        prefetch_windows
    from dvs_of_training_framework_tpu.data.schema import (
        expand_batch, slice_window_batch)

    good = [make_host_batch(40, seed=s) for s in (0, 1, 2)]
    bad = make_host_batch(40, seed=3)
    bad['events']['x'][5] = 2000            # exceeds the 10-bit x field
    stream = [good[0], bad, good[1], good[2]]

    def prepare(b):
        return pad_batch(b, capacity=64)

    windows = list(prefetch_windows(iter(stream), prepare, window=2,
                                    depth=1, pool_events=True))
    assert len(windows) == 2
    (_h0, win0, nv0, sk0), (_h1, win1, nv1, sk1) = windows
    assert (nv0, nv1) == (2, 1)
    assert sk0 == [bad] and sk1 == []
    expanded = []
    for win, nv in ((win0, nv0), (win1, nv1)):
        for i in range(nv):
            expanded.append(jax.jit(lambda w, i: expand_batch(
                slice_window_batch(w, i)))(win, i))
    reference = [jax.jit(expand_batch)(prepare(b)) for b in good]
    for got, exp in zip(expanded, reference):
        for name in ('x', 'y', 'timestamp', 'polarity',
                     'element_index', 'sample_index', 'num_events'):
            np.testing.assert_array_equal(
                np.asarray(getattr(got.events, name)),
                np.asarray(getattr(exp.events, name)), err_msg=name)


def test_mesh_split_batch_packs_and_roundtrips():
    """split_batch_for_mesh output (leading shard axes, localised sample
    indices) packs to the uint32 wire and expands losslessly — including
    event-axis shards and the u16 timestamp leg."""
    import jax
    from dvs_of_training_framework_tpu.data.schema import (
        PackedEventBuffer, compact_batch, expand_batch, packable)
    from dvs_of_training_framework_tpu.parallel.mesh import \
        split_batch_for_mesh

    rng = np.random.default_rng(5)
    n_events, size = 160, 4
    collated = {
        'events': {
            'x': rng.integers(0, 32, n_events),
            'y': rng.integers(0, 32, n_events),
            'timestamp': rng.uniform(0, 0.04, n_events).astype(np.float32),
            'polarity': rng.choice([-1.0, 1.0], n_events),
            'element_index': np.zeros(n_events, np.int64),
            'sample_index': np.sort(rng.integers(0, size, n_events)),
        },
        'timestamps': np.tile(np.array([0, 0.04], np.float32), size),
        'sample_idx': np.repeat(np.arange(size), 2),
        'images': rng.integers(0, 255, (2 * size, 1, 32, 32))
        .astype(np.float32),
        'size': size,
    }
    for event_shards in (1, 2):
        batch = split_batch_for_mesh(collated, 2, capacity_per_shard=128,
                                     event_shards=event_shards)
        assert packable(batch), event_shards
        for quant in (False, True):
            compact = compact_batch(batch, quantize_ts=quant)
            assert isinstance(compact.events, PackedEventBuffer)
            lead = (2,) if event_shards == 1 else (2, 2)
            assert compact.events.packed.shape == lead + (128,)
            if quant:
                assert compact.events.timestamp.dtype == np.uint16
                assert compact.events.timestamp_scale.shape == lead
            restored = jax.jit(expand_batch)(compact)
            for name in ('x', 'y', 'polarity', 'element_index',
                         'sample_index'):
                np.testing.assert_array_equal(
                    np.asarray(getattr(restored.events, name)),
                    np.asarray(getattr(batch.events, name)),
                    err_msg=f'{name} shards={event_shards} q={quant}')
            t = np.asarray(batch.events.timestamp)
            t_hat = np.asarray(restored.events.timestamp)
            if quant:
                bound = t.max() / 131070 + 1e-9
                assert np.abs(t_hat - t).max() <= bound
            else:
                np.testing.assert_array_equal(t_hat, t)
            np.testing.assert_array_equal(np.asarray(restored.images),
                                          np.asarray(batch.images))
