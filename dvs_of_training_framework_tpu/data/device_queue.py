"""Device-side input queue: stage windows of K batches in ONE upload.

Measured on the tunnelled v5e (PERFORMANCE.md round 2): a training step on
freshly-uploaded input buffers pays a large first-use penalty (~90-440 ms
vs ~32 ms on staged buffers), so uploading per step caps training at a few
steps/s no matter how fast the step itself is.  Staging a WINDOW of K
padded batches as one stacked pytree amortises that penalty over K steps;
the jitted step selects batch ``micro_step % K`` with an on-device dynamic
slice (training/state.py).  On directly-attached TPUs the same design
still removes K-1 of every K dispatch/transfer events.

The host->device pipeline (``prefetch_windows``) runs on a background
thread like data/prefetch.py: while the device executes window w, the host
collects, stacks, uploads, and materialises window w+1.
"""
import queue
import threading

import jax
import numpy as np


def stack_batches(batches):
    """Stack K device-ready Batch pytrees into one window pytree.

    Every array leaf gains a leading K axis; the static ``size`` field must
    agree across the window.
    """
    assert len({b.size for b in batches}) == 1, \
        'window batches must share a static batch size'
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def prefetch_windows(batch_iter, prepare_fn, window: int, depth: int = 2,
                     place_fn=None, quantize_ts: bool = False,
                     pool_events: bool = False, data_wire: str = 'f32'):
    """Yield ``(host_batches, device_window, n_valid)`` tuples.

    Args:
        batch_iter: iterator of host-collated batch dicts.
        prepare_fn: ``host_batch -> device-ready Batch`` (may raise
            OverflowError; the offending batch is reported via the
            ``skipped`` list on the next yielded window).
        window: K, batches staged per upload.
        depth: windows staged ahead (clamped to >= 1: a window queue is
            inherently one-ahead — depth 0 would make queue.Queue
            UNBOUNDED and let the producer stage every window on device).
        place_fn: ``stacked_host_window -> device window`` upload override
            (default ``jax.device_put``); the mesh path passes
            ``shard_host_batch(..., window=True)`` here so the staged
            window lands with the right NamedSharding.
        quantize_ts: use the uint16 event-timestamp wire (schema
            ``pack_events_wire``; requires the packed wire, ignored on
            the int16 fallback).  Held constant for the whole stream so
            the window pytree structure never changes.
        pool_events: ship only VALID events per window (one flat pool +
            per-batch offsets, ``schema.PooledEventWire``) instead of K
            capacity-padded buffers — bit-identical values, ~`1 - fill`
            fewer event bytes on the wire.  Requires the packed wire
            (falls back to padded stacking otherwise).  Mesh-split
            batches pool per shard cell (schema.pool_packed_wires) and
            the mesh ``place_fn`` shards the pool's leading axes.  The
            pool length grows monotonically (largest seen),
            so shape-driven recompiles are bounded by upward drift in
            the window's event count.

    Each yielded tuple:
        host_batches: the K (or fewer, for the final window) collated host
            batches, in step order.
        device_window: stacked Batch on device (leading K axis; a partial
            final window is repeat-padded to K for shape stability — only
            the first ``n_valid`` slices are stepped).
        skipped: host batches dropped by OverflowError since the previous
            window (the caller logs/accounts them).
    """
    if place_fn is None:
        place_fn = jax.device_put
    q = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    sentinel = object()

    def offer(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            pending = []
            skipped = []

            # the wire format (bit-packed vs int16 events) is decided on
            # the FIRST prepared batch and then held fixed: a per-batch
            # flip would change the window pytree structure mid-stream
            # (stack_batches would crash / the step would recompile).
            # pack_events_wire value-checks every batch and raises
            # OverflowError for fields that no longer fit (ragged
            # streams), which lands in the skipped-batch report path.
            from .schema import compact_batch, packable, pool_packed_wires
            wire_pack = [None]
            min_pool = [0]   # monotonic pool length (see pool_events doc)

            def flush():
                if not pending:
                    return True
                hosts, prepared = zip(*pending)
                n_valid = len(prepared)
                padded = list(prepared) + [prepared[-1]] * \
                    (window - n_valid)
                if pool_events and wire_pack[0]:
                    wire = pool_packed_wires([b.events for b in padded],
                                             n_valid, min_pool=min_pool[0])
                    min_pool[0] = int(wire.packed.shape[0])
                    stacked = stack_batches(
                        [b.replace(events=None) for b in padded])
                    window_tree = stacked.replace(events=wire)
                else:
                    window_tree = stack_batches(padded)
                device_window = place_fn(window_tree)
                # materialise on this thread so the consumer never blocks
                # on (or interleaves with) an in-flight transfer
                jax.block_until_ready(device_window)
                ok = offer((list(hosts), device_window, n_valid,
                            list(skipped)))
                pending.clear()
                skipped.clear()
                return ok

            for host_batch in batch_iter:
                if stop.is_set():
                    break
                try:
                    prepared = prepare_fn(host_batch)
                    if wire_pack[0] is None:
                        wire_pack[0] = packable(prepared)
                    # narrow to wire dtypes before upload; the jitted
                    # step expands on device (schema.expand_batch).
                    # pack_events_wire raises OverflowError on fields
                    # that don't fit -> the batch joins the skip report
                    pending.append((host_batch,
                                    compact_batch(prepared,
                                                  pack=wire_pack[0],
                                                  quantize_ts=quantize_ts
                                                  and wire_pack[0],
                                                  data_wire=data_wire)))
                except OverflowError:
                    skipped.append(host_batch)
                    continue
                if len(pending) == window:
                    if not flush():
                        break
            else:
                if flush():
                    offer(sentinel)
        except Exception as exc:   # surfaced on the consumer side
            offer(exc)
        except BaseException:      # interpreter teardown: die quietly
            return
        finally:
            close = getattr(batch_iter, 'close', None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        thread.join(timeout=10)
