"""Host->device batch prefetching.

Overlaps host batch preparation (padding + H2D transfer) with device
compute: a background thread pads the next collated batch and starts its
transfer with ``jax.device_put`` while the current training step runs.
TPU analogue of the reference's pinned-memory + worker prefetch
(utils/dataloader.py:39,103-108) on the device side of the boundary.
"""
import queue
import threading

import jax


def prefetch_to_device(batch_iter, prepare_fn, depth: int = 2,
                       device=None):
    """Yield ``(host_batch, device_batch)`` with background preparation.

    Args:
        batch_iter: iterator of host-collated batch dicts.
        prepare_fn: ``host_batch -> device Batch`` (may raise OverflowError;
            the offending batch is yielded with ``device_batch=None`` so the
            caller can skip it).
        depth: number of batches staged ahead.
        device: target device for ``jax.device_put`` (default: default
            device).
    """
    q = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for host_batch in batch_iter:
                try:
                    device_batch = prepare_fn(host_batch)
                    if device is not None:
                        device_batch = jax.device_put(device_batch, device)
                    else:
                        device_batch = jax.device_put(device_batch)
                except OverflowError:
                    device_batch = None
                q.put((host_batch, device_batch))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
