"""Dataloader facade: raw vs preprocessed, train vs val parameterisation.

Mirrors the reference facade (utils/dataloader.py): the hardcoded MVSEC
split (train = outdoor_day2, val = outdoor_day1), docker-aware data roots,
and the raw-DataLoader / PreprocessedDataloader choice.  Host batch
assembly replaces torch's DataLoader with a thread-pooled loader
(HDF5/NumPy release the GIL for the heavy parts) plus a bounded prefetch
queue that keeps the TPU fed.
"""
import itertools
import os
from pathlib import Path
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from types import SimpleNamespace

import numpy as np

from ..utils.common import is_inside_docker
from .collate import collate_dense_wrapper, collate_wrapper
from .dataset import Dataset, IterableDataset
from .preprocessed import PreprocessedDataloader

script_dir = Path(__file__).resolve().parent.parent.parent


def choose_data_path(args):
    """Set args.data_path to the MVSEC training-data root.

    Resolution order: $DVS_DATA_PATH override, docker mount, sibling
    ``data/training/mvsec`` directory.
    """
    import os
    override = os.environ.get('DVS_DATA_PATH')
    if override:
        data_path = Path(override)
    elif is_inside_docker():
        data_path = Path('/data/training/mvsec')
    else:
        base_dir = (script_dir / '..').resolve()
        data_path = base_dir / 'data' / 'training' / 'mvsec'
    args.data_path = data_path
    return args


def get_common_dataset_params(args):
    return SimpleNamespace(
        shape=args.shape,
        batch_size=args.mbs,
        num_workers=args.num_workers,
        worker_mode=getattr(args, 'worker_mode', 'thread'),
        min_seq_length=args.min_sequence_length,
        max_seq_length=args.max_sequence_length,
        is_static_seq_length=not args.dynamic_sample_length)


def get_trainset_params(args):
    params = get_common_dataset_params(args)
    params.path = args.data_path / 'outdoor_day2'
    params.augmentation = True
    params.collapse_length = args.cl
    params.shuffle = True
    params.infinite = True
    params.is_raw = args.is_raw
    params.event_image_fn = None
    params.preprocessed_dataset_path = getattr(
        args, 'preprocessed_dataset_path', None)
    params.cache_dir = getattr(args, 'cache_dir', None)
    params.cache_size = getattr(args, 'cache_size', 0)
    return params


def get_valset_params(args):
    params = get_common_dataset_params(args)
    params.path = args.data_path / 'outdoor_day1'
    params.augmentation = False
    params.collapse_length = 1
    params.shuffle = False
    params.infinite = False
    params.is_raw = True  # only raw events are used for validation
    params.preprocessed_dataset_path = None
    params.cache_dir = None
    params.cache_size = 0
    return params


class HostDataLoader:
    """Collated batch loader with worker threads/processes + prefetch.

    For a finite dataset iterates once; for an IterableDataset streams
    forever.  ``num_workers`` workers load/augment samples concurrently;
    up to ``prefetch`` collated batches are staged ahead.

    ``worker_mode`` selects the worker kind:

    - ``'thread'`` (default): cheap, shares the dataset object; HDF5 and
      NumPy release the GIL for the heavy reads, but the Python-level
      augmentation math serialises — measured ~1.8x at 4 threads on one
      core (PERFORMANCE.md feed-rate matrix).
    - ``'process'``: a forked worker pool (the raw augmenting path is
      GIL-bound at scale; the reference gets the same effect from
      torch DataLoader's worker processes).  Each worker re-seeds
      ``np.random`` so augmentation draws do not repeat across the
      forked copies; samples return to the parent by pickle.  Requires
      a picklable dataset impl (DatasetImpl holds no live HDF5 handles).
    """

    def __init__(self, dataset, batch_size, collate_fn=collate_wrapper,
                 num_workers=0, prefetch=2, drop_last=False,
                 worker_mode='thread'):
        assert worker_mode in ('thread', 'process'), worker_mode
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.worker_mode = worker_mode
        self.infinite = not hasattr(dataset, '__len__')

    def __len__(self):
        if self.infinite:
            raise TypeError('infinite loader has no length')
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batched_samples(self):
        if self.infinite:
            indices = self.dataset.index_stream()
            impl = self.dataset.impl
        else:
            indices = iter(range(len(self.dataset)))
            impl = self.dataset
        if self.num_workers > 0 and self.worker_mode == 'process':
            # fork (not spawn): spawn would re-import the interpreter —
            # including this environment's sitecustomize, which selects a
            # TPU platform — per worker; forked children inherit the
            # parent cheaply and never touch jax.  Each worker re-seeds
            # np.random (forked copies share the parent's state and
            # would draw IDENTICAL augmentations otherwise).
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor
            ctx = multiprocessing.get_context('fork')
            seed = int.from_bytes(os.urandom(4), 'little')
            with ProcessPoolExecutor(
                    self.num_workers, mp_context=ctx,
                    initializer=_process_worker_init,
                    initargs=(impl, seed)) as pool:
                samples = _lazy_map(pool, _process_worker_getitem, indices,
                                    window=2 * self.num_workers)
                yield from self._batches_from(samples)
        elif self.num_workers > 0:
            with ThreadPoolExecutor(self.num_workers) as pool:
                samples = _lazy_map(pool, impl.__getitem__, indices,
                                    window=2 * self.num_workers)
                yield from self._batches_from(samples)
        else:
            yield from self._batches_from(impl[i] for i in indices)

    def _batches_from(self, samples):
        while True:
            chunk = list(itertools.islice(samples, self.batch_size))
            if not chunk:
                return
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self.collate_fn(chunk)
            if len(chunk) < self.batch_size:
                return

    def __iter__(self):
        if self.prefetch <= 1:
            yield from self._batched_samples()
            return
        q = queue.Queue(self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def offer(item):
            """put() that gives up once the consumer has left."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self._batched_samples():
                    if not offer(batch):
                        return
                offer(sentinel)
            except Exception as exc:  # surfaced on the consumer side
                offer(exc)
            except BaseException:     # interpreter teardown: die quietly
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
            # The consumer may abandon the loop (break / exception).  The
            # producer MUST be stopped before interpreter exit: a daemon
            # thread inside an h5py read at finalisation deadlocks h5py's
            # atexit hook (observed as a hard hang after main() returns).
            stop.set()
            thread.join(timeout=10)


_WORKER_IMPL = None


def _process_worker_init(impl, seed):
    """Forked-worker initializer: install the dataset impl and de-alias
    the inherited np.random state (each worker gets seed + pid)."""
    global _WORKER_IMPL
    _WORKER_IMPL = impl
    np.random.seed((seed + os.getpid()) % 2 ** 32)


def _process_worker_getitem(idx):
    return _WORKER_IMPL[idx]


def _lazy_map(pool, fn, it, window):
    """Pool map with a bounded in-flight window (safe for infinite
    iterators, unlike ``Executor.map`` which consumes eagerly)."""
    from collections import deque
    futures = deque()
    try:
        for _ in range(window):
            futures.append(pool.submit(fn, next(it)))
    except StopIteration:
        pass
    while futures:
        result = futures.popleft().result()
        try:
            futures.append(pool.submit(fn, next(it)))
        except StopIteration:
            pass
        yield result


def get_dataset(params, event_image_fn=None):
    kwargs = {'path': params.path,
              'shape': params.shape,
              'augmentation': params.augmentation,
              'collapse_length': params.collapse_length,
              'is_raw': params.is_raw,
              'min_seq_length': params.min_seq_length,
              'max_seq_length': params.max_seq_length,
              'is_static_seq_length': params.is_static_seq_length,
              'event_image_fn': event_image_fn}
    if params.infinite:
        return IterableDataset(shuffle=params.shuffle, **kwargs)
    return Dataset(**kwargs)


def get_dataloader(params, sample_idx=0, process_only_once=True,
                   event_image_fn=None):
    """Build the loader described by ``params`` (see get_*set_params).

    ``params.process_index``/``process_count`` (default single-process)
    shard the stream across hosts: the preprocessed loader strides so
    each process reads only its slice of every global batch; the raw
    loader simply serves ``params.batch_size`` (the LOCAL batch) from
    this process's own independently-seeded sample stream.
    """
    process_index = getattr(params, 'process_index', 0)
    process_count = getattr(params, 'process_count', 1)
    if params.preprocessed_dataset_path is not None:
        loader = PreprocessedDataloader(
            path=params.preprocessed_dataset_path,
            batch_size=params.batch_size,
            is_raw=params.is_raw,
            cache_dir=params.cache_dir,
            cache_size=params.cache_size,
            process_only_once=process_only_once,
            process_index=process_index,
            process_count=process_count)
        loader.set_index(sample_idx)
        return loader
    collate_fn = collate_wrapper if params.is_raw else collate_dense_wrapper
    return HostDataLoader(get_dataset(params, event_image_fn),
                          batch_size=params.batch_size,
                          collate_fn=collate_fn,
                          num_workers=params.num_workers,
                          worker_mode=getattr(params, 'worker_mode',
                                              'thread'))
