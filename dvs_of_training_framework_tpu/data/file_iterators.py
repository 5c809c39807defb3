"""Background-thread file prefetch cache for slow storage.

TPU-VM training streams preprocessed HDF5 shards from remote/slow storage;
a daemon thread copies upcoming shards into a fast local cache directory
(SSD) ahead of the consumer.  Two policies match the reference
(utils/file_iterators.py):

- ``CachingFileIterator`` (strict): every file is processed exactly once per
  epoch; the consumer blocks until the next file is cached, and a full cache
  of unreleased files raises ``CacheIsFullError``.
- ``NonBlockingFileIterator``: may re-serve already-cached files while the
  next one downloads (better device utilisation when loading is slower than
  processing).

Flow control uses a bounded token queue: the loader thread must deposit a
token before downloading, so at most ``num_non_cached_files`` downloads sit
outside the cache.  The deterministic token-driven tests in
tests/utils/test_file_iterator.py pin the step-by-step cache states.
"""
from abc import ABC, abstractmethod
import copy
from pathlib import Path
import queue
import shutil
import tempfile
import threading


class CacheIsFullError(Exception):
    pass


class DummyFile:
    """A named file whose release is a no-op (not cache-managed)."""

    def __init__(self, filename):
        self.filename = filename

    @property
    def name(self):
        return self.filename

    def release(self):
        pass


class ReleasableFile:
    """A cached file removed from disk once released by the consumer.

    ``in_use`` needs no lock: only the consumer thread flips it and removes
    the file.
    """

    def __init__(self, filename):
        self.filename = Path(filename)
        self.in_use = True

    def _assert_exists(self):
        assert self.filename.is_file(), \
            f"File {self.filename} doesn't exist"

    @property
    def name(self):
        self._assert_exists()
        return self.filename

    def release(self):
        self._assert_exists()
        self.in_use = False

    def is_in_use(self):
        self._assert_exists()
        return self.in_use

    def start_use(self):
        self._assert_exists()
        self.in_use = True

    def remove(self):
        self._assert_exists()
        assert not self.in_use, 'Currently used file cannot be removed'
        self.filename.unlink()


class FileIterator:
    """Cycle over a file list without caching."""

    def __init__(self, files):
        self.files = copy.deepcopy(list(files))
        self.index = 0

    def next(self, blocking=True):
        result = self.files[self.index]
        self.index = (self.index + 1) % len(self.files)
        return DummyFile(result)

    def reset(self):
        self.index = 0


class FileLoader:
    """Copy a file into the cache dir under a unique temporary name."""

    def __init__(self, cache_dir):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(exist_ok=True, parents=True)

    def __call__(self, filename):
        with tempfile.NamedTemporaryFile(dir=self.cache_dir,
                                         suffix=Path(filename).suffix,
                                         delete=False) as f:
            cached = Path(f.name)
        shutil.copyfile(filename, cached)
        return cached


class _CachingIteratorBase(ABC):
    def __init__(self,
                 remote_files,
                 file_loader,
                 num_files_to_cache,
                 num_non_cached_files):
        self.remote_files = copy.deepcopy(list(remote_files))
        self.request_queue = queue.Queue()
        # Bounded token queue = number of downloaded-but-not-yet-cached
        # files allowed in flight.
        self.token_queue = queue.Queue(num_non_cached_files)
        self.response_queue = queue.Queue()

        self.cached_files = []   # files currently in the cache
        self.idx = 0             # next cache slot to serve
        self.num_waited = 0      # requested but not yet received files
        self.cached_end = 0      # next remote file to request

        self._init_cache(num_files_to_cache)

        def loader_thread():
            while True:
                remote = self.request_queue.get()
                if remote is None:
                    return
                # blocks while too many files are downloaded-but-uncached
                self.token_queue.put(None)
                self.response_queue.put(file_loader(remote))

        self.read_thread = threading.Thread(target=loader_thread,
                                            daemon=True)
        self.read_thread.start()

    def _init_cache(self, num_files_to_cache):
        num_files_to_cache = min(num_files_to_cache, len(self.remote_files))
        for _ in range(num_files_to_cache):
            self._request_next_file()
        self.num_files_to_cache = num_files_to_cache

    def _request_next_file(self):
        self.request_queue.put(self.remote_files[self.cached_end])
        self.cached_end = (self.cached_end + 1) % len(self.remote_files)
        self.num_waited += 1

    def _evict_front(self):
        assert len(self.cached_files) > 0
        file = self.cached_files.pop(0)
        file.remove()
        self.idx = max(1, self.idx) - 1

    def _receive_file(self, block):
        # may raise queue.Empty when block is False
        result = ReleasableFile(self.response_queue.get(block))
        # consumer received the file: free its token (never blocks)
        self.token_queue.get(True)
        self.num_waited -= 1
        self._request_next_file()
        return result

    @abstractmethod
    def next(self, block=True):
        ...

    def reset(self):
        """Drop all cached and in-flight files; restart from file 0."""
        while self.cached_files:
            file = self.cached_files.pop()
            file.release()
            file.remove()
        for _ in range(self.num_waited):
            result = ReleasableFile(self.response_queue.get(True))
            self.token_queue.get(True)
            result.release()
            result.remove()
        self.num_waited = 0
        self.cached_end = 0
        self.idx = 0
        self._init_cache(self.num_files_to_cache)


class CachingFileIterator(_CachingIteratorBase):
    """Strict process-once iterator (reference FileIteratorWithCache)."""

    def next(self, block=True):
        """Return the next cached file, or None when non-blocking and
        nothing is ready.

        Raises:
            CacheIsFullError: every cache slot holds an unreleased file.
        """
        # evict files the consumer has released
        while self.cached_files and not self.cached_files[0].is_in_use():
            self._evict_front()
        if self.idx == self.num_files_to_cache:
            raise CacheIsFullError(
                'List of the cached files is full. Please release the '
                f"oldest file '{self.cached_files[0].name}'")
        # pull as many downloaded files into the cache as possible
        while len(self.cached_files) < self.num_files_to_cache:
            try:
                is_blocking = block and len(self.cached_files) <= self.idx
                self.cached_files.append(self._receive_file(is_blocking))
            except queue.Empty:
                break
        if len(self.cached_files) <= self.idx:
            return None
        self.idx += 1
        return self.cached_files[self.idx - 1]


class NonBlockingFileIterator(_CachingIteratorBase):
    """May re-serve cached files while the next download is in flight
    (reference FileIteratorNonBlocking)."""

    def next(self, block=True):
        while (len(self.cached_files) < self.num_files_to_cache
               or not self.cached_files[0].is_in_use()):
            try:
                block = block and len(self.cached_files) == 0
                result = self._receive_file(block)
                if (len(self.cached_files) == self.num_files_to_cache
                        and not self.cached_files[0].is_in_use()):
                    self._evict_front()
                self.cached_files.append(result)
            except queue.Empty:
                break
        assert not block or len(self.cached_files) > 0
        if len(self.cached_files) == 0:
            return None
        self.idx = self.idx % len(self.cached_files)
        result = self.cached_files[self.idx]
        result.start_use()
        self.idx += 1
        return result


# Backwards-compatible aliases matching the reference class names.
FileIteratorWithCache = CachingFileIterator
FileIteratorNonBlocking = NonBlockingFileIterator


def create_file_iterator(files,
                         cache_dir=None,
                         num_files_in_cache=5,
                         process_only_once=True):
    """Select and build the right iterator for the cache configuration.

    Mirrors reference utils/file_iterators.py:63-94 including the
    cache-everything fast path: when the cache can hold every file, all
    files are copied up front and a plain FileIterator serves them.
    """
    files = [Path(f) for f in files]
    if cache_dir is None:
        return FileIterator(files)
    if not process_only_once and num_files_in_cache < len(files):
        iterator_class = NonBlockingFileIterator
    else:
        iterator_class = CachingFileIterator
    if num_files_in_cache < len(files):
        cache_size = max(num_files_in_cache - 1, 1)
        files_not_in_cache = 1
    else:
        cache_size = num_files_in_cache
        files_not_in_cache = 2

    iterator = iterator_class(files,
                              FileLoader(cache_dir),
                              cache_size,
                              files_not_in_cache)
    if num_files_in_cache < len(files):
        return iterator
    # cache everything up front, then iterate without management overhead
    new_files = [iterator.next().name for _ in files]
    return FileIterator(new_files)
