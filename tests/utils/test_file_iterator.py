"""Deterministic concurrency tests for the prefetch cache.

Technique from the reference test-suite: the loader thread only advances
when the test feeds it a token, so cache states can be asserted
step-by-step without sleeps or clock dependence.
"""
import queue
from pathlib import Path

import pytest

from dvs_of_training_framework_tpu.data.file_iterators import (
    CacheIsFullError, CachingFileIterator, FileLoader,
    NonBlockingFileIterator, create_file_iterator)


class GatedFileLoader(FileLoader):
    """FileLoader that blocks until the test grants a copy permit."""

    def __init__(self, cache_dir):
        super().__init__(cache_dir)
        self.permits = queue.Queue()

    def allow(self, n=1):
        for _ in range(n):
            self.permits.put(None)

    def __call__(self, filename):
        self.permits.get()
        return super().__call__(filename)


def make_files(tmp_path, n=6):
    src = tmp_path / 'remote'
    src.mkdir()
    files = []
    for i in range(n):
        f = src / f'{i}.hdf5'
        f.write_text(str(i))
        files.append(f)
    return files


def content(file):
    return Path(file.name).read_text()


def test_strict_iterator_step_by_step(tmp_path):
    files = make_files(tmp_path)
    loader = GatedFileLoader(tmp_path / 'cache')
    it = CachingFileIterator(files, loader, num_files_to_cache=2,
                             num_non_cached_files=1)
    # nothing loaded yet: non-blocking next returns None
    assert it.next(block=False) is None
    loader.allow(1)
    f0 = it.next()           # blocks until file 0 is cached
    assert content(f0) == '0'
    # file 1 not loaded yet
    assert it.next(block=False) is None
    loader.allow(1)
    f1 = it.next()
    assert content(f1) == '1'
    # cache full of unreleased files -> strict policy refuses
    with pytest.raises(CacheIsFullError):
        it.next(block=False)
    # releasing the oldest frees a slot
    f0.release()
    loader.allow(1)
    f2 = it.next()
    assert content(f2) == '2'
    f1.release()
    f2.release()


def test_strict_iterator_reset(tmp_path):
    files = make_files(tmp_path)
    loader = GatedFileLoader(tmp_path / 'cache')
    it = CachingFileIterator(files, loader, num_files_to_cache=2,
                             num_non_cached_files=1)
    loader.allow(1)
    f0 = it.next()
    assert content(f0) == '0'
    f0.release()
    loader.allow(4)  # let in-flight loads finish so reset can drain
    it.reset()
    loader.allow(1)
    again = it.next()
    assert content(again) == '0'
    again.release()


def test_nonblocking_iterator_reserves_cached(tmp_path):
    files = make_files(tmp_path)
    loader = GatedFileLoader(tmp_path / 'cache')
    it = NonBlockingFileIterator(files, loader, num_files_to_cache=2,
                                 num_non_cached_files=1)
    loader.allow(1)
    f0 = it.next()
    assert content(f0) == '0'
    f0.release()
    # file 1 still loading: the non-blocking policy re-serves file 0
    again = it.next()
    assert content(again) == '0'
    again.release()
    loader.allow(1)
    _wait_for_response(it)
    f1 = it.next()
    assert content(f1) == '1'
    f1.release()


def _wait_for_response(it, timeout=5.0):
    """Wait until the loader thread has deposited a finished file (keeps the
    non-blocking assertions deterministic without sleeping in the
    protocol itself)."""
    import time
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if it.response_queue.qsize() > 0:
            return
        time.sleep(0.005)
    raise TimeoutError('loader thread produced no file')


def test_cache_everything_fast_path(tmp_path):
    files = make_files(tmp_path, n=3)
    it = create_file_iterator(files, cache_dir=tmp_path / 'cache',
                              num_files_in_cache=5)
    # all files cached up front; iteration cycles without management
    seen = [Path(it.next().name).read_text() for _ in range(6)]
    assert seen == ['0', '1', '2', '0', '1', '2']


def test_no_cache_dir_iterates_in_place(tmp_path):
    files = make_files(tmp_path, n=3)
    it = create_file_iterator(files, cache_dir=None)
    f = it.next()
    assert Path(f.name) == files[0]
    f.release()  # no-op
    assert Path(it.next().name) == files[1]
