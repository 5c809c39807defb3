"""Streaming loader over preprocessed encoded HDF5 shards.

Sequential batch reader with cross-file reads, ``.info`` sidecar size
caching, and exact resume by global sample index (reference
utils/dataset.py:799-954).  ``set_index`` re-seeks the stream so a resumed
run continues from the same sample the checkpoint recorded.
"""
from pathlib import Path

import h5py
import numpy as np
import tqdm
import yaml

from . import codec
from .file_iterators import create_file_iterator


class PreprocessedDataloader:
    """Iterates batches out of encoded shards.

    Attributes:
        sample_index: next sample in the current file.
        batch_size: samples per batch.
        files: shard paths.
        length: total samples in the dataset.
    """

    def __init__(self,
                 path: Path,
                 batch_size: int,
                 is_raw: bool,
                 cache_dir=None,
                 cache_size=0,
                 process_only_once=True,
                 show_progress=True):
        self.batch_size = batch_size
        self.is_raw = is_raw
        self.files = sorted(Path(path).glob('*.hdf5'),
                            key=lambda x: int(x.stem))
        assert len(self.files) > 0, \
            f'No preprocessed dataset at {path} (no .hdf5 files)'
        self.iterator = create_file_iterator(
            self.files, cache_dir, process_only_once=process_only_once,
            num_files_in_cache=cache_size)
        self.sample_index = 0
        sizes = []
        files = self.files
        if show_progress:
            files = tqdm.tqdm(files,
                              desc='Reading information about the dataset')
        for file in files:
            sizes.append(self._file2size(file, save_info=True))
        self.length = sum(sizes)
        self.current_file = self.iterator.next()

    @staticmethod
    def _hdf5file2size(filename):
        with h5py.File(filename, 'r') as f:
            return len(f['elements_per_sample'])

    def _file2size(self, filename, save_info=False):
        """Sample count of a shard, memoised in a ``.info`` yaml sidecar."""
        filename = Path(filename)
        info_filename = filename.parent / (filename.stem + '.info')
        if info_filename.is_file():
            return yaml.safe_load(info_filename.read_text())['size']
        size = self._hdf5file2size(filename)
        if save_info:
            info_filename.write_text(yaml.dump({'size': size}))
        return size

    def set_index(self, idx: int):
        """Seek the stream so the next sample served is global index
        ``idx % length`` (deterministic resume)."""
        self.sample_index = idx % self.length
        self.current_file.release()
        self.iterator.reset()
        self.current_file = self.iterator.next()
        while True:
            file_size = self._file2size(self.current_file.name)
            if self.sample_index < file_size:
                break
            self.sample_index -= file_size
            self.current_file.release()
            self.current_file = self.iterator.next()

    def __len__(self):
        return self.length

    def __iter__(self):
        return self

    @staticmethod
    def _read_raw_batch(descriptor, begin, end):
        events_per_element = np.asarray(
            descriptor['events']['events_per_element'])
        elements_per_sample = np.asarray(descriptor['elements_per_sample'])
        return codec.read_encoded_batch(descriptor, events_per_element,
                                        elements_per_sample, begin, end)

    @staticmethod
    def _read_quantized_batch(descriptor, begin, end):
        channels_per_sample = np.asarray(descriptor['channels_per_sample'])
        elements_per_sample = np.asarray(descriptor['elements_per_sample'])
        return codec.read_encoded_quantized_batch(
            descriptor, channels_per_sample, elements_per_sample, begin, end)

    def __next__(self):
        """Read the next batch, spanning file boundaries when needed."""
        num2read = self.batch_size
        batches = []
        read_fun = (self._read_raw_batch if self.is_raw
                    else self._read_quantized_batch)
        decode_fun = (codec.decode_batch if self.is_raw
                      else codec.decode_quantized_batch)
        while num2read > 0:
            left = self._file2size(self.current_file.name) \
                - self.sample_index
            cur_num2read = min(left, num2read)
            next_sample_index = self.sample_index + cur_num2read
            if cur_num2read > 0:
                with h5py.File(self.current_file.name, 'r') as f:
                    batches.append(read_fun(f, self.sample_index,
                                            next_sample_index))
            self.sample_index = next_sample_index
            num2read -= cur_num2read
            if num2read > 0:
                self.current_file.release()
                self.current_file = self.iterator.next()
                self.sample_index = 0
        encoded_batch = codec.join_batches(batches)
        return decode_fun(encoded_batch)
