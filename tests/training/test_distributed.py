"""ShardedBatchSkipper: the zero-communication multi-host skip rule.

Every process must take the SAME oversized-batch decision without seeing
the other processes' slices; the rule is a pure function of the
precomputed per-sample event counts (data/preprocessed.py
``per_sample_event_counts``), so it is testable host-side with a fake
loader.
"""
import numpy as np

from dvs_of_training_framework_tpu.parallel.distributed import \
    ShardedBatchSkipper


class FakeLoader:
    """Records the stream operations; serves the global-batch start."""

    def __init__(self, global_batch):
        self.global_batch = global_batch
        self.pos = 0
        self.skipped = []

    def __next__(self):
        served = self.pos
        self.pos += self.global_batch
        return served

    def skip_batch(self):
        self.skipped.append(self.pos)
        self.pos += self.global_batch


def brute_force_overflow(counts, start, global_batch, n_shards, cap):
    """Reference rule: any per-device slice of the global batch > cap."""
    n = counts.size
    spd = global_batch // n_shards
    idx = (np.arange(start, start + global_batch) % n)
    per_shard = counts[idx].reshape(n_shards, spd).sum(axis=1)
    return bool((per_shard > cap).any())


def test_skip_rule_matches_brute_force():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, 100, size=24).astype(np.int64)
    counts[5] = 1000   # poison one sample
    gb, n_shards, cap = 8, 4, 150
    loader = FakeLoader(gb)
    stream = iter(ShardedBatchSkipper(loader, counts, global_batch=gb,
                                      n_shards=n_shards,
                                      capacity_per_shard=cap))
    served = [next(stream) for _ in range(9)]   # 3 epochs of 3 good batches
    # replay the rule by hand over consecutive stride positions
    expect_served, expect_skipped, pos = [], [], 0
    while len(expect_served) < len(served):
        if brute_force_overflow(counts, pos % counts.size, gb, n_shards,
                                cap):
            expect_skipped.append(pos)
        else:
            expect_served.append(pos)
        pos += gb
    assert served == expect_served
    assert loader.skipped == expect_skipped
    assert loader.skipped   # the poison sample fired at least once


def test_skip_rule_identical_across_processes_and_resume():
    """The decisions depend only on (counts, cursor) — identical for every
    process, and replayed identically from a resume position."""
    rng = np.random.default_rng(1)
    counts = rng.integers(1, 80, size=32).astype(np.int64)
    counts[10] = 500
    gb, n_shards, cap = 8, 2, 300

    def decisions(start_sample, n):
        loader = FakeLoader(gb)
        loader.pos = (start_sample // gb) * gb
        s = ShardedBatchSkipper(loader, counts, global_batch=gb,
                                n_shards=n_shards, capacity_per_shard=cap,
                                start_sample=start_sample)
        it = iter(s)
        return [next(it) for _ in range(n)], list(loader.skipped)

    a = decisions(0, 8)
    b = decisions(0, 8)
    assert a == b   # process-independent (pure function of counts)
    # resume from the position after 2 served batches replays the tail
    served, _ = a
    resumed, _ = decisions(served[2], 6)
    assert resumed == served[2:]


def test_wrapping_range_sums():
    """Range sums that wrap the epoch boundary are exact."""
    counts = np.arange(1, 7, dtype=np.int64)    # sum 21
    s = ShardedBatchSkipper(FakeLoader(6), counts, global_batch=6,
                            n_shards=1, capacity_per_shard=10 ** 9)
    assert s._range_events(4, 8) == 5 + 6 + 1 + 2
    assert s._range_events(0, 6) == 21
    assert s._range_events(5, 11) == 6 + 21 - 6
    assert s._range_events(8, 10) == 3 + 4


def test_dense_channel_counts_and_skipper(tmp_path):
    """Dense quantized streams get the same zero-communication rule,
    keyed on per-sample CHANNEL counts (train_flownet wires capacity to
    the stream's own worst per-shard window, so a static-length stream
    never skips — identical to the single-process loop — while a
    mixed-length stream skips deterministically on every process)."""
    from dvs_of_training_framework_tpu.data import codec
    from dvs_of_training_framework_tpu.data.preprocessed import \
        per_sample_channel_counts

    C, H, W = 3, 8, 8
    shards = tmp_path / 'quant'
    shards.mkdir()
    for j, n_samples in enumerate((2, 3)):
        batch = {
            'data': np.zeros((n_samples, C, H, W), np.float32),
            'timestamps': np.tile(np.array([0.0, 1.0], np.float64),
                                  n_samples),
            'sample_idx': np.repeat(np.arange(n_samples), 2),
            'images': np.zeros((2 * n_samples, H, W), np.uint8),
            'augmentation_params': {
                'collapse_length': np.ones(n_samples, np.int64)},
            'size': n_samples}
        codec.write_encoded_batch(shards / f'{j}.hdf5',
                                  codec.encode_quantized_batch(batch))

    counts = per_sample_channel_counts(shards)
    np.testing.assert_array_equal(counts, np.full(5, C, np.int64))

    # static stream + capacity == worst window -> never skips
    gb, n_shards = 4, 2
    spd = gb // n_shards
    cap = int(counts[:spd].sum())
    loader = FakeLoader(gb)
    it = iter(ShardedBatchSkipper(loader, counts, global_batch=gb,
                                  n_shards=n_shards,
                                  capacity_per_shard=cap,
                                  unit='channels'))
    assert [next(it) for _ in range(4)] == [0, 4, 8, 12]
    assert loader.skipped == []

    # a mixed-length stream (dynamic sample length) skips the batch
    # whose per-shard channel window exceeds the capacity — identically
    # for every process, from the same counts
    mixed = counts.copy()
    mixed[1] = 5 * C
    decisions = []
    for _proc in range(2):
        loader = FakeLoader(gb)
        it = iter(ShardedBatchSkipper(loader, mixed, global_batch=gb,
                                      n_shards=n_shards,
                                      capacity_per_shard=cap,
                                      unit='channels'))
        served = [next(it) for _ in range(4)]
        decisions.append((served, list(loader.skipped)))
    assert decisions[0] == decisions[1]
    assert decisions[0][1], 'oversized mixed batch must be skipped'

    # raw shards (no channels_per_sample) are refused: wrong stream kind
    import h5py
    import pytest
    raw_dir = tmp_path / 'raw_shards'
    raw_dir.mkdir()
    with h5py.File(raw_dir / '0.hdf5', 'w') as f:
        f.create_group('events')
    with pytest.raises(ValueError):
        per_sample_channel_counts(raw_dir)
