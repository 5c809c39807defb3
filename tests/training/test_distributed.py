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
