"""Named wall-clock region timers with device synchronisation.

TPU-native analogue of the reference's Megatron-style timers
(reference utils/timer.py:52-132).  Instead of ``torch.cuda.synchronize``
we drain the async dispatch queue with ``jax.block_until_ready`` on a tiny
sentinel computation — on TPU every previously enqueued computation must
complete before the sentinel does.

``FakeTimer`` is the branch-free no-op twin used when ``--timers`` is off
(reference utils/timer.py:19-49).
"""
import time

import psutil


def _sync_devices():
    import jax
    # A no-op transfer forces completion of everything enqueued before it.
    jax.block_until_ready(jax.device_put(0.0))


def get_rank() -> int:
    """Process index in a multi-process JAX run (0 for single process)."""
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def print_rank_0(message):
    if get_rank() == 0:
        print(message)


class FakeTimer:
    """No-op timer registry: keeps the hot loop branch-free."""

    class Timer:
        def __init__(self, name):
            pass

        def start(self):
            pass

        def stop(self):
            pass

        def reset(self):
            pass

        def elapsed(self, reset=True):
            return 0

    def __init__(self):
        self.timers = {}

    def __call__(self, name):
        if name not in self.timers:
            self.timers[name] = self.Timer(name)
        return self.timers[name]

    @staticmethod
    def memory_usage():
        return ''

    def log(self, names, normalizer=1.0, reset=True, memory_breakdown=False):
        pass


class SynchronizedWallClockTimer:
    """Group of named timers; start/stop synchronise the TPU stream."""

    class Timer:
        def __init__(self, name):
            self.name_ = name
            self.elapsed_ = 0.0
            self.started_ = False
            self.start_time = time.time()

        def start(self):
            assert not self.started_, 'timer has already been started'
            _sync_devices()
            self.start_time = time.time()
            self.started_ = True

        def stop(self):
            assert self.started_, 'timer is not started'
            _sync_devices()
            self.elapsed_ += time.time() - self.start_time
            self.started_ = False

        def reset(self):
            self.elapsed_ = 0.0
            self.started_ = False

        def elapsed(self, reset=True):
            started_ = self.started_
            if self.started_:
                self.stop()
            elapsed_ = self.elapsed_
            if reset:
                self.reset()
            if started_:
                self.start()
            return elapsed_

    def __init__(self):
        self.timers = {}

    def __call__(self, name):
        if name not in self.timers:
            self.timers[name] = self.Timer(name)
        return self.timers[name]

    @staticmethod
    def memory_usage():
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats() or {}
            in_use = stats.get('bytes_in_use', 0) / 2 ** 30
            peak = stats.get('peak_bytes_in_use', 0) / 2 ** 30
            limit = stats.get('bytes_limit', 0) / 2 ** 30
            return (f' | hbm_in_use: {in_use:.4f} GB'
                    f' | hbm_peak: {peak:.4f} GB'
                    f' | hbm_limit: {limit:.4f} GB')
        except Exception:
            return ''

    def log(self, names, normalizer=1.0, reset=True, memory_breakdown=False):
        assert normalizer > 0.0
        strings = [f'rank={get_rank()} time (ms)']
        for name in names:
            if name in self.timers:
                elapsed_time = (self.timers[name].elapsed(reset=reset)
                                * 1000.0 / normalizer)
                strings.append('{}: {:.2f}'.format(name, elapsed_time))
        if memory_breakdown:
            strings.append(self.memory_usage())
        print_rank_0(' | '.join(strings))


class ThroughputTimer:
    """Samples/sec + host memory reporting (reference utils/timer.py:135-209)."""

    def __init__(self,
                 batch_size,
                 num_workers=1,
                 start_step=2,
                 steps_per_output=50,
                 monitor_memory=True,
                 logging_fn=None):
        self.start_time = 0
        self.end_time = 0
        self.started = False
        self.batch_size = batch_size or 1
        self.num_workers = num_workers
        self.start_step = start_step
        self.epoch_count = 0
        self.local_step_count = 0
        self.total_step_count = 0
        self.total_elapsed_time = 0
        self.steps_per_output = steps_per_output
        self.monitor_memory = monitor_memory
        if logging_fn is None:
            from .logging import logger
            logging_fn = logger.info
        self.logging = logging_fn

    def update_epoch_count(self):
        self.epoch_count += 1
        self.local_step_count = 0

    def start(self):
        self.started = True
        if self.total_step_count >= self.start_step:
            _sync_devices()
            self.start_time = time.time()

    def stop(self, report_speed=True):
        if not self.started:
            return
        self.started = False
        self.total_step_count += 1
        self.local_step_count += 1
        if self.total_step_count > self.start_step:
            _sync_devices()
            self.end_time = time.time()
            self.total_elapsed_time += self.end_time - self.start_time
            if self.local_step_count % self.steps_per_output == 0:
                if report_speed:
                    self.logging("{}/{}, SamplesPerSec={}".format(
                        self.epoch_count, self.local_step_count,
                        self.avg_samples_per_sec()))
                if self.monitor_memory:
                    virt_mem = psutil.virtual_memory()
                    swap = psutil.swap_memory()
                    self.logging("{}/{}, vm percent: {}, swap percent: {}"
                                 .format(self.epoch_count,
                                         self.local_step_count,
                                         virt_mem.percent, swap.percent))

    def avg_samples_per_sec(self):
        if self.total_step_count > self.start_step:
            samples_per_step = self.batch_size * self.num_workers
            total_step_offset = self.total_step_count - self.start_step
            avg_time_per_step = self.total_elapsed_time / total_step_offset
            return samples_per_step / avg_time_per_step
        return float("-inf")
