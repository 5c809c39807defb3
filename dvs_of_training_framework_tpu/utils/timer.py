"""Named wall-clock region timers with device synchronisation.

TPU-native analogue of the reference's Megatron-style timers
(reference utils/timer.py).  Instead of ``torch.cuda.synchronize`` the
start/stop edges drain the async dispatch queue with
``jax.block_until_ready`` on a sentinel transfer — on TPU every previously
enqueued computation completes before the sentinel does.

``FakeTimer`` is the no-op twin that keeps the hot loop branch-free when
``--timers`` is off.  ``ThroughputTimer`` reports samples/sec plus host
memory pressure.
"""
import time

import psutil


def _sync_devices():
    import jax
    # a no-op transfer completes only after everything enqueued before it
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


class _RegionTimer:
    """One named region; supports use as a context manager."""

    __slots__ = ('name', '_elapsed', '_since')

    def __init__(self, name):
        self.name = name
        self._elapsed = 0.0
        self._since = None

    def start(self):
        assert self._since is None, f'timer {self.name} already started'
        _sync_devices()
        self._since = time.perf_counter()

    def stop(self):
        assert self._since is not None, f'timer {self.name} not started'
        _sync_devices()
        self._elapsed += time.perf_counter() - self._since
        self._since = None

    def reset(self):
        self._elapsed = 0.0
        self._since = None

    def elapsed(self, reset=True):
        running = self._since is not None
        if running:
            self.stop()
        value = self._elapsed
        if reset:
            self.reset()
        if running:
            self.start()
        return value

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


class _NullTimer:
    __slots__ = ()

    def start(self):
        pass

    def stop(self):
        pass

    def reset(self):
        pass

    def elapsed(self, reset=True):
        return 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass


class _TimerRegistry:
    timer_cls = _RegionTimer

    def __init__(self):
        self.timers = {}

    def __call__(self, name):
        timer = self.timers.get(name)
        if timer is None:
            timer = self.timers[name] = self.timer_cls(name)
        return timer


class FakeTimer(_TimerRegistry):
    """No-op registry: zero overhead when timing is disabled."""
    timer_cls = staticmethod(lambda name: _NullTimer())

    @staticmethod
    def memory_usage():
        return ''

    def log(self, names, normalizer=1.0, reset=True,
            memory_breakdown=False):
        pass


class SynchronizedWallClockTimer(_TimerRegistry):
    """Named-region timers whose edges synchronise the device stream."""

    @staticmethod
    def memory_usage():
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats() or {}
            fields = [('hbm_in_use', stats.get('bytes_in_use', 0)),
                      ('hbm_peak', stats.get('peak_bytes_in_use', 0)),
                      ('hbm_limit', stats.get('bytes_limit', 0))]
            return ''.join(f' | {k}: {v / 2 ** 30:.4f} GB'
                           for k, v in fields)
        except Exception:
            return ''

    def log(self, names, normalizer=1.0, reset=True,
            memory_breakdown=False):
        assert normalizer > 0.0
        parts = [f'rank={get_rank()} time (ms)']
        for name in names:
            if name in self.timers:
                ms = self.timers[name].elapsed(reset=reset) \
                    * 1000.0 / normalizer
                parts.append(f'{name}: {ms:.2f}')
        if memory_breakdown:
            parts.append(self.memory_usage())
        print_rank_0(' | '.join(parts))


class ThroughputTimer:
    """Samples/sec + host memory reporting for the training loop."""

    def __init__(self,
                 batch_size,
                 num_workers=1,
                 start_step=2,
                 steps_per_output=50,
                 monitor_memory=True,
                 logging_fn=None):
        self.batch_size = batch_size or 1
        self.num_workers = num_workers
        self.start_step = start_step
        self.steps_per_output = steps_per_output
        self.monitor_memory = monitor_memory
        if logging_fn is None:
            from .logging import logger
            logging_fn = logger.info
        self.logging = logging_fn

        self.started = False
        self.epoch_count = 0
        self.local_step_count = 0
        self.total_step_count = 0
        self.total_elapsed_time = 0.0
        self._t0 = 0.0

    def update_epoch_count(self):
        self.epoch_count += 1
        self.local_step_count = 0

    def start(self):
        self.started = True
        if self.total_step_count >= self.start_step:
            _sync_devices()
            self._t0 = time.perf_counter()

    def stop(self, report_speed=True):
        if not self.started:
            return
        self.started = False
        self.total_step_count += 1
        self.local_step_count += 1
        if self.total_step_count <= self.start_step:
            return
        _sync_devices()
        self.total_elapsed_time += time.perf_counter() - self._t0
        if self.local_step_count % self.steps_per_output:
            return
        if report_speed:
            self.logging(f'{self.epoch_count}/{self.local_step_count}, '
                         f'SamplesPerSec={self.avg_samples_per_sec()}')
        if self.monitor_memory:
            vm = psutil.virtual_memory()
            swap = psutil.swap_memory()
            self.logging(f'{self.epoch_count}/{self.local_step_count}, '
                         f'vm percent: {vm.percent}, '
                         f'swap percent: {swap.percent}')

    def avg_samples_per_sec(self):
        measured_steps = self.total_step_count - self.start_step
        if measured_steps > 0 and self.total_elapsed_time > 0:
            per_step = self.total_elapsed_time / measured_steps
            return self.batch_size * self.num_workers / per_step
        return float('-inf')
