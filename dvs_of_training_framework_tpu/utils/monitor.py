"""Device utilisation monitor -> TensorBoard (Monitoring/*).

TPU analogue of the reference GPU monitor process
(utils/monitors/gpumonitor.py:40-68).  A TPU device cannot be opened from a
second process, so a daemon *thread* samples per-device HBM statistics
(``device.memory_stats()``) plus host memory, writing
``Monitoring/TPU{i}/...`` scalars on a fixed period.
"""
import threading
import time

import psutil

from .tb import SummaryWriter


class DeviceMonitor:
    """Context manager: samples device/host stats every ``period`` seconds."""

    def __init__(self, logdir, period=30.0):
        self.logdir = logdir
        self.period = period
        self._stop = threading.Event()
        self._thread = None
        self._writer = None

    def _sample(self, step):
        import jax
        for i, device in enumerate(jax.local_devices()):
            stats = device.memory_stats() or {}
            in_use = stats.get('bytes_in_use', 0)
            limit = stats.get('bytes_limit', 0)
            peak = stats.get('peak_bytes_in_use', 0)
            tag = f'Monitoring/{device.platform.upper()}{i}'
            self._writer.add_scalar(f'{tag}/memory used (GB)',
                                    in_use / 2 ** 30, step)
            self._writer.add_scalar(f'{tag}/memory peak (GB)',
                                    peak / 2 ** 30, step)
            if limit:
                self._writer.add_scalar(f'{tag}/memory utilisation (%)',
                                        in_use * 100.0 / limit, step)
        vm = psutil.virtual_memory()
        self._writer.add_scalar('Monitoring/host/vm percent', vm.percent,
                                step)
        self._writer.add_scalar('Monitoring/host/cpu percent',
                                psutil.cpu_percent(), step)
        self._writer.flush()

    def _run(self):
        step = 0
        while not self._stop.wait(self.period):
            try:
                self._sample(step)
            except Exception:  # monitoring must never kill training
                pass
            step += 1

    def __enter__(self):
        self._writer = SummaryWriter(self.logdir, filename_suffix='.monitor')
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._writer is not None:
            self._writer.close()
