"""Whole-run profiler context (reference utils/profiling.py:10-62).

On TPU the equivalent of the torch autograd profiler / NVTX emit is a JAX
profiler trace: it captures host + device timelines (XLA ops, transfers)
viewable in Perfetto / TensorBoard's profile plugin.  'CPU' and 'NVTX' are
accepted as aliases so reference command lines keep working.
"""
from pathlib import Path


class Profiler:
    def __init__(self, profiler_type, logdir=Path('.')):
        if profiler_type in ('None', None):
            self._enabled = False
        elif profiler_type in ('JAX', 'CPU', 'NVTX'):
            self._enabled = True
        else:
            raise AssertionError(f'Unknown profiler type {profiler_type}')
        self._logdir = Path(logdir)
        if self._enabled:
            self._logdir.mkdir(exist_ok=True, parents=True)

    def __enter__(self):
        if self._enabled:
            import jax
            jax.profiler.start_trace(str(self._logdir))
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self._enabled:
            import jax
            jax.profiler.stop_trace()
