"""Persistent XLA compilation cache.

Compiles through a tunnelled/remote TPU take minutes and are paid per
process; the persistent cache makes repeat invocations of any CLI start
in seconds.  Enabled by every entry point; set ``JAX_DISABLE_COMPILATION_
CACHE=1`` to opt out, ``JAX_COMPILATION_CACHE_DIR`` to relocate.
"""
import os
from pathlib import Path

DEFAULT_DIR = Path(__file__).resolve().parents[2] / '.jax_cache'


def enable_compilation_cache(cache_dir=None):
    if os.environ.get('JAX_DISABLE_COMPILATION_CACHE'):
        return None
    cache_dir = (cache_dir
                 or os.environ.get('JAX_COMPILATION_CACHE_DIR')
                 or DEFAULT_DIR)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    # cache everything, however small/fast to compile
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return str(cache_dir)
