"""Test session configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (the driver dry-runs the real multi-chip path
separately via __graft_entry__.dryrun_multichip).
"""
import os

# Force CPU even when the environment preselects a TPU platform: tests must
# be hermetic; the driver exercises TPU hardware separately via bench.py and
# __graft_entry__.  jax may already be imported by a sitecustomize hook, so
# setting the env var alone is not enough — update the live config too
# (backends are not initialised yet at conftest-import time).
os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: repeat suite runs skip recompiles
from dvs_of_training_framework_tpu.utils.compilation_cache import \
    enable_compilation_cache  # noqa: E402

enable_compilation_cache()
