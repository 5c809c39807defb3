#!/usr/bin/env python3
"""Run a repo script with jax forced to CPU *in-process*.

While ANY process holds the axon TPU session (a training run), merely
initialising the axon platform from a second process can permanently
wedge the first (CLAUDE.md "Tunnel session wedge") — and the
environment's sitecustomize preselects axon, so the ``JAX_PLATFORMS``
env var alone is not a reliable guard.  This wrapper applies the safe
in-process sequence BEFORE any jax op, then executes the target script
unchanged:

    python scripts/cpu_run.py [-n DEVICES] <script.py> [script args...]
"""
import runpy
import sys


def main():
    argv = sys.argv[1:]
    n_devices = 1
    if argv and argv[0] == '-n':
        n_devices = int(argv[1])
        argv = argv[2:]
    if not argv:
        sys.exit(__doc__)

    import jax
    import jax.extend.backend
    jax.extend.backend.clear_backends()
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', n_devices)

    sys.argv = argv
    runpy.run_path(argv[0], run_name='__main__')


if __name__ == '__main__':
    main()
