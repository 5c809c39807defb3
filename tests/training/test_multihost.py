"""Multi-host (2-process) data parallelism over the distributed runtime.

Spawns two real processes, each owning 2 virtual CPU devices, joined by
``jax.distributed.initialize`` into one 4-way data mesh; both run one
sharded training step with ``make_global_batch`` assembling per-process
local shards into global arrays.  The replicas must agree with each other
(SPMD replication) — the analytic content of the step is already pinned
against single-device by tests/training/test_parallel.py.
"""
import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent


def free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_training_step():
    port = free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)  # workers configure their own device count
    procs = [subprocess.Popen(
        [sys.executable, str(HERE / 'multihost_worker.py'),
         f'localhost:{port}', '2', str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f'worker failed:\n{out}'
    results = [re.search(r'RESULT loss=([\d.]+) fingerprint=([\d.]+)', o)
               for o in outputs]
    assert all(results), f'missing RESULT lines:\n{outputs}'
    losses = [float(m.group(1)) for m in results]
    prints = [float(m.group(2)) for m in results]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert prints[0] == pytest.approx(prints[1], rel=1e-6)
