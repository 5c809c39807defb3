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


def run_two_process_cli(tmp_path, extra=()):
    from tests.helpers import data_path
    data_root = tmp_path / 'mvsec'
    data_root.mkdir()
    (data_root / 'outdoor_day2').symlink_to(data_path)
    (data_root / 'outdoor_day1').symlink_to(data_path)
    model_dir = tmp_path / 'model'

    port = free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['DVS_DATA_PATH'] = str(data_root)
    procs = [subprocess.Popen(
        [sys.executable, str(HERE / 'multihost_cli_worker.py'),
         f'localhost:{port}', '2', str(pid), str(model_dir)] + list(extra),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f'worker failed:\n{out}'
    return model_dir, outputs


def check_two_process_run(model_dir, outputs):
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    steps = ser.list_known_steps()
    assert 2 in steps, f'missing final checkpoint, have {steps}'
    state = ser.read_state_dict(2)
    # 2 optimizer steps x global batch 4 — NOT the per-process 2
    assert int(state['samples_passed']) == 8
    # single writer: process 1 wrote no TB events (process 0 legitimately
    # produces two files — its SummaryWriter and its DeviceMonitor child)
    assert (model_dir / 'parameters').is_file()
    pid1 = re.search(r'RESULT process=1 pid=(\d+)', outputs[1]).group(1)
    event_files = [f.name for f in
                   (model_dir / 'log').glob('events.out.tfevents.*')]
    assert event_files, 'process 0 wrote no logs'
    assert not any(f'.{pid1}.' in name for name in event_files), \
        f'process 1 ({pid1}) wrote TB events: {event_files}'


def test_two_process_train_cli(tmp_path):
    """The PRODUCT multi-host path: train_flownet.main on 2 processes.

    A 4-way data mesh spans two 2-device processes; each feeds its half
    of every global batch from its OWN input pipeline (independent raw
    streams, workers on — no global-RNG lockstep); process 0 alone
    writes checkpoints, provenance and TB logs; samples_passed counts
    GLOBAL samples."""
    model_dir, outputs = run_two_process_cli(tmp_path)
    check_two_process_run(model_dir, outputs)


def test_two_process_preprocessed_stream(tmp_path):
    """Multi-host over a preprocessed shard stream: each process STRIDES
    the stream (reads only its slice of every global batch) and the
    oversized-batch rule is the zero-communication deterministic one
    (ShardedBatchSkipper over per-sample event counts)."""
    import sys as _sys
    _sys.path.insert(0, str(HERE.parents[1]))
    from tests.dataset.test_preprocessed import write_shards
    shards, _ = write_shards(tmp_path, samples_per_file=4, num_files=2)
    model_dir, outputs = run_two_process_cli(
        tmp_path, extra=['--preprocessed-dataset-path', str(shards)])
    check_two_process_run(model_dir, outputs)


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
