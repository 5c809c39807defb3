"""Worker for the 2-process train_flownet CLI test (run via subprocess).

Usage: python multihost_cli_worker.py <coordinator> <num_procs> <pid> \
           <model_dir> [extra train args...]

Each process owns 2 virtual CPU devices and runs the REAL training CLI
(train_flownet.main) with the multi-host flags: a 4-way data mesh spans
the two processes, each process feeds ITS OWN half of every global batch
through its own input pipeline (per-process streams — the preprocessed
loader strides by process, the raw loader draws independently), and only
process 0 writes checkpoints/logs.  DVS_DATA_PATH must point at the
fixture MVSEC layout (set by the parent test).
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(coordinator, num_processes, process_id, model_dir, extra):
    import jax
    # the environment may have pre-initialised a default backend
    # (sitecustomize); reset, then bring up the distributed CPU runtime
    import jax.extend.backend
    jax.extend.backend.clear_backends()
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)

    import train_flownet
    train_flownet.main([
        '-m', model_dir,
        '--flownet_path', str(REPO / 'DummyFlowNet'),
        '-d', 'cpu',
        '-bs', '4', '-mbs', '4',
        '-ne', '2',
        '--num_workers', '2',
        '--height', '64', '--width', '64',
        '-cl', '1',
        '--optimizer', 'ADAM',
        '--checkpointing_interval', '1',
        '--permanent_interval', '1',
        '--event-capacity', '16384',
        '--device-queue-window', '2',
        '--skip-validation',
        '--coordinator-address', coordinator,
        '--num-processes', str(num_processes),
        '--process-id', str(process_id),
    ] + list(extra))
    assert jax.process_count() == num_processes
    import os
    print(f'RESULT process={process_id} pid={os.getpid()} done')


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         sys.argv[5:])
