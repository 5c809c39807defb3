"""Mesh sharding overhead at equal total work (VERDICT r3 item 4).

Real multi-chip ICI is not reachable from this environment, so this
measures what the sharding machinery itself adds: the SAME global batch
stepped (a) on one device and (b) sharded over an N-device virtual CPU
mesh (data-only and data x event).  Every virtual device shares the same
host cores, so equal-global-work is the controlled comparison — the
step-time ratio isolates the partition / collective / regroup overhead
XLA inserts for the shard_map program (psum of grads over ``data``,
psum of voxel grids + split-VJP over ``event``), with zero interconnect
cost.  On real ICI the collective term gains a wire latency component
but the partition/regroup structure is identical, so the ratio here is
the machinery floor, not a throughput prediction.

Run: python scripts/benchmarks/mesh_overhead.py  (forces CPU; safe to
run while a TPU job owns the tunnel)
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import os

N_DEV = int(os.environ.get('MESH_DEV', 8))
WARMUP = 2
ITERS = int(os.environ.get('MESH_ITERS', 8))
_SIZE = int(os.environ.get('MESH_SIZE', 128))
IMSIZE = (_SIZE, _SIZE)
BATCH = 8
N_EVENTS = int(os.environ.get('MESH_EVENTS', 2 ** 14))
DEPTH = 9
BASE = int(os.environ.get('MESH_BASE', 16))


def force_cpu():
    # never probe the axon platform here: the single-flight tunnel may be
    # owned by a training run (CLAUDE.md) — switch straight to CPU
    import jax
    import jax.extend.backend
    jax.extend.backend.clear_backends()
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', N_DEV)
    assert len(jax.devices()) == N_DEV, jax.devices()


def make_collated(rng):
    """Host-collated batch dict (the pre-pad_batch wire format)."""
    from scripts.make_synthetic_mvsec import simulate_sequence
    events, frames, frame_ts, _gt = simulate_sequence(
        np.random.default_rng(11), 3.0, 0.7)
    H, W = IMSIZE
    fh, fw = frames.shape[1:3]
    oy, ox = (fh - H) // 2, (fw - W) // 2
    per_sample = max(N_EVENTS // BATCH, 1)
    n_windows = frame_ts.size - 1
    xs, ys, ts, ps, eis, sis = [], [], [], [], [], []
    images, timestamps = [], []
    for b in range(BATCH):
        w = b % n_windows
        lo, hi = np.searchsorted(events[:, 2],
                                 [frame_ts[w], frame_ts[w + 1]])
        sel = events[lo:hi]
        keep = ((sel[:, 0] >= ox) & (sel[:, 0] < ox + W)
                & (sel[:, 1] >= oy) & (sel[:, 1] < oy + H))
        sel = sel[keep][:per_sample]
        xs.append(sel[:, 0] - ox)
        ys.append(sel[:, 1] - oy)
        ts.append((sel[:, 2] - frame_ts[w]).astype(np.float32))
        ps.append(sel[:, 3])
        eis.append(np.zeros(sel.shape[0], np.int64))
        sis.append(np.full(sel.shape[0], b, np.int64))
        images.append(frames[w, oy:oy + H, ox:ox + W])
        images.append(frames[w + 1, oy:oy + H, ox:ox + W])
        timestamps.extend([0.0, frame_ts[w + 1] - frame_ts[w]])
    return {
        'events': {
            'x': np.concatenate(xs),
            'y': np.concatenate(ys),
            'timestamp': np.concatenate(ts),
            'polarity': np.concatenate(ps),
            'element_index': np.concatenate(eis),
            'sample_index': np.concatenate(sis),
        },
        'timestamps': np.asarray(timestamps, np.float32),
        'sample_idx': np.repeat(np.arange(BATCH), 2).astype(np.int32),
        'images': np.stack(images)[:, None].astype(np.float32),
        'size': BATCH,
        'augmentation_params': None,
    }


def build():
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=DEPTH,
                         base_channels=BASE, dtype='float32')
    collated = make_collated(np.random.default_rng(0))
    probe = pad_batch(collated, capacity=N_EVENTS)
    params = model.init(jax.random.PRNGKey(0), probe.events,
                        probe.timestamps, probe.sample_idx,
                        IMSIZE)['params']
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=1000000, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in IMSIZE) for i in range(4)][::-1])
    params = jax.tree_util.tree_map(jnp.array, params)
    return model, params, tx, evaluator, collated


def time_step(step, state, batch):
    import jax
    for _ in range(WARMUP):
        state, (loss, _) = step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, (loss, _) = step(state, batch)
    jax.block_until_ready(state.params)
    return (time.perf_counter() - t0) / ITERS, float(loss)


def main():
    force_cpu()
    import jax  # noqa: F401
    from dvs_of_training_framework_tpu.data.schema import pad_batch
    from dvs_of_training_framework_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_host_batch,
        split_batch_for_mesh)
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)

    model, params, tx, evaluator, collated = build()
    rows = []

    # single device, full global batch
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=1, is_raw=True)
    state = create_train_state(params, tx)
    batch = jax.device_put(pad_batch(collated, capacity=N_EVENTS))
    dt0, loss0 = time_step(step, state, batch)
    rows.append(('single-device', dt0, loss0))

    for spec, event_axis in [(f'data:{N_DEV}', None),
                             (f'data:{N_DEV // 2},event:2', 'event')]:
        mesh = make_mesh(spec)
        event_shards = mesh.shape.get('event', 1)
        n_shards = mesh.shape['data']
        sstep, _ = make_sharded_train_step(
            model, evaluator, tx, [0.5, 1, 1], accumulation_steps=1,
            mesh=mesh, event_axis=event_axis)
        split = split_batch_for_mesh(
            collated, n_shards,
            capacity_per_shard=N_EVENTS // (n_shards * event_shards),
            event_shards=event_shards)
        sharded = shard_host_batch(split, mesh, event_axis=event_axis)
        state = create_train_state(params, tx)
        dt, loss = time_step(sstep, state, sharded)
        rows.append((spec, dt, loss))

    print(f'\nglobal batch {BATCH}, {N_EVENTS} events, {IMSIZE} crop, '
          f'EVFlowNet-{BASE}, fp32, {N_DEV} virtual CPU devices')
    print(f'{"config":<16} {"ms/step":>9} {"vs single":>10} {"loss":>10}')
    for name, dt, loss in rows:
        print(f'{name:<16} {dt * 1e3:9.1f} {dt / rows[0][1]:10.3f} '
              f'{loss:10.5f}')


if __name__ == '__main__':
    main()
