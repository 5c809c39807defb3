"""Worker for the 2-process multi-host test (run via subprocess).

Usage: python multihost_worker.py <coordinator> <num_procs> <pid>

Each process owns 2 virtual CPU devices; the pair forms one global 4-way
data mesh.  Both processes run one sharded training step on their half of
a deterministic batch and print the loss and a parameter fingerprint —
the parent asserts the replicas agree (and match the single-process
result computed separately).
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(coordinator, num_processes, process_id):
    import jax
    # the environment may have pre-initialised a default backend
    # (sitecustomize); reset, then bring up the distributed CPU runtime
    import jax.extend.backend
    jax.extend.backend.clear_backends()
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 2 * num_processes
    assert len(jax.local_devices()) == 2

    import numpy as np
    from types import SimpleNamespace
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                      load_model_class)
    from dvs_of_training_framework_tpu.parallel import (
        make_global_batch, make_mesh, make_sharded_train_step,
        split_batch_for_mesh)
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state)
    from dvs_of_training_framework_tpu.data.schema import pad_events

    imsize = (32, 32)
    n_shards = 2 * num_processes
    batch_size = n_shards
    rng = np.random.default_rng(0)  # SAME on every process
    H, W = imsize
    n_events = 64 * batch_size
    collated = {
        'events': {
            'x': rng.integers(0, W, n_events),
            'y': rng.integers(0, H, n_events),
            'timestamp': rng.uniform(0, 0.04, n_events)
            .astype(np.float32),
            'polarity': rng.choice([-1.0, 1.0], n_events),
            'element_index': np.zeros(n_events, np.int64),
            'sample_index': np.sort(rng.integers(0, batch_size, n_events)),
        },
        'timestamps': np.tile(np.array([0.0, 0.04], np.float32),
                              batch_size),
        'sample_idx': np.repeat(np.arange(batch_size), 2),
        'images': rng.uniform(0, 255, size=(2 * batch_size, 1, H, W))
        .astype(np.float32),
        'augmentation_params': None,
        'size': batch_size,
    }

    module = load_model_class(REPO / 'EVFlowNet')
    kwargs = filter_kwargs(module.Model, dict(
        event_representation_depth=3, base_channels=4))
    model = module.Model(**kwargs)
    probe_events = pad_events(collated['events'], batch_size, 1024)
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0), probe_events,
                        jnp.asarray(collated['timestamps']),
                        jnp.asarray(collated['sample_idx'], jnp.int32),
                        imsize)['params']
    args = SimpleNamespace(optimizer='ADAM', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=100, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in imsize) for i in range(4)][::-1])

    mesh = make_mesh(f'data:{n_shards}')
    step_fn, _ = make_sharded_train_step(model, evaluator, tx, [0.5, 1, 1],
                                         accumulation_steps=1, mesh=mesh)
    sharded = split_batch_for_mesh(collated, n_shards,
                                   capacity_per_shard=256)
    # keep only THIS process's local shards
    lo, hi = 2 * process_id, 2 * process_id + 2
    local = jax.tree_util.tree_map(lambda x: x[lo:hi], sharded)
    device_batch = make_global_batch(local, mesh)

    state = create_train_state(params, tx)
    state, (loss, _) = step_fn(state, device_batch)
    jax.block_until_ready(state.params)
    leaves = jax.tree_util.tree_leaves(state.params)
    fingerprint = float(sum(abs(np.asarray(a)).sum() for a in leaves))
    print(f'RESULT loss={float(loss):.6f} fingerprint={fingerprint:.6f}')


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
