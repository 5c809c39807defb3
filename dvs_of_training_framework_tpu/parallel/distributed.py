"""Multi-host (multi-process) initialisation and batch placement.

The reference is single-process (SURVEY.md §2.4); the TPU build scales
across hosts the JAX way: every process calls
``jax.distributed.initialize`` (coordinator address + process id), builds
the SAME mesh over the global device list, and runs the same SPMD program;
per-host input data becomes one global sharded array via
``jax.make_array_from_process_local_data``.  Collectives ride ICI within a
slice and DCN across slices — no NCCL/MPI analogue needed.

Activation is explicit (flags or environment):

    --coordinator-address host:port --num-processes N --process-id P
or  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID

On TPU pods, ``jax.distributed.initialize()`` with no arguments picks the
topology up from the TPU runtime; passing ``--num-processes`` alone
triggers that auto path too.
"""
import os


def distributed_spec(args=None):
    """Resolve (coordinator, num_processes, process_id) or None."""
    def pick(attr, env):
        value = getattr(args, attr, None) if args is not None else None
        if value is None:
            value = os.environ.get(env)
        return value

    coordinator = pick('coordinator_address', 'JAX_COORDINATOR_ADDRESS')
    num_processes = pick('num_processes', 'JAX_NUM_PROCESSES')
    process_id = pick('process_id', 'JAX_PROCESS_ID')
    if num_processes is None:
        return None
    return (coordinator,
            int(num_processes),
            None if process_id is None else int(process_id))


def maybe_initialize_distributed(args=None):
    """Call ``jax.distributed.initialize`` when a spec is configured.

    Returns True when running multi-process (after initialisation).
    Must run before the first touch of ``jax.devices()``.
    """
    spec = distributed_spec(args)
    if spec is None:
        return False
    import jax
    coordinator, num_processes, process_id = spec
    kwargs = {}
    if coordinator is not None:
        kwargs['coordinator_address'] = coordinator
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def make_global_batch(local_batch, mesh, axis='data', event_axis=None):
    """Assemble a globally-sharded Batch from per-process local shards.

    Every process passes the Batch holding ONLY its local shards (leading
    shard axis sized ``local device count along the data axis``); the
    result is one global jax.Array per leaf, sharded over the mesh.
    Single-process meshes take the plain ``device_put`` path
    (mesh.shard_host_batch).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import shard_host_batch

    if jax.process_count() == 1:
        return shard_host_batch(local_batch, mesh, axis=axis,
                                event_axis=event_axis)

    data_sharding = NamedSharding(mesh, P(axis))
    event_sharding = NamedSharding(mesh, P(axis, event_axis)) \
        if event_axis else data_sharding

    def build(x, sharding):
        # the leading (data) axis is the only cross-process axis; an event
        # axis stays within a host, so local trailing dims == global ones
        global_shape = (mesh.shape[axis],) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    events = local_batch.events
    if events is not None:
        events = jax.tree_util.tree_map(
            lambda x: build(x, event_sharding), events)
    rest = jax.tree_util.tree_map(
        lambda x: build(x, data_sharding),
        type(local_batch)(events=None, data=local_batch.data,
                          timestamps=local_batch.timestamps,
                          sample_idx=local_batch.sample_idx,
                          images=local_batch.images,
                          size=local_batch.size))
    return rest.replace(events=events)
