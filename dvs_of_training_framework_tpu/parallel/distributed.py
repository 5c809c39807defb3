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


def make_global_batch(local_batch, mesh, axis='data', event_axis=None,
                      window=False):
    """Assemble a globally-sharded Batch from per-process local shards.

    Every process passes the Batch holding ONLY its local shards (leading
    shard axis sized ``local device count along the data axis``); the
    result is one global jax.Array per leaf, sharded over the mesh.
    Single-process meshes take the plain ``device_put`` path
    (mesh.shard_host_batch).

    With ``window=True`` every array carries an extra leading device-queue
    window axis (K stacked batches), replicated over the mesh.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import shard_host_batch

    if jax.process_count() == 1:
        return shard_host_batch(local_batch, mesh, axis=axis,
                                event_axis=event_axis, window=window)

    lead = (None,) if window else ()
    data_sharding = NamedSharding(mesh, P(*lead, axis))
    event_sharding = NamedSharding(mesh, P(*lead, axis, event_axis)) \
        if event_axis else data_sharding

    def build(x, sharding):
        # the (data) axis is the only cross-process axis; the window axis
        # is replicated and an event axis stays within a host, so local
        # dims == global dims everywhere else
        if window:
            global_shape = (x.shape[0], mesh.shape[axis]) \
                + tuple(x.shape[2:])
        else:
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


def slice_collated_batch(collated: dict, lo: int, hi: int) -> dict:
    """Cut samples ``[lo, hi)`` out of a host-collated ragged batch.

    Events and timestamps/images are sorted by sample, so the cuts are
    searchsorted boundaries; sample indices are re-based to 0.  Used by
    multi-host training, where every process collates the same global
    batch (seeded identically) and keeps only its slice.
    """
    import numpy as np

    out = dict(collated)
    ev = collated['events']
    if ev is not None:
        sample_index = np.asarray(ev['sample_index'])
        e_lo, e_hi = np.searchsorted(sample_index, [lo, hi])
        out['events'] = {
            k: np.asarray(v)[e_lo:e_hi] for k, v in ev.items()}
        out['events']['sample_index'] = \
            out['events']['sample_index'] - lo
    sample_idx = np.asarray(collated['sample_idx'])
    t_lo, t_hi = np.searchsorted(sample_idx, [lo, hi])
    out['sample_idx'] = sample_idx[t_lo:t_hi] - lo
    out['timestamps'] = np.asarray(collated['timestamps'])[t_lo:t_hi]
    out['images'] = np.asarray(collated['images'])[t_lo:t_hi]
    if collated.get('data') is not None:
        out['data'] = np.asarray(collated['data'])[lo:hi]
    aug = collated.get('augmentation_params')
    if aug is not None:
        out['augmentation_params'] = {k: np.asarray(v)[lo:hi]
                                      for k, v in aug.items()}
    out['size'] = hi - lo
    return out


class ProcessLocalStream:
    """Per-process view of a replicated global batch stream.

    Every process iterates the SAME underlying loader (all processes must
    seed augmentation/shuffle RNGs identically — train_flownet.py does) and
    keeps samples ``[p*size/P, (p+1)*size/P)`` of each batch.  Decisions
    that must agree across processes — oversized-batch skipping — are taken
    on the GLOBAL batch before slicing, so no process can diverge from the
    collective (a per-process skip would deadlock the psum).

    Args:
        loader: the global batch loader (identical on every process).
        process_index / process_count: this process's slice.
        n_shards: total devices on the mesh data axis (global).
        capacity_per_shard: per-device event-buffer capacity; a global
            batch whose largest per-device shard exceeds it is skipped on
            every process alike.
    """

    def __init__(self, loader, process_index: int, process_count: int,
                 n_shards: int, capacity_per_shard: int):
        self.loader = loader
        self.process_index = process_index
        self.process_count = process_count
        self.n_shards = n_shards
        self.capacity_per_shard = capacity_per_shard

    def _global_overflow(self, collated) -> bool:
        import numpy as np
        ev = collated.get('events')
        if ev is None:
            return False
        size = int(collated['size'])
        per_shard = size // self.n_shards
        sample_index = np.asarray(ev['sample_index'])
        cuts = np.searchsorted(sample_index,
                               np.arange(self.n_shards + 1) * per_shard)
        return int(np.diff(cuts).max(initial=0)) > self.capacity_per_shard

    def __iter__(self):
        for collated in self.loader:
            size = int(collated['size'])
            if size % self.process_count:
                raise ValueError(
                    f'batch size {size} not divisible by '
                    f'{self.process_count} processes')
            if self._global_overflow(collated):
                print(f'Skipping batch with '
                      f'{collated["events"]["x"].size} events '
                      '(global per-shard overflow)')
                continue
            per_proc = size // self.process_count
            lo = self.process_index * per_proc
            yield slice_collated_batch(collated, lo, lo + per_proc)

    def close(self):
        close = getattr(self.loader, 'close', None)
        if close is not None:
            close()
