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


class ShardedBatchSkipper:
    """Globally-deterministic oversized-batch rule over a per-process
    strided preprocessed stream (PreprocessedDataloader with
    ``process_count > 1``).

    Each process reads only its 1/P slice of every global batch, so no
    process can SEE the others' event counts — but all processes must
    still agree on which global batches to skip (a per-process skip of a
    dispatched step would desynchronise the SPMD collectives).  The
    stream is static and pre-augmented, so per-sample event counts are a
    pure metadata property (data/preprocessed.py
    ``per_sample_event_counts``): every process evaluates the SAME rule —
    "does any of the ``n_shards`` per-device slices of global batch g
    exceed ``capacity_per_shard``?" — from the same counts array, with
    zero communication.  Skipped global batches are strided past without
    reading (``skip_batch``), and the rule is a deterministic function of
    the stream position, so checkpoint resume replays identical
    decisions.

    Args:
        loader: this process's PreprocessedDataloader (already sharded).
        per_sample_events: int64 ``[length]`` per-sample device cost,
            identical on every process — event counts for raw streams,
            channel counts for dense quantized streams
            (data/preprocessed.py per_sample_event_counts /
            per_sample_channel_counts).
        global_batch: samples per GLOBAL batch (local batch x P).
        n_shards: devices on the mesh data axis (global).
        capacity_per_shard: per-device capacity in the same unit.
        start_sample: global samples already consumed (resume position).
        unit: display name of the cost unit for the skip log line.
    """

    def __init__(self, loader, per_sample_events, global_batch: int,
                 n_shards: int, capacity_per_shard: int,
                 start_sample: int = 0, unit: str = 'events'):
        self.unit = unit
        import numpy as np
        assert global_batch % n_shards == 0, (global_batch, n_shards)
        self.loader = loader
        self.global_batch = global_batch
        self.spd = global_batch // n_shards
        self.n_shards = n_shards
        self.capacity_per_shard = capacity_per_shard
        counts = np.asarray(per_sample_events, np.int64)
        self.length = counts.size
        assert global_batch <= self.length, \
            f'global batch {global_batch} exceeds dataset ({self.length})'
        self._csum = np.concatenate([[0], np.cumsum(counts)])
        self.cursor = (start_sample // global_batch) * global_batch

    def _range_events(self, lo: int, hi: int) -> int:
        """Events in stream samples ``[lo, hi)`` (wrapping modulo length)."""
        total = int(self._csum[-1])
        full, lo = divmod(lo, self.length)
        hi -= full * self.length
        if hi <= self.length:
            return int(self._csum[hi] - self._csum[lo])
        return int(total - self._csum[lo]
                   + self._csum[hi - self.length])

    def _overflows(self, start: int) -> bool:
        return any(self._range_events(start + k * self.spd,
                                      start + (k + 1) * self.spd)
                   > self.capacity_per_shard
                   for k in range(self.n_shards))

    def __iter__(self):
        while True:
            start = self.cursor % self.length
            if self._overflows(start):
                worst = max(self._range_events(start + k * self.spd,
                                               start + (k + 1) * self.spd)
                            for k in range(self.n_shards))
                print(f'Skipping batch at sample {start} '
                      f'(per-shard {self.unit} {worst} > capacity '
                      f'{self.capacity_per_shard})')
                self.loader.skip_batch()
                self.cursor += self.global_batch
                continue
            self.cursor += self.global_batch
            yield next(self.loader)

    def close(self):
        close = getattr(self.loader, 'close', None)
        if close is not None:
            close()
