"""SPMD scale-out over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY.md §2.4); the TPU build
adds data parallelism the XLA way: the host splits each batch into
per-device sub-batches (equal sample counts, equal event capacity — events
are already sorted by sample, so the split is a couple of searchsorted
calls), ``shard_map`` runs the single-device training program on every
device, and gradients ride ICI through one ``psum`` per step.  Parameters
and optimizer state stay replicated (the model is small; no need for FSDP).

``make_mesh`` accepts a "name:size,name:size" spec so additional axes
(e.g. an event axis for sequence-parallel-style event sharding) can be
declared; the data axis is the one used by ``make_sharded_train_step``.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.schema import Batch, EventBuffer
from ..training.state import TrainState, make_loss_fn


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    """Build a device mesh.

    Args:
        spec: "name:size[,name:size...]" (e.g. "data:8" or
            "data:4,event:2").  None uses all local devices on 'data'.
        devices: device list (default jax.devices()).
    """
    if devices is None:
        devices = jax.devices()
    if spec is None:
        return Mesh(np.array(devices), ('data',))
    names = []
    sizes = []
    for part in spec.split(','):
        name, size = part.split(':')
        names.append(name.strip())
        sizes.append(int(size))
    total = int(np.prod(sizes))
    assert total <= len(devices), \
        f'mesh {spec} needs {total} devices, have {len(devices)}'
    mesh_devices = np.array(devices[:total]).reshape(sizes)
    return Mesh(mesh_devices, tuple(names))


def split_batch_for_mesh(collated: dict, n_shards: int,
                         capacity_per_shard: int) -> Batch:
    """Split a host-collated ragged batch into n equal per-device shards.

    Every array gains a leading shard axis; events are re-padded per shard
    (they are sorted by sample, so shard boundaries are just searchsorted
    cuts).  Sample indices are localised to each shard.

    Raises:
        OverflowError: when a shard exceeds ``capacity_per_shard`` events.
    """
    from ..data.schema import pad_events

    size = int(collated['size'])
    assert size % n_shards == 0, \
        f'batch size {size} not divisible by {n_shards} shards'
    per_shard = size // n_shards

    ev = collated['events']
    sample_index = np.asarray(ev['sample_index'])
    # shard boundaries on the flat (sample-sorted) event axis
    cuts = np.searchsorted(sample_index,
                           np.arange(n_shards + 1) * per_shard)
    sample_idx = np.asarray(collated['sample_idx'])
    ts_cuts = np.searchsorted(sample_idx,
                              np.arange(n_shards + 1) * per_shard)
    images = np.asarray(collated['images'], dtype=np.float32)
    if images.ndim == 3:
        images = images[:, None]
    timestamps = np.asarray(collated['timestamps'], dtype=np.float32)

    buffers = []
    ts_shards = []
    si_shards = []
    im_shards = []
    for s in range(n_shards):
        lo, hi = int(cuts[s]), int(cuts[s + 1])
        shard_events = {
            'x': ev['x'][lo:hi],
            'y': ev['y'][lo:hi],
            'timestamp': ev['timestamp'][lo:hi],
            'polarity': ev['polarity'][lo:hi],
            'element_index': ev['element_index'][lo:hi],
            'sample_index': sample_index[lo:hi] - s * per_shard,
        }
        buffers.append(pad_events(shard_events, per_shard,
                                  capacity_per_shard))
        tlo, thi = int(ts_cuts[s]), int(ts_cuts[s + 1])
        ts_shards.append(timestamps[tlo:thi])
        si_shards.append(sample_idx[tlo:thi] - s * per_shard)
        im_shards.append(images[tlo:thi])

    events = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *buffers)
    return Batch(events=events,
                 data=None,
                 timestamps=np.stack(ts_shards).astype(np.float32),
                 sample_idx=np.stack(si_shards).astype(np.int32),
                 images=np.stack(im_shards),
                 size=size)


def shard_host_batch(batch: Batch, mesh: Mesh, axis: str = 'data') -> Batch:
    """Place a leading-shard-axis Batch onto the mesh (data axis)."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def make_sharded_train_step(model, evaluator, tx, weights,
                            accumulation_steps: int, mesh: Mesh,
                            is_raw: bool = True, axis: str = 'data'):
    """Jitted SPMD training step over the mesh's data axis.

    The per-device program is the single-device loss/grad computation on the
    device's sub-batch; gradients and metrics are averaged with ``psum``
    over ICI; the optimizer update runs replicated.

    Expects batches produced by ``split_batch_for_mesh`` +
    ``shard_host_batch`` (leading shard axis on every array).
    """
    loss_fn = make_loss_fn(model, evaluator, weights, is_raw)
    n_shards = mesh.shape[axis]

    def per_device_grads(params, batch):
        # strip the per-device leading axis of size 1
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, local)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        terms = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, axis),
                                       terms)
        return grads, loss, terms

    from jax.sharding import PartitionSpec
    shard_specs = PartitionSpec(axis)
    replicated = PartitionSpec()

    sharded_grads = jax.shard_map(
        per_device_grads, mesh=mesh,
        in_specs=(replicated, shard_specs),
        out_specs=(replicated, replicated, replicated),
        check_vma=False)

    def apply_branch(state, acc):
        updates, new_opt_state = tx.update(acc, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
        return state.replace(params=new_params, opt_state=new_opt_state,
                             grad_acc=zeros, step=state.step + 1)

    def hold_branch(state, acc):
        return state.replace(grad_acc=acc)

    def step_fn(state: TrainState, batch: Batch):
        grads, loss, terms = sharded_grads(state.params, batch)
        inv = 1.0 / accumulation_steps
        if accumulation_steps == 1:
            # fast path: no accumulator traffic, no conditional
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      opt_state=new_opt_state,
                                      step=state.step + 1)
        else:
            acc = jax.tree_util.tree_map(lambda a, g: a + g * inv,
                                         state.grad_acc, grads)
            is_boundary = (state.micro_step + 1) % accumulation_steps == 0
            new_state = jax.lax.cond(is_boundary, apply_branch,
                                     hold_branch, state, acc)
        new_state = new_state.replace(micro_step=state.micro_step + 1)
        return new_state, (loss * inv, terms)

    return jax.jit(step_fn, donate_argnums=(0,)), n_shards
