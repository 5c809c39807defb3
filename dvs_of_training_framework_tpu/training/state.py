"""Train state + jitted train/eval step factories.

The reference's hot loop (utils/training.py:89-235) becomes a single jitted
``train_step``: forward, multi-scale loss, backward, gradient accumulation
and the (conditional) optimizer update all fuse into one XLA program per
event-capacity bucket.  Gradient accumulation keeps a gradient-tree
accumulator inside the state and applies the optimizer every
``accumulation_steps`` microbatches via ``lax.cond`` — one device program,
no host round-trips (the reference re-enters Python per microbatch).
"""
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import combined_loss


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    grad_acc: Any
    micro_step: jnp.ndarray
    step: jnp.ndarray


def create_train_state(params, tx: optax.GradientTransformation,
                       init_step: int = 0) -> TrainState:
    # jitted: one program instead of thousands of eager dispatches (the
    # optimizer init touches every leaf several times — latency-bound and
    # slow through a tunnelled TPU), and the resulting buffers are
    # execution outputs, which fetch fast at the first checkpoint
    @jax.jit
    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return TrainState(params=params,
                          opt_state=tx.init(params),
                          grad_acc=zeros,
                          micro_step=jnp.zeros([], jnp.int32),
                          step=jnp.asarray(init_step, jnp.int32))
    return init(params)


def make_loss_fn(model, evaluator, weights, is_raw: bool) -> Callable:
    """(params, batch) -> (loss, terms) for a device Batch."""
    weights = tuple(weights)

    def loss_fn(params, batch):
        imsize = tuple(batch.images.shape[-2:])
        events = batch.events if is_raw else batch.data
        out = model.apply({'params': params}, events, batch.timestamps,
                          batch.sample_idx, imsize, raw=is_raw,
                          intermediate=True)
        flows, flow_ts, flow_sample_idx = out[:3]
        loss, terms = combined_loss(evaluator, flows, flow_ts,
                                    flow_sample_idx, batch.images,
                                    batch.timestamps, batch.sample_idx,
                                    weights=weights)
        return loss, terms

    return loss_fn


def make_train_step(model, evaluator, tx, weights,
                    accumulation_steps: int, is_raw: bool = True,
                    window: int = 0):
    """Build the jitted training step.

    Returns ``step_fn(state, batch) -> (state, (loss, terms))`` where loss
    is already divided by ``accumulation_steps`` (reference
    utils/training.py:156) and terms are the per-scale values of this
    microbatch.

    With ``window = K > 0`` the step consumes a device-staged WINDOW of K
    batches (every leaf carries a leading K axis, see
    data/device_queue.py) and selects batch ``micro_step % K`` with an
    on-device dynamic slice.  One bulk upload then feeds K steps — the
    host touches the device once per window instead of once per step
    (fresh per-step input buffers cost a large first-use penalty on
    tunnelled TPU runtimes, and a dispatch per transfer everywhere).
    """
    loss_fn = make_loss_fn(model, evaluator, weights, is_raw)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def apply_branch(state, acc):
        updates, new_opt_state = tx.update(acc, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
        return state.replace(params=new_params,
                             opt_state=new_opt_state,
                             grad_acc=zeros,
                             step=state.step + 1)

    def hold_branch(state, acc):
        return state.replace(grad_acc=acc)

    def step_fn(state, batch):
        from ..data.schema import expand_batch, slice_window_batch
        if window:
            batch = slice_window_batch(batch, state.micro_step % window)
        batch = expand_batch(batch)  # no-op unless wire-compacted
        (loss, terms), grads = grad_fn(state.params, batch)
        inv = 1.0 / accumulation_steps
        if accumulation_steps == 1:
            # fast path: no accumulator traffic, no conditional; grad_acc
            # passes through untouched (XLA aliases it, no zero-fill)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      opt_state=new_opt_state,
                                      step=state.step + 1)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g * inv, state.grad_acc, grads)
            is_boundary = (state.micro_step + 1) % accumulation_steps == 0
            new_state = jax.lax.cond(is_boundary, apply_branch,
                                     hold_branch, state, acc)
        new_state = new_state.replace(micro_step=state.micro_step + 1)
        return new_state, (loss * inv, terms)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_fused_window_step(model, evaluator, tx, weights,
                           accumulation_steps: int, window: int,
                           is_raw: bool = True):
    """K train steps in ONE dispatch: ``lax.scan`` over a staged window.

    The per-step program is dispatch-bound on tunnelled/remote TPUs (and
    pays per-launch overhead everywhere); scanning the whole K-batch
    window through the step body amortises every per-launch cost over K
    steps.  Semantically identical to K calls of the single step — the
    scan's xs slicing replaces the on-device dynamic index.

    Returns ``fused(state, window_batch) -> (state, (loss[K], terms[K]))``
    where every leaf of the outputs carries a leading K axis (per-step
    values, already divided by ``accumulation_steps``).
    """
    loss_fn = make_loss_fn(model, evaluator, weights, is_raw)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def apply_branch(state, acc):
        updates, new_opt_state = tx.update(acc, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
        return state.replace(params=new_params,
                             opt_state=new_opt_state,
                             grad_acc=zeros,
                             step=state.step + 1)

    def hold_branch(state, acc):
        return state.replace(grad_acc=acc)

    def body(state, batch):
        from ..data.schema import expand_batch
        batch = expand_batch(batch)  # no-op unless wire-compacted
        (loss, terms), grads = grad_fn(state.params, batch)
        inv = 1.0 / accumulation_steps
        if accumulation_steps == 1:
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      opt_state=new_opt_state,
                                      step=state.step + 1)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g * inv, state.grad_acc, grads)
            is_boundary = (state.micro_step + 1) % accumulation_steps == 0
            new_state = jax.lax.cond(is_boundary, apply_branch,
                                     hold_branch, state, acc)
        new_state = new_state.replace(micro_step=state.micro_step + 1)
        return new_state, (loss * inv, terms)

    def fused(state, window_batch):
        from ..data.schema import PooledEventWire, slice_window_batch
        if isinstance(window_batch.events, PooledEventWire):
            # pooled event wire: the flat pool cannot ride the scan's xs
            # (no leading K axis); scan over the step index instead and
            # let slice_window_batch cut batch k out of the closure-
            # captured window (dynamic_slice at offsets[k] for events,
            # dynamic_index_in_dim for the stacked leaves — the same op
            # scan xs slicing lowers to)
            def body_pooled(st, idx):
                return body(st, slice_window_batch(window_batch, idx))
            return jax.lax.scan(body_pooled, state,
                                jnp.arange(window, dtype=jnp.int32),
                                length=window)
        return jax.lax.scan(body, state, window_batch, length=window)

    return jax.jit(fused, donate_argnums=(0,))


def make_eval_step(model, evaluator, weights, is_raw: bool = True):
    """Jitted validation step: (params, batch) -> (loss, terms)."""
    loss_fn = make_loss_fn(model, evaluator, weights, is_raw)
    return jax.jit(loss_fn)


def make_fused_eval_step(model, evaluator, weights, window: int,
                         is_raw: bool = True):
    """K validation steps in ONE dispatch: ``lax.scan`` over a window.

    The per-batch ``validate`` loop pays a dispatch + fresh-input-buffer
    upload per batch — the exact cost the device queue removes from
    training (data/device_queue.py).  Scanning a staged K-batch window
    through the loss amortises it identically; there is no state, so the
    body is just the forward + loss.

    Returns ``fused(params, window_batch) -> (loss[K], terms[K])`` with a
    leading K axis on every output leaf (the caller masks the repeat-
    padded tail of a partial final window via ``n_valid``).
    """
    loss_fn = make_loss_fn(model, evaluator, weights, is_raw)

    def body(params, batch):
        from ..data.schema import expand_batch
        return params, loss_fn(params, expand_batch(batch))

    def fused(params, window_batch):
        _, out = jax.lax.scan(body, params, window_batch, length=window)
        return out

    return jax.jit(fused)
