"""Optimizer construction: ADAM(W+amsgrad), RADAM, RANGER as optax chains.

Parity targets: reference train_flownet.py:57-109.

- ADAM   -> AdamW with amsgrad (torch ``AdamW(amsgrad=True)``)
- RADAM  -> rectified Adam (the RAdam submodule)
- RANGER -> RAdam + gradient centralization + Lookahead (the
  Ranger-Deep-Learning-Optimizer submodule's defaults: sync_period 6,
  slow step 0.5, GC for parameters with >1 dimension)

Two parameter groups are supported when the model exposes a
``quantization_layer`` submodule: the representation group's learning rate
stays 0 for the first ``representation_start`` fraction of training
(reference construct_train_tools, train_flownet.py:78-109), both groups then
follow warmup + exponential half-life decay.

Lookahead is implemented as a self-contained gradient transformation holding
the slow weights in its optimizer state, so checkpoints capture them and
resume is exact (the "lookahead slow weights interact with resume" hazard
called out in SURVEY.md §7).
"""
import typing
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_lr_schedule(lr, num_warmup_steps, half_life, delay_steps=0,
                     rewarmup_steps=0):
    """Warmup + exponential half-life decay, optionally delayed to 0.

    Matches reference pred_scheduler/repr_scheduler
    (train_flownet.py:91-99): ``step/warmup`` ramp, then
    ``2 ** (-(step - warmup) / half_life)``; the delayed variant returns 0
    until ``delay_steps``.

    ``rewarmup_steps`` (beyond reference parity, off by default) ramps a
    delayed schedule linearly from 0 over that many steps once it
    unfreezes, instead of the reference's jump straight to the shared
    (already-decayed) LR — a discontinuity in the effective objective
    for the converged predictor.
    """
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if num_warmup_steps > 0:
            warm = step / num_warmup_steps
        else:
            warm = jnp.ones_like(step)
        decay = jnp.exp2(-(step - num_warmup_steps) / half_life)
        value = jnp.where(step < num_warmup_steps, warm, decay) * lr
        if delay_steps > 0:
            value = jnp.where(step > delay_steps, value, 0.0)
            if rewarmup_steps > 0:
                ramp = jnp.clip((step - delay_steps) / rewarmup_steps,
                                0.0, 1.0)
                value = value * ramp
        return value
    return schedule


class LookaheadState(NamedTuple):
    slow_params: optax.Params
    step: jnp.ndarray
    inner_state: optax.OptState


def lookahead(inner: optax.GradientTransformation,
              sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper keeping slow weights inside the optimizer state.

    Every ``sync_period`` inner steps the fast weights are pulled toward the
    slow weights: ``slow += alpha * (fast - slow); fast = slow``.
    """

    def init_fn(params):
        # explicit copy: the slow weights must not alias the live params
        # (aliasing breaks buffer donation of the train state)
        return LookaheadState(
            slow_params=jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), params),
            step=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params))

    def update_fn(updates, state, params=None):
        assert params is not None, 'lookahead requires params'
        inner_updates, inner_state = inner.update(updates, state.inner_state,
                                                  params)
        step = state.step + 1
        sync = step % sync_period == 0

        fast = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                      inner_updates)
        synced_slow = jax.tree_util.tree_map(
            lambda s, f: s + slow_step_size * (f - s),
            state.slow_params, fast)

        # on sync steps params jump to the updated slow weights;
        # otherwise they take the fast step and slow weights stay put
        final_updates = jax.tree_util.tree_map(
            lambda ss, f, p: jnp.where(sync, ss, f) - p,
            synced_slow, fast, params)
        final_slow = jax.tree_util.tree_map(
            lambda ss, s: jnp.where(sync, ss, s),
            synced_slow, state.slow_params)
        return final_updates, LookaheadState(final_slow, step, inner_state)

    return optax.GradientTransformation(init_fn, update_fn)


def gradient_centralization() -> optax.GradientTransformation:
    """Subtract the per-filter gradient mean for parameters with ndim > 1
    (Ranger's use_gc=True, gc_conv_only=False)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def center(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - g.mean(axis=axes, keepdims=True)
            return g
        return jax.tree_util.tree_map(center, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _base_transform(name: str, weight_decay: float, schedule,
                    flatten: bool = False) -> optax.GradientTransformation:
    """Scale-by chain for one optimizer family + decoupled wd + lr.

    ``flatten`` wraps the chain in ``optax.flatten`` so the elementwise
    optimizer math runs over one contiguous buffer instead of ~200 small
    per-leaf kernels.  That was a round-1 win when the step was
    dispatch-bound; the step is now device-bound and the wrapper's two
    53 MB concats (grads + params) plus flat copies cost ~1.1 ms/step
    (scripts/benchmarks/ab_optflat.py: 16.1 vs 17.2 ms on v5e), so
    per-leaf is the default.  ``flatten=True`` (--flat-optimizer)
    remains available to RESUME checkpoints written with the flat
    optimizer state (the opt-state tree structures differ).
    """
    name = name.upper()
    if name == 'ADAM':
        core = optax.chain(optax.scale_by_amsgrad(),
                           optax.add_decayed_weights(weight_decay),
                           optax.scale_by_schedule(lambda s: -schedule(s)))
        return optax.flatten(core) if flatten else core
    if name == 'RADAM':
        core = optax.chain(optax.scale_by_radam(),
                           optax.add_decayed_weights(weight_decay),
                           optax.scale_by_schedule(lambda s: -schedule(s)))
        return optax.flatten(core) if flatten else core
    if name == 'RANGER':
        core = optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(lambda s: -schedule(s)))
        # when flattening, wrap lookahead TOO (its slow-weight/sync math
        # is elementwise); only gradient centralization needs leaf
        # shapes and stays outside.  Identical math, element for element.
        wrapped = lookahead(core)
        if flatten:
            wrapped = optax.flatten(wrapped)
        return optax.chain(gradient_centralization(), wrapped)
    raise ValueError(f'Unknown optimizer type {name}')


def has_split_params(params) -> bool:
    """Model exposes a quantization_layer submodule (two-group training)."""
    return isinstance(params, dict) and 'quantization_layer' in params


class ParamEmaState(NamedTuple):
    inner_state: typing.Any
    ema_params: optax.Params


def with_param_ema(inner: optax.GradientTransformation,
                   decay: float) -> optax.GradientTransformation:
    """Outermost rider maintaining an EMA of the POST-update parameters.

    Stabiliser for eval/serving (beyond reference parity, off by
    default): the coarse-flow-head explosions characterized in round 5
    (ACCURACY.md — localized 10^3-10^4 px flow on rare inputs at late
    checkpoints) are transient parameter excursions; an exponential
    moving average of the weights rides through them.  The EMA lives in
    the optimizer state, so checkpoints carry it for free and resume is
    exact; ``Serializer.finalize(use_ema=True)`` / ``test.py --use-ema``
    export and evaluate it.  Must wrap the COMPLETE chain (it applies
    the final updates to compute the post-step params).
    """
    assert 0.0 < decay < 1.0, decay

    def init(params):
        # explicit copy: the EMA must not alias the live params
        # (donate_argnums buffer donation would corrupt it)
        return ParamEmaState(
            inner_state=inner.init(params),
            ema_params=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params))

    def update(updates, state, params=None):
        assert params is not None, 'param EMA needs params'
        updates, inner_state = inner.update(updates, state.inner_state,
                                            params)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema_params, new_params)
        return updates, ParamEmaState(inner_state=inner_state,
                                      ema_params=ema)

    return optax.GradientTransformation(init, update)


def construct_optimizer(args, params) -> optax.GradientTransformation:
    """Build the optimizer for a model's params.

    When ``params`` contains a top-level ``quantization_layer`` collection,
    two groups are created: the representation group's schedule is delayed by
    ``training_steps * rs`` steps (reference train_flownet.py:78-99).
    """
    representation_start = int(getattr(args, 'training_steps', 0)
                               * getattr(args, 'rs', 0))
    warmup = getattr(args, 'num_warmup_steps', 0)

    def with_clip(tx):
        # opt-in global-norm gradient clipping (reference has none).
        # Motivation: the round-3 fp32 accuracy run diverged at step
        # ~16.7k — a few giant-gradient steps (smoothness term spiking
        # 4000x) knocked a 90%-good model into a degenerate basin it
        # took 20k steps to partially climb out of (ACCURACY.md).
        clip = float(getattr(args, 'grad_clip_norm', 0.0) or 0.0)
        if clip > 0.0:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        # opt-in parameter EMA for eval/serving (--ema-decay); MUST be
        # the outermost rider (it applies the final updates)
        ema = float(getattr(args, 'ema_decay', 0.0) or 0.0)
        if ema > 0.0:
            tx = with_param_ema(tx, ema)
        return tx

    # --flat-optimizer: legacy flat opt-state layout (see _base_transform)
    flatten = bool(getattr(args, 'flat_optimizer', False))

    pred_schedule = make_lr_schedule(args.lr, warmup, args.half_life)
    if not has_split_params(params):
        return with_clip(_base_transform(args.optimizer, args.wdw,
                                         pred_schedule, flatten=flatten))

    repr_schedule = make_lr_schedule(
        args.lr, warmup, args.half_life,
        delay_steps=representation_start,
        rewarmup_steps=getattr(args, 'representation_warmup_steps', 0))
    label_fn = (lambda tree: {
        k: ('representation' if k == 'quantization_layer' else 'predictor')
        for k in tree})
    return with_clip(optax.multi_transform(
        {'representation': _base_transform(args.optimizer, args.wdw,
                                           repr_schedule,
                                           flatten=flatten),
         'predictor': _base_transform(args.optimizer, args.wdw,
                                      pred_schedule, flatten=flatten)},
        label_fn))


def _schedule_value_host(lr, num_warmup_steps, half_life, step,
                         delay_steps=0, rewarmup_steps=0):
    """Closed-form host evaluation of ``make_lr_schedule`` (NumPy f32).

    The train loop logs learning rates at every optimizer boundary;
    evaluating the jnp schedule eagerly there dispatches ~10 tiny device
    ops per call, each a full RPC through a tunnelled TPU (~25-30 ms) —
    measured to cap the as-trained CLI at ~5 steps/s while the device
    step itself runs in ~28 ms.  Same math, float32, zero device traffic.
    """
    step_f = np.float32(step)
    if delay_steps > 0 and not step_f > np.float32(delay_steps):
        return 0.0
    if num_warmup_steps > 0 and step_f < np.float32(num_warmup_steps):
        value = step_f / np.float32(num_warmup_steps)
    else:
        value = np.exp2(np.float32(
            -(step_f - np.float32(num_warmup_steps))
            / np.float32(half_life)))
    value = np.float32(value) * np.float32(lr)
    if delay_steps > 0 and rewarmup_steps > 0:
        ramp = np.clip((step_f - np.float32(delay_steps))
                       / np.float32(rewarmup_steps),
                       np.float32(0.0), np.float32(1.0))
        value = value * np.float32(ramp)
    return float(value)


def current_learning_rates(args, step: int):
    """Host-side LR readout for logging (General/learning rate/{i})."""
    warmup = getattr(args, 'num_warmup_steps', 0)
    rs_steps = int(getattr(args, 'training_steps', 0) * getattr(args, 'rs', 0))
    rewarm = getattr(args, 'representation_warmup_steps', 0)
    return [_schedule_value_host(args.lr, warmup, args.half_life, step,
                                 delay_steps=rs_steps,
                                 rewarmup_steps=rewarm),
            _schedule_value_host(args.lr, warmup, args.half_life, step)]
