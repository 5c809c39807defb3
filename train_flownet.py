#!/usr/bin/env python3
"""Training CLI — composition root.

TPU-native counterpart of the reference train_flownet.py: parses the shared
option groups, builds model/optimizer/losses/hooks/loader, resumes from the
newest checkpoint (parameters, optimizer state, samples_passed, and the data
stream position), and runs the jitted training loop.
"""
from argparse import ArgumentParser
import os
from pathlib import Path
import sys

from dvs_of_training_framework_tpu.utils.options import (
    add_train_arguments, add_preprocessed_dataset_arguments,
    validate_train_args)

script_dir = Path(__file__).resolve().parent


def parse_args(args, is_write=True):
    parser = ArgumentParser()
    parser = add_train_arguments(parser)
    parser = add_preprocessed_dataset_arguments(parser)

    args = parser.parse_args(args)
    args = validate_train_args(args)
    if args.device:
        os.environ.setdefault('JAX_PLATFORMS', args.device)

    from dvs_of_training_framework_tpu.data.dataloader import choose_data_path
    from dvs_of_training_framework_tpu.utils.common import (
        collect_execution_info, check_execution_info, write_execution_info)

    args = choose_data_path(args)
    args.model.mkdir(exist_ok=True, parents=True)
    args.log_path = args.model / 'log'

    # resolve --event-capacity auto / --wire-events auto before provenance
    # is collected so the recorded (and resume-checked) values are concrete
    from dvs_of_training_framework_tpu.utils.options import (
        resolve_event_capacity, resolve_wire_events)
    resolve_event_capacity(args)
    resolve_wire_events(args)

    execution_info = collect_execution_info(args)
    check_execution_info(args.model, execution_info, args)
    if is_write:
        write_execution_info(args.model, execution_info)
    return args


def pad_sequence_length(args):
    """Per-sample slot size for dynamic sample lengths (None = static).

    ``max_sequence_length`` counts the TOTAL elements per sample (prefix and
    suffix context included) — the model's ``max_sequence_length`` kwarg uses
    the same convention (see tests/training/test_sequences.py).
    """
    return args.max_sequence_length if args.dynamic_sample_length else None


def create_hooks(args, serializer, state_holder, eval_step, logger, tags,
                 event_image_fn=None, localize_params=False,
                 fused_eval_step=None, eval_window=0,
                 val_prepare_batch=None):
    """Periodic hooks: serialization every checkpointing_interval,
    validation every vp (reference train_flownet.py:112-126).

    ``localize_params=True`` (multi-host) fetches the replicated params to
    host before validation: the single-device eval_step cannot consume
    arrays committed to a multi-process mesh.
    """
    from dvs_of_training_framework_tpu.data.dataloader import (
        get_dataloader, get_valset_params)
    from dvs_of_training_framework_tpu.training.hooks import (
        SerializationHook, ValidationHook)
    from dvs_of_training_framework_tpu.training.train import \
        make_hook_periodic

    if localize_params:
        import jax

        def get_params():
            return jax.device_get(state_holder['state'].params)
    else:
        def get_params():
            return state_holder['state'].params

    hooks = {'serialization': SerializationHook(
        serializer, lambda: state_holder['state'], logger)}
    periods = {'serialization': args.checkpointing_interval}
    if not args.skip_validation:
        def loader_factory():
            return get_dataloader(get_valset_params(args),
                                  event_image_fn=event_image_fn)
        hooks['validation'] = ValidationHook(
            eval_step, get_params,
            loader_factory, logger, tags, is_raw=True,
            event_capacity=args.event_capacity,
            sequence_length=pad_sequence_length(args),
            fused_eval_step=fused_eval_step, window=eval_window,
            prepare_batch=val_prepare_batch)
        periods['validation'] = args.vp
    periodic_hooks = {k: make_hook_periodic(hooks[k], periods[k])
                      for k in periods}
    return periodic_hooks, hooks


def main(argv=None):
    # provenance is written after distributed init: only process 0 may
    # write (identical concurrent writers could interleave)
    args = parse_args(sys.argv[1:] if argv is None else argv,
                      is_write=False)

    # multi-host: must run before the first jax.devices() touch
    from dvs_of_training_framework_tpu.parallel import \
        maybe_initialize_distributed
    maybe_initialize_distributed(args)

    from dvs_of_training_framework_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax

    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    if is_main:
        from dvs_of_training_framework_tpu.utils.common import (
            collect_execution_info, write_execution_info)
        write_execution_info(args.model, collect_execution_info(args))
    if n_proc > 1:
        # per-process input pipelines: each process loads/collates ONLY
        # its 1/n_proc slice of every global batch (workers stay on) —
        # the preprocessed stream strides by process, the raw stream
        # draws independently per process (see the loader block below)
        if args.mesh is None:
            args.mesh = f'data:{len(jax.devices())}'
    from dvs_of_training_framework_tpu.data.dataloader import (
        get_dataloader, get_trainset_params)
    from dvs_of_training_framework_tpu.losses import init_losses
    from dvs_of_training_framework_tpu.models import init_model
    from dvs_of_training_framework_tpu.training.optimizers import (
        construct_optimizer, current_learning_rates)
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_eval_step, make_train_step)
    from dvs_of_training_framework_tpu.training.train import (
        shapes2tags, train)
    from dvs_of_training_framework_tpu.utils.monitor import DeviceMonitor
    from dvs_of_training_framework_tpu.utils.profiling import Profiler
    from dvs_of_training_framework_tpu.utils.tb import SummaryWriter
    from dvs_of_training_framework_tpu.utils.timer import (
        FakeTimer, SynchronizedWallClockTimer)

    timers = SynchronizedWallClockTimer() if args.timers else FakeTimer()

    model, params = init_model(
        args, jax.random.PRNGKey(getattr(args, 'init_seed', 0)))

    serializer = Serializer(args.model,
                            args.num_checkpoints,
                            args.permanent_interval)

    args.do_not_continue = (args.do_not_continue
                            or len(serializer.list_known_steps()) == 0)
    last_step = (0 if args.do_not_continue
                 else serializer.list_known_steps()[-1])

    tx = construct_optimizer(args, params)

    evaluator = init_losses(
        args.shape, args.bs,
        lambda p, e, t, s, i: model.apply({'params': p}, e, t, s, i),
        params,
        sequence_length=args.max_sequence_length,
        loss_precision=getattr(args, 'loss_precision', 'highest'))
    tags = shapes2tags(evaluator.shapes)

    if is_main:
        logger = SummaryWriter(str(args.log_path))
    else:
        from dvs_of_training_framework_tpu.utils.tb import NullSummaryWriter
        logger = NullSummaryWriter()

    prepare_batch = None
    train_step_fused = None
    place_window = None
    window = args.device_queue_window
    if args.mesh is not None:
        from dvs_of_training_framework_tpu.parallel import (
            make_global_batch, make_mesh, make_sharded_fused_window_step,
            make_sharded_train_step, split_batch_for_mesh)
        mesh = make_mesh(args.mesh)
        event_axis = 'event' if 'event' in mesh.shape else None
        event_shards = mesh.shape.get('event', 1)
        assert args.is_raw or event_axis is None, \
            '--mesh with an event axis requires raw events: --ev_images ' \
            'batches have no event axis to shard'
        train_step, n_shards = make_sharded_train_step(
            model, evaluator, tx, args.loss_weights, args.accum_step,
            mesh, is_raw=args.is_raw, event_axis=event_axis, window=window)
        assert args.mbs % n_shards == 0, \
            f'micro batch {args.mbs} not divisible by {n_shards} devices'
        assert (n_shards * event_shards) % n_proc == 0, \
            f'mesh of {n_shards * event_shards} devices not divisible ' \
            f'by {n_proc} processes'
        if window > 0 and window % args.accum_step == 0:
            train_step_fused = make_sharded_fused_window_step(
                model, evaluator, tx, args.loss_weights, args.accum_step,
                mesh, window, is_raw=args.is_raw, event_axis=event_axis)

        # each process splits its LOCAL slice of the batch into its local
        # shards; shard capacity is sized by the GLOBAL device count so
        # every process agrees (single-process: local == global)
        n_local_shards = n_shards // n_proc

        def split_only(collated, capacity):
            return split_batch_for_mesh(
                collated, n_local_shards,
                capacity_per_shard=max(capacity // n_shards, 4096),
                event_shards=event_shards,
                sequence_length=pad_sequence_length(args))

        if window > 0:
            # device queue over the mesh: prepare splits on host, the
            # window producer stacks K sharded batches and place_window
            # uploads them once with the mesh sharding
            prepare_batch = split_only

            def place_window(stacked):
                return make_global_batch(stacked, mesh,
                                         event_axis=event_axis,
                                         window=True)
        else:
            def prepare_batch(collated, capacity):
                return make_global_batch(split_only(collated, capacity),
                                         mesh, event_axis=event_axis)
    else:
        train_step = make_train_step(model, evaluator, tx,
                                     args.loss_weights,
                                     args.accum_step, is_raw=args.is_raw,
                                     window=window)
        if window > 0 and window % args.accum_step == 0:
            from dvs_of_training_framework_tpu.training.state import \
                make_fused_window_step
            train_step_fused = make_fused_window_step(
                model, evaluator, tx, args.loss_weights, args.accum_step,
                window, is_raw=args.is_raw)
    val_prepare_batch = None
    if args.mesh is not None and n_proc == 1:
        # single-process mesh: validation runs SHARDED (the eval step is
        # the train step minus the update — it shards the same way), so
        # a mesh run validates at mesh speed instead of single-device on
        # localized params.  Measured on the 8-device virtual CPU mesh
        # (scripts/benchmarks/mesh_validation_cost.py, equal total work
        # timeshared on one core): 1.33x at the production shape
        # (EVF-64, 131k events, 256^2) — on real chips the n-way compute
        # parallelism comes on top.  Multi-host keeps the proc-0
        # localized path: hooks are proc-0-only side effects and a
        # collective eval would need every process in the firing.
        from dvs_of_training_framework_tpu.parallel import \
            make_sharded_eval_step
        eval_step = make_sharded_eval_step(model, evaluator,
                                           args.loss_weights, mesh,
                                           is_raw=True)

        def val_prepare_batch(collated, capacity):
            if int(collated['size']) % n_shards:
                raise ValueError('remainder batch not divisible by mesh')
            return make_global_batch(
                split_batch_for_mesh(
                    collated, n_shards,
                    capacity_per_shard=max(capacity // n_shards, 4096),
                    sequence_length=pad_sequence_length(args)),
                mesh)
    else:
        eval_step = make_eval_step(model, evaluator, args.loss_weights,
                                   is_raw=True)
    # windowed validation (--validation-window K, default 8): 2.1x faster
    # per firing with bit-equal scalars (PERFORMANCE.md round-5
    # correction — the round-4 "neutral-to-worse" closure was a retrace
    # bias in the A/B harness).  (Mesh-windowed validation is not wired:
    # the queue's place_fn is mesh-committed; mesh runs validate sharded
    # per-batch instead.)
    val_window = getattr(args, 'validation_window', 0)
    fused_eval_step = None
    if val_window > 0 and args.mesh is None and not args.skip_validation:
        from dvs_of_training_framework_tpu.training.state import \
            make_fused_eval_step
        fused_eval_step = make_fused_eval_step(
            model, evaluator, args.loss_weights, val_window, is_raw=True)

    state = create_train_state(params, tx)
    state_holder = {'state': state}

    event_image_fn = None
    if not args.is_raw:
        from dvs_of_training_framework_tpu.models.loader import \
            load_model_class
        net = load_model_class(args.flownet_path)
        depth = args.event_representation_depth

        def event_image_fn(events, start_ts, stop_ts, shape):
            return net.compute_event_image(events, start_ts, stop_ts, shape,
                                           depth=depth)

    if is_main:
        periodic_hooks, hooks = create_hooks(args, serializer,
                                             state_holder, eval_step,
                                             logger, tags, event_image_fn,
                                             localize_params=n_proc > 1,
                                             fused_eval_step=fused_eval_step,
                                             eval_window=val_window,
                                             val_prepare_batch=val_prepare_batch)
    else:
        # process 0 owns all side-effects (checkpoints, TB, validation);
        # the collective train step itself runs on every process
        def _noop(step, samples):
            return None
        periodic_hooks = {}
        hooks = {'serialization': _noop, 'validation': _noop}

    if not args.do_not_continue:
        global_step, ckpt_params, opt_state, extra = \
            serializer.load_checkpoint(last_step,
                                       params_target=state.params,
                                       opt_state_target=state.opt_state)
        state = state.replace(params=ckpt_params, opt_state=opt_state,
                              step=global_step)
        samples_passed = int(extra.pop('samples_passed',
                                       global_step * args.bs))
        state_holder['state'] = state
    else:
        global_step = 0
        samples_passed = 0
        state_holder['state'] = state
        hooks['serialization'](global_step, samples_passed)

    trainset_params = get_trainset_params(args)
    if n_proc > 1:
        # each process reads/collates only its slice of the global batch
        assert args.mbs % n_proc == 0, \
            f'micro batch {args.mbs} not divisible by {n_proc} processes'
        trainset_params.batch_size = args.mbs // n_proc
        trainset_params.process_index = jax.process_index()
        trainset_params.process_count = n_proc
    loader = get_dataloader(trainset_params,
                            sample_idx=samples_passed,
                            process_only_once=args.process_only_once,
                            event_image_fn=event_image_fn)
    if n_proc > 1 and args.preprocessed_dataset_path is not None:
        # the oversized-batch decision must be identical on every process
        # (a diverging skip would silently skew proc-0 sample accounting);
        # the stream is static, so the rule is a pure function of
        # precomputed per-sample sizes — zero communication.  Raw streams
        # bound per-shard EVENTS by the device buffer; dense quantized
        # streams bound per-shard CHANNELS by the worst batch the stream
        # itself can serve (static-length streams therefore never skip —
        # same as the single-process loop — but a mixed-length stream
        # skips identically on every process)
        from dvs_of_training_framework_tpu.parallel.distributed import \
            ShardedBatchSkipper
        if args.is_raw:
            from dvs_of_training_framework_tpu.data.preprocessed import \
                per_sample_event_counts
            costs = per_sample_event_counts(args.preprocessed_dataset_path)
            cap = min(args.event_capacity, args.max_events_per_batch)
            cap_per_shard = max(cap // n_shards, 4096)
            unit = 'events'
        else:
            import numpy as np
            from dvs_of_training_framework_tpu.data.preprocessed import \
                per_sample_channel_counts
            costs = per_sample_channel_counts(
                args.preprocessed_dataset_path)
            spd = args.mbs // n_shards
            wrapped = np.concatenate([costs, costs[:max(spd - 1, 0)]])
            csum = np.concatenate([[0], np.cumsum(wrapped)])
            cap_per_shard = int((csum[spd:] - csum[:-spd]).max()) \
                if spd < wrapped.size else int(costs.sum())
            unit = 'channels'
        loader = ShardedBatchSkipper(
            loader, costs,
            global_batch=args.mbs, n_shards=n_shards,
            capacity_per_shard=cap_per_shard,
            start_sample=samples_passed, unit=unit)

    if not args.skip_validation:
        hooks['validation'](global_step, samples_passed)

    def on_state_update(s):
        state_holder['state'] = s

    def lr_fn(step):
        return current_learning_rates(args, step)

    from contextlib import nullcontext
    profiler_cm = (Profiler(args.profiling, args.model / 'profiling')
                   if is_main else nullcontext())
    monitor_cm = DeviceMonitor(args.log_path) if is_main else nullcontext()
    with profiler_cm, monitor_cm:
        state, samples_passed = train(
            train_step,
            state,
            loader,
            args.training_steps,
            logger=logger,
            tags=tags,
            lr_fn=lr_fn,
            weights=args.loss_weights,
            is_raw=args.is_raw,
            accumulation_steps=args.accum_step,
            event_capacity=args.event_capacity,
            timers=timers,
            hooks=periodic_hooks,
            init_step=global_step,
            init_samples_passed=samples_passed,
            max_events_per_batch=args.max_events_per_batch,
            on_state_update=on_state_update,
            prepare_batch=prepare_batch,
            sequence_length=pad_sequence_length(args),
            window=window,
            train_step_fused=train_step_fused,
            place_window=place_window,
            samples_scale=n_proc,
            wire_timestamps=args.wire_timestamps,
            wire_events=args.wire_events,
            wire_data=args.wire_data)

    state_holder['state'] = state
    samples = samples_passed
    hooks['serialization'](args.training_steps, samples)
    if not args.skip_validation:
        hooks['validation'](args.training_steps, samples)
    logger.close()


if __name__ == '__main__':
    main()
