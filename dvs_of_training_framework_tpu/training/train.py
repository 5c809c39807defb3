"""Host-side training loop: batching, skipping, logging, hooks.

Orchestrates the jitted train step (state.py) with the semantics of the
reference loop (utils/training.py:89-271): oversized-batch skipping,
per-scale loss logging keyed by samples_passed, periodic hooks called at
optimizer-step boundaries, and a validation pass.
"""
from ..data.prefetch import prefetch_to_device
from ..data.schema import pad_batch
from ..utils.timer import FakeTimer


def make_hook_periodic(hook, interval):
    wrapper = lambda step, *args: (None if step % interval  # noqa: E731
                                   else hook(step, *args))
    # exposed so the train loop can flush deferred metrics before a hook
    # actually fires (TB history must stay aligned with checkpoints)
    wrapper.interval = interval
    return wrapper


def shapes2tags(shapes):
    return [f'{h}x{w}' for h, w in shapes]


def add_loss(loss_sum, loss_values):
    if len(loss_sum) == 0:
        return [float(v) for v in loss_values]
    return [x + float(y) for x, y in zip(loss_sum, loss_values)]


def batch_num_events(batch, is_raw=True):
    if not is_raw:
        return 0
    return int(batch['events']['x'].size)


def train(train_step,
          state,
          loader,
          num_steps: int,
          logger,
          tags,
          lr_fn=None,
          weights=(0.5, 1, 1),
          is_raw=True,
          accumulation_steps=1,
          event_capacity=2 ** 18,
          timers=None,
          hooks={},
          init_step=0,
          init_samples_passed=0,
          max_events_per_batch: int = 350000,
          on_state_update=None,
          prepare_batch=None,
          prefetch_depth: int = 2,
          sequence_length=None,
          metric_flush_steps: int = 16,
          window: int = 0,
          train_step_fused=None,
          place_window=None,
          samples_scale: int = 1,
          wire_timestamps: str = 'f32',
          wire_events: str = 'padded',
          wire_data: str = 'f32'):
    """Run the training loop.

    Args:
        train_step: jitted ``(state, batch) -> (state, (loss, terms))``.
        state: initial TrainState.
        loader: iterable of host-collated ragged batch dicts.
        num_steps: total optimizer steps to reach.
        logger: SummaryWriter-compatible object.
        tags: per-scale tag strings (e.g. '32x32') for metric names.
        lr_fn: ``step -> [lr_i]`` for learning-rate logging.
        event_capacity: fixed device event-buffer size; batches that do not
            fit are skipped (with max_events_per_batch this mirrors the
            reference's oversized-batch circuit breaker).
        hooks: dict of periodic hooks called with (step, samples_passed).
        on_state_update: optional callback receiving the latest state (used
            by hooks that need fresh params, e.g. serialization).
        prepare_batch: optional ``(collated, capacity) -> device Batch``
            override (the mesh path shards batches across devices here).
        prefetch_depth: number of batches padded + device_put ahead on a
            background thread so H2D transfer overlaps device compute
            (0 = synchronous; TPU analogue of the reference's pinned-memory
            worker prefetch, utils/dataloader.py:39,103-108).
        window: device-queue window K (0 = off): K batches are staged per
            upload and the jitted step slices on device (train_step must
            be built with the same ``window`` — see state.make_train_step
            and data/device_queue.py).  Requires micro_step to start
            window-aligned, which holds for fresh/resumed states (and is
            asserted at entry).
        place_window: window-upload override forwarded to
            ``prefetch_windows`` — required when ``prepare_batch`` is also
            set (mesh mode: prepare_batch splits on host, place_window
            uploads the stacked window with the mesh sharding).
        wire_timestamps: 'f32' (default, exact) or 'u16' — quantize the
            event-timestamp wire leg to uint16 + per-batch scale
            (~5 µs absolute error; halves that upload leg — see
            schema.PackedEventBuffer).  Device-queue path only.
        wire_events: 'padded' (default) or 'pooled' — pool only the
            VALID events of each window on the wire (bit-identical
            values, ~`1 - fill` fewer event bytes; see
            schema.PooledEventWire).  Device-queue path only; not
            composable with a mesh ``place_window``.
        wire_data: 'f32' (default, exact) or 'bf16' — ship dense
            quantized batches (--ev_images) as bfloat16, halving their
            wire bytes; effect-lossless under --precision bfloat16
            (see schema.compact_batch).  Device-queue path only.
        samples_scale: multiplier applied to every host batch's ``size``
            when accounting samples_passed — multi-host processes see only
            their ``1/process_count`` slice of each global batch, but
            samples_passed (LR schedule, metrics x-axis, resume seek into
            the global stream) counts GLOBAL samples.

    Returns:
        (state, samples_passed)
    """
    if timers is None:
        timers = FakeTimer()
    throughput = None
    if not isinstance(timers, FakeTimer):
        from ..utils.timer import ThroughputTimer
        throughput = ThroughputTimer(batch_size=None)
    samples_passed = init_samples_passed
    pending_micro = []       # device (loss, terms) since the last boundary
    pending_boundaries = []  # deferred metric records (see flush_metrics)
    boundary_count = 0       # optimizer boundaries deferred so far
    init_batch = init_step * accumulation_steps
    global_step = init_batch
    num_skipped = 0
    capacity = min(event_capacity, max_events_per_batch)

    def make_device_batch(host_batch):
        num_events = batch_num_events(host_batch, is_raw)
        if num_events > capacity:
            raise OverflowError(f'{num_events} events > capacity {capacity}')
        if prepare_batch is not None:
            return prepare_batch(host_batch, capacity)
        return pad_batch(host_batch, capacity=capacity if is_raw else None,
                         sequence_length=sequence_length)

    def flush_metrics():
        """Materialise ALL deferred metrics in ONE device transfer.

        Per-scalar ``float()`` readback costs a full RPC roundtrip each
        (~30 ms through a tunnelled TPU — measured to dominate the 28 ms
        step); one batched device_get per ``metric_flush_steps``
        boundaries amortises it away.  Values and TB keys are identical,
        only the fetch is batched.
        """
        nonlocal pending_boundaries, boundary_count
        if not pending_boundaries:
            return
        import jax
        fetched = jax.device_get(pending_boundaries)
        pending_boundaries = []
        boundary_count = 0

        def emit(b_step, b_samples, micro):
            loss_sum = 0.0
            smooth_sum, photo_sum, out_reg_sum = [], [], []
            for p_loss, p_terms in micro:
                smoothness, photometric, out_reg = p_terms
                photo_sum = add_loss(photo_sum, photometric)
                smooth_sum = add_loss(smooth_sum, smoothness)
                out_reg_sum = add_loss(out_reg_sum, out_reg)
                loss_sum += float(p_loss)
            for tag, s, p, o in zip(tags, smooth_sum, photo_sum,
                                    out_reg_sum):
                logger.add_scalar(f'Train/photometric loss/{tag}',
                                  p / accumulation_steps, b_samples)
                logger.add_scalar(f'Train/smoothness loss/{tag}',
                                  s / accumulation_steps, b_samples)
                logger.add_scalar(f'Train/out regularization/{tag}',
                                  o / accumulation_steps, b_samples)
            logger.add_scalar('General/Train loss', loss_sum, b_samples)
            if lr_fn is not None:
                for i, lr in enumerate(lr_fn(b_step)):
                    logger.add_scalar(f'General/learning rate/{i}', lr,
                                      b_samples)

        for record in fetched:
            if record[0] == 'fused':
                # stacked per-micro-step outputs of a fused window, grouped
                # into optimizer boundaries of accumulation_steps micros
                _, first_step, samples_list, loss_k, terms_k = record
                import jax as _jax
                for j, b_samples in enumerate(samples_list):
                    micros = [
                        (loss_k[i], _jax.tree_util.tree_map(
                            lambda x, i=i: x[i], terms_k))
                        for i in range(j * accumulation_steps,
                                       (j + 1) * accumulation_steps)]
                    emit(first_step + j, b_samples, micros)
            else:
                _, b_step, b_samples, micro = record
                emit(b_step, b_samples, micro)

    def report_skip(host_batch):
        nonlocal num_skipped
        num_skipped += 1
        num_events = batch_num_events(host_batch, is_raw)
        num_processed = global_step - init_batch
        print(f'Skipping batch with {num_events} events')
        if num_events > capacity:
            print('Augmentation parameters '
                  f'{host_batch["augmentation_params"]}')
        rate = num_processed / max(num_processed + num_skipped, 1)
        print(f'Processing rate is {rate:.2f}')
        # cumulative counter in TB: multi-host runs compare this curve
        # across process logs to detect skip divergence (each process's
        # independent raw stream may legitimately skip different batches;
        # preprocessed streams must agree exactly — ShardedBatchSkipper)
        logger.add_scalar('General/skipped batches', num_skipped,
                          samples_passed)

    def run_step(host_batch, device_batch):
        """Per-(micro)batch body: step, metric bookkeeping, hooks."""
        nonlocal state, global_step, samples_passed, pending_micro, \
            boundary_count
        global_step += 1
        samples_passed += host_batch['size'] * samples_scale
        if throughput is not None:
            throughput.batch_size = host_batch['size']
            throughput.start()
        timers('train_step').start()
        state, (loss, terms) = train_step(state, device_batch)
        timers('train_step').stop()
        if throughput is not None:
            throughput.stop()

        is_step_boundary = global_step % accumulation_steps == 0

        timers('logging').start()
        # keep device scalars; metrics are fetched in batches of
        # metric_flush_steps boundaries (one RPC), never per scalar
        pending_micro.append((loss, terms))
        if is_step_boundary:
            step = global_step // accumulation_steps
            pending_boundaries.append(('single', step, samples_passed,
                                       pending_micro))
            pending_micro = []
            boundary_count += 1
            hook_fires = any(step % getattr(h, 'interval', 1) == 0
                             for h in hooks.values())
            if hook_fires or boundary_count >= metric_flush_steps:
                flush_metrics()
        timers('logging').stop()

        if is_step_boundary:
            step = global_step // accumulation_steps
            if on_state_update is not None:
                on_state_update(state)
            for k, hook in hooks.items():
                timers(k).start()
                hook(step, samples_passed)
                timers(k).stop()

        timers.log(names=['batch_construction',
                          'train_step',
                          'logging'] + list(hooks))

    def hook_inside(first_opt_step, count):
        """Does any hook fire at opt steps (first, first + count]?"""
        for h in hooks.values():
            interval = getattr(h, 'interval', 1)
            if (first_opt_step + count) // interval \
                    != first_opt_step // interval:
                return True
        return False

    def run_fused(host_batches, device_window):
        """One dispatch for a whole window (train_step_fused)."""
        nonlocal state, global_step, samples_passed, boundary_count
        assert not pending_micro, \
            'fused window entered with a partial accumulation group'
        if throughput is not None:
            throughput.batch_size = sum(b['size'] for b in host_batches)
            throughput.start()
        timers('train_step').start()
        state, (loss_k, terms_k) = train_step_fused(state, device_window)
        timers('train_step').stop()
        if throughput is not None:
            throughput.stop()
        base_step = global_step // accumulation_steps
        samples_list = []   # samples_passed at each optimizer boundary
        for i, host_batch in enumerate(host_batches):
            samples_passed += host_batch['size'] * samples_scale
            if (global_step + i + 1) % accumulation_steps == 0:
                samples_list.append(samples_passed)
        global_step += len(host_batches)
        timers('logging').start()
        pending_boundaries.append(('fused', base_step + 1, samples_list,
                                   loss_k, terms_k))
        boundary_count += len(samples_list)
        step = global_step // accumulation_steps
        hook_fires = any(step % getattr(h, 'interval', 1) == 0
                         for h in hooks.values())
        if hook_fires or boundary_count >= metric_flush_steps:
            flush_metrics()
        timers('logging').stop()
        if on_state_update is not None:
            on_state_update(state)
        for k, hook in hooks.items():   # periodic wrappers self-gate
            timers(k).start()
            hook(step, samples_passed)
            timers(k).stop()
        timers.log(names=['batch_construction', 'train_step', 'logging']
                   + list(hooks))

    if window > 0:
        assert prepare_batch is None or place_window is not None, \
            'a mesh prepare_batch under the device queue must come with ' \
            'a place_window that uploads the stacked window sharded'
        # the on-device ``micro_step % window`` slice assumes the loop
        # enters window-aligned; a state resumed mid-window would silently
        # consume the wrong staged batch each step
        import jax as _jax
        micro0 = int(_jax.device_get(state.micro_step))
        assert micro0 % window == 0, \
            f'resumed micro_step {micro0} is not aligned to the device-' \
            f'queue window {window}; train with a window that divides ' \
            'the checkpoint cadence or disable the device queue'
        from ..data.device_queue import prefetch_windows
        stream = prefetch_windows(iter(loader), make_device_batch,
                                  window=window, depth=prefetch_depth,
                                  place_fn=place_window,
                                  quantize_ts=wire_timestamps == 'u16',
                                  pool_events=wire_events == 'pooled',
                                  data_wire=wire_data)
        timers('batch_construction').start()
        done = False
        for host_batches, device_window, n_valid, skipped in stream:
            timers('batch_construction').stop()
            for host_batch in skipped:
                report_skip(host_batch)
            remaining = num_steps * accumulation_steps - global_step
            first_opt = global_step // accumulation_steps
            # fused fast path: the whole window in one dispatch — only
            # when the window covers whole optimizer boundaries and no
            # hook must fire mid-window (exact cadence parity)
            if (train_step_fused is not None and n_valid == window
                    and remaining >= window
                    and window % accumulation_steps == 0
                    and global_step % accumulation_steps == 0
                    and not hook_inside(first_opt,
                                        window // accumulation_steps - 1)):
                run_fused(host_batches, device_window)
            else:
                for i in range(n_valid):
                    if global_step == num_steps * accumulation_steps:
                        done = True
                        break
                    run_step(host_batches[i], device_window)
            if done:
                break
            timers('batch_construction').start()
        else:
            timers('batch_construction').stop()
        flush_metrics()
        return state, samples_passed

    if prefetch_depth > 0:
        stream = prefetch_to_device(iter(loader), make_device_batch,
                                    depth=prefetch_depth)
    else:
        def _sync_stream():
            for host_batch in loader:
                try:
                    yield host_batch, make_device_batch(host_batch)
                except OverflowError:
                    yield host_batch, None
        stream = _sync_stream()

    timers('batch_construction').start()
    for batch, device_batch in stream:
        if global_step == num_steps * accumulation_steps:
            break
        if device_batch is None:
            # oversized batch (reference circuit breaker,
            # utils/training.py:141-150) or per-shard imbalance overflow
            report_skip(batch)
            continue
        timers('batch_construction').stop()
        run_step(batch, device_batch)
        timers('batch_construction').start()
    timers('batch_construction').stop()
    flush_metrics()
    return state, samples_passed


def _emit_validation(logger, tags, samples_passed, n, loss_sum, smooth_sum,
                     photo_sum, out_reg_sum):
    n = max(n, 1)
    logger.add_scalar('General/Validation loss', loss_sum / n,
                      samples_passed)
    for tag, s, p, o in zip(tags, smooth_sum, photo_sum, out_reg_sum):
        logger.add_scalar(f'Validation/smoothness loss/{tag}', s / n,
                          samples_passed)
        logger.add_scalar(f'Validation/photometric loss/{tag}', p / n,
                          samples_passed)
        logger.add_scalar(f'Validation/out regularization loss/{tag}',
                          o / n, samples_passed)
    return loss_sum / n


def validate(eval_step, params, loader, samples_passed, logger, tags,
             is_raw=True, event_capacity=2 ** 18, sequence_length=None,
             prepare_batch=None):
    """Validation pass (reference utils/training.py:244-271).

    ``prepare_batch(collated, capacity) -> device batch`` overrides the
    default single-device padding — a mesh run passes its training-side
    split+shard preparation so validation runs sharded at mesh speed
    (parallel.make_sharded_eval_step); it may raise ValueError to make a
    batch fall back to nothing (the batch is skipped, counted, logged).
    """
    n = 0
    n_dropped = 0
    photo_sum, smooth_sum, out_reg_sum = [], [], []
    loss_sum = 0.0
    pending = []  # device scalars; ONE batched fetch at the end
    for batch in loader:
        if batch_num_events(batch, is_raw) > event_capacity:
            continue
        if prepare_batch is not None:
            try:
                device_batch = prepare_batch(batch, event_capacity)
            except ValueError:
                n_dropped += 1
                continue
        else:
            device_batch = pad_batch(batch,
                                     capacity=event_capacity if is_raw
                                     else None,
                                     sequence_length=sequence_length)
        pending.append(eval_step(params, device_batch))
        n += 1
    if n_dropped:
        print(f'validate: dropped {n_dropped} batches the mesh split '
              'refused (indivisible remainder)')
    if pending:
        import jax
        for loss, (smoothness, photometric, out_reg) in \
                jax.device_get(pending):
            photo_sum = add_loss(photo_sum, photometric)
            smooth_sum = add_loss(smooth_sum, smoothness)
            out_reg_sum = add_loss(out_reg_sum, out_reg)
            loss_sum += float(loss)
    return _emit_validation(logger, tags, samples_passed, n, loss_sum,
                            smooth_sum, photo_sum, out_reg_sum)


def validate_windowed(fused_eval_step, params, loader, samples_passed,
                      logger, tags, window, is_raw=True,
                      event_capacity=2 ** 18, sequence_length=None,
                      prefetch_depth: int = 2):
    """Validation through the device queue: K batches per upload+dispatch.

    ``validate`` pads and dispatches per batch, so every batch pays a
    dispatch plus the fresh-input-buffer first-use penalty the device
    queue exists to amortize in training (data/device_queue.py).  This
    variant stages windows of K padded batches in one upload and scans
    the loss over them in one dispatch (state.make_fused_eval_step) —
    identical scalars (same loss on the same padded batches, summed in
    the same order), K× fewer host↔device round trips.  Reference
    analogue: the per-batch loop utils/training.py:244-271.
    """
    from ..data.device_queue import prefetch_windows

    def prepare(host_batch):
        if batch_num_events(host_batch, is_raw) > event_capacity:
            raise OverflowError('oversized validation batch')
        return pad_batch(host_batch, capacity=event_capacity if is_raw
                         else None, sequence_length=sequence_length)

    def runs_of_equal_size(batches):
        # stack_batches requires one static batch size per window; a
        # finite validation stream may end with a smaller remainder
        # batch, so cut the stream into runs of equal size (<= 2 runs
        # in practice: the full-size run and the remainder)
        run = []
        for b in batches:
            if run and b['size'] != run[0]['size']:
                yield run
                run = []
            run.append(b)
        if run:
            yield run

    n = 0
    photo_sum, smooth_sum, out_reg_sum = [], [], []
    loss_sum = 0.0
    pending = []  # (device (loss[K], terms[K]), n_valid); ONE fetch at end
    for run in runs_of_equal_size(loader):
        for _hosts, device_window, n_valid, _skipped in prefetch_windows(
                iter(run), prepare, window=window, depth=prefetch_depth):
            pending.append((fused_eval_step(params, device_window),
                            n_valid))
            n += n_valid
    if pending:
        import jax
        for (loss_k, (smooth_k, photo_k, out_k)), n_valid in \
                jax.device_get(pending):
            for i in range(n_valid):
                photo_sum = add_loss(photo_sum, [p[i] for p in photo_k])
                smooth_sum = add_loss(smooth_sum, [s[i] for s in smooth_k])
                out_reg_sum = add_loss(out_reg_sum, [o[i] for o in out_k])
                loss_sum += float(loss_k[i])
    return _emit_validation(logger, tags, samples_passed, n, loss_sum,
                            smooth_sum, photo_sum, out_reg_sum)
