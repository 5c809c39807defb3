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
    return lambda step, *args: (None if step % interval
                                else hook(step, *args))


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
          sequence_length=None):
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
    loss_sum = 0.0
    smooth_sum, photo_sum, out_reg_sum = [], [], []
    pending = []  # device-side (loss, terms) awaiting boundary readback
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
            num_skipped += 1
            num_events = batch_num_events(batch, is_raw)
            num_processed = global_step - init_batch
            print(f'Skipping batch with {num_events} events')
            if num_events > capacity:
                print('Augmentation parameters '
                      f'{batch["augmentation_params"]}')
            rate = num_processed / max(num_processed + num_skipped, 1)
            print(f'Processing rate is {rate:.2f}')
            continue
        global_step += 1
        timers('batch_construction').stop()
        samples_passed += batch['size']
        if throughput is not None:
            throughput.batch_size = batch['size']
            throughput.start()
        timers('train_step').start()
        state, (loss, terms) = train_step(state, device_batch)
        timers('train_step').stop()
        if throughput is not None:
            throughput.stop()

        is_step_boundary = global_step % accumulation_steps == 0

        timers('logging').start()
        # keep device scalars; only materialise at the step boundary so the
        # dispatch pipeline never blocks on metric readback
        pending.append((loss, terms))

        if is_step_boundary:
            for p_loss, p_terms in pending:
                smoothness, photometric, out_reg = p_terms
                photo_sum = add_loss(photo_sum, photometric)
                smooth_sum = add_loss(smooth_sum, smoothness)
                out_reg_sum = add_loss(out_reg_sum, out_reg)
                loss_sum += float(p_loss)
            pending = []
            for tag, s, p, o in zip(tags, smooth_sum, photo_sum,
                                    out_reg_sum):
                logger.add_scalar(f'Train/photometric loss/{tag}',
                                  p / accumulation_steps, samples_passed)
                logger.add_scalar(f'Train/smoothness loss/{tag}',
                                  s / accumulation_steps, samples_passed)
                logger.add_scalar(f'Train/out regularization/{tag}',
                                  o / accumulation_steps, samples_passed)
            logger.add_scalar('General/Train loss', loss_sum,
                              samples_passed)
            step = global_step // accumulation_steps
            if lr_fn is not None:
                for i, lr in enumerate(lr_fn(step)):
                    logger.add_scalar(f'General/learning rate/{i}', lr,
                                      samples_passed)
            loss_sum = 0.0
            smooth_sum, photo_sum, out_reg_sum = [], [], []
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
        timers('batch_construction').start()
    timers('batch_construction').stop()
    return state, samples_passed


def validate(eval_step, params, loader, samples_passed, logger, tags,
             is_raw=True, event_capacity=2 ** 18, sequence_length=None):
    """Validation pass (reference utils/training.py:244-271)."""
    n = 0
    photo_sum, smooth_sum, out_reg_sum = [], [], []
    loss_sum = 0.0
    for batch in loader:
        if batch_num_events(batch, is_raw) > event_capacity:
            continue
        device_batch = pad_batch(batch, capacity=event_capacity if is_raw
                                 else None,
                                 sequence_length=sequence_length)
        loss, (smoothness, photometric, out_reg) = eval_step(params,
                                                             device_batch)
        photo_sum = add_loss(photo_sum, photometric)
        smooth_sum = add_loss(smooth_sum, smoothness)
        out_reg_sum = add_loss(out_reg_sum, out_reg)
        loss_sum += float(loss)
        n += 1
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
