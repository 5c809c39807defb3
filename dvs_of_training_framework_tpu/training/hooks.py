"""Periodic training hooks: checkpointing + validation.

Reference: utils/hooks/serialization.py, utils/hooks/validation.py.
"""
import copy

from .train import validate, validate_windowed


class SerializationHook:
    """Checkpoint model+optimizer and flush TensorBoard logs together, so
    metric history stays aligned with checkpoints across crashes."""

    def __init__(self, serializer, get_state, logger):
        """
        Args:
            serializer: Serializer instance.
            get_state: callable returning the current TrainState (the jitted
                loop owns the state; the hook pulls the freshest copy).
            logger: SummaryWriter whose buffer is flushed after saving.
        """
        self.serializer = serializer
        self.get_state = get_state
        self.logger = logger

    def __call__(self, steps: int, samples: int):
        state = self.get_state()
        self.serializer.checkpoint_model(
            state.params,
            state.opt_state,
            global_step=steps,
            samples_passed=samples)
        self.logger.flush()
        print(f'Flushed logs for step {steps} ({samples} passed)')


class ValidationHook:
    """Runs a validation pass over the validation loader."""

    def __init__(self, eval_step, get_params, loader_factory, logger, tags,
                 is_raw=True, event_capacity=2 ** 18, sequence_length=None,
                 fused_eval_step=None, window: int = 0,
                 prepare_batch=None):
        """
        Args:
            eval_step: jitted (params, batch) -> (loss, terms).
            get_params: callable returning current params.
            loader_factory: zero-arg callable producing a fresh finite
                validation loader.
            logger: SummaryWriter.
            tags: per-scale tags.
            fused_eval_step: optional windowed eval step
                (state.make_fused_eval_step); with ``window > 0`` the
                pass runs through the device queue — identical scalars,
                K× fewer dispatches (train.validate_windowed).
            prepare_batch: optional mesh-side batch preparation for a
                SHARDED eval_step (parallel.make_sharded_eval_step) —
                validation then runs at mesh speed instead of
                single-device on localized params.
        """
        self.prepare_batch = prepare_batch
        self.eval_step = eval_step
        self.get_params = get_params
        self.loader_factory = loader_factory
        self.logger = logger
        self.tags = copy.deepcopy(list(tags))
        self.is_raw = is_raw
        self.event_capacity = event_capacity
        self.sequence_length = sequence_length
        self.fused_eval_step = fused_eval_step
        self.window = window

    def __call__(self, steps: int, samples: int):
        if self.fused_eval_step is not None and self.window > 0:
            validate_windowed(self.fused_eval_step, self.get_params(),
                              self.loader_factory(), samples, self.logger,
                              self.tags, window=self.window,
                              is_raw=self.is_raw,
                              event_capacity=self.event_capacity,
                              sequence_length=self.sequence_length)
            return
        validate(self.eval_step, self.get_params(), self.loader_factory(),
                 samples, self.logger, self.tags, is_raw=self.is_raw,
                 event_capacity=self.event_capacity,
                 sequence_length=self.sequence_length,
                 prepare_batch=self.prepare_batch)
