"""Periodic training hooks: checkpointing + validation.

Reference: utils/hooks/serialization.py, utils/hooks/validation.py.
"""
import copy

from .train import validate


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
                 is_raw=True, event_capacity=2 ** 18, sequence_length=None):
        """
        Args:
            eval_step: jitted (params, batch) -> (loss, terms).
            get_params: callable returning current params.
            loader_factory: zero-arg callable producing a fresh finite
                validation loader.
            logger: SummaryWriter.
            tags: per-scale tags.
        """
        self.eval_step = eval_step
        self.get_params = get_params
        self.loader_factory = loader_factory
        self.logger = logger
        self.tags = copy.deepcopy(list(tags))
        self.is_raw = is_raw
        self.event_capacity = event_capacity
        self.sequence_length = sequence_length

    def __call__(self, steps: int, samples: int):
        validate(self.eval_step, self.get_params(), self.loader_factory(),
                 samples, self.logger, self.tags, is_raw=self.is_raw,
                 event_capacity=self.event_capacity,
                 sequence_length=self.sequence_length)
