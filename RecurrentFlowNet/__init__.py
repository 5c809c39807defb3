from dvs_of_training_framework_tpu.models.optical_flow import BaseOpticalFlow

from .net import Model, compute_event_image  # noqa: F401


class OpticalFlow(BaseOpticalFlow):
    """Inference wrapper for the RecurrentFlowNet plugin."""

    def __init__(self, imsize, model=None, activation='relu',
                 event_representation_depth=9, max_sequence_length=1,
                 **kwargs):
        # inference windows carry one element each; the recurrence
        # degenerates to a single ConvGRU step (training uses longer
        # sequences via max_sequence_length)
        super().__init__(
            imsize, Model, model=model, activation=activation,
            event_representation_depth=event_representation_depth,
            max_sequence_length=max_sequence_length, **kwargs)
