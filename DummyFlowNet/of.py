"""Inference wrapper for the DummyFlowNet plugin."""
from dvs_of_training_framework_tpu.models.optical_flow import BaseOpticalFlow

from .net import Model


class OpticalFlow(BaseOpticalFlow):
    def __init__(self, imsize, model=None, activation='relu', **kwargs):
        super().__init__(imsize, Model, model=model, activation=activation,
                         **kwargs)
