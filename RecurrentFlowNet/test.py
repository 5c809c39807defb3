"""Qualitative flow rendering entry for the plugin contract."""
from dvs_of_training_framework_tpu.utils.visualization import flow2img


def vis_flow(flow):
    """HSV-render a [H, W, 2] flow field to a BGR uint8 image."""
    return flow2img(flow[..., 0], flow[..., 1])
