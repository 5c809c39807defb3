"""dvs_of_training_framework_tpu — TPU-native self-supervised event-camera
optical-flow training framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the PyTorch
reference framework e-sha/dvs_of_training_framework (see SURVEY.md):

- ragged DVS event batches → fixed-capacity padded event buffers (TPU-friendly)
- self-supervised multi-scale photometric/smoothness/out-of-border loss
- pluggable model packages loaded by path (net.Model / OpticalFlow contract)
- jitted training step with gradient accumulation, checkpoint/resume,
  periodic hooks, TensorBoard-compatible logging
- offline preprocessing (sample slicing, batch encoding, quantization)
- MVSEC AEE evaluation harness
- SPMD scale-out over a jax.sharding.Mesh (data + event axes)
"""

__version__ = "0.1.0"
