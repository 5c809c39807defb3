"""EVFlowNet — flagship TPU model plugin.

Capability target: the reference's default EV_FlowNet plugin (an
encoder-decoder flow network over a learnable event representation, split
into ``quantization_layer`` + ``predictor`` submodules for two-group
optimization with delayed representation learning, reference
train_flownet.py:50-54, 78-109, and offline ``quantize`` export, reference
scripts/quantize_preprocessed.py:87-91).

TPU-first design decisions:

- events arrive as a fixed-capacity padded ``EventBuffer``; the voxelization
  is a single fused scatter-add over ``B*L*C*H*W`` bins (XLA scatter; padding
  events carry an out-of-range sample index and are dropped by the scatter's
  ``mode='drop'``),
- the temporal kernel is a small learnable MLP applied per (event, channel)
  — the "event spike tensor" style learnable representation — vectorised as
  dense ``[N*C, 1] x [1, K]`` matmuls,
- the predictor UNet runs NHWC (TPU-native conv layout) with
  nearest-upsample + conv decoding and 4 flow heads at scales
  ``imsize / 2^i`` for i = 3..0.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dvs_of_training_framework_tpu.ops import segment_starts


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def get_activation(name):
    if callable(name):
        return name
    return {'relu': jax.nn.relu, 'mish': mish}[name]


def upsample2x_nearest(x):
    """2x nearest-neighbour upsample via reshape-broadcast (NHWC).

    Bit-identical to ``jax.image.resize(..., method='nearest')`` at an
    exact 2x factor (out pixel i reads in pixel i // 2), but lowers to a
    broadcast whose transpose is a cheap tiled reduce — whereas resize
    lowers to a gather whose transpose is a scatter-add, the slow
    irregular-memory path on TPU (pinned by
    tests/training/test_models.py::test_upsample2x_matches_resize).
    """
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class DenseParams(nn.Module):
    """Parameter container matching ``nn.Dense``'s tree and init exactly.

    The kernel-MLP needs its raw weight arrays (the Pallas path computes
    the whole MLP in one kernel, ops/kernel_mlp_pallas.py), so the three
    Dense layers hold parameters here and the matmuls live in the caller.
    Names, shapes and initialisers reproduce ``nn.Dense`` bit-for-bit, so
    existing checkpoints keep loading.
    """
    features_in: int
    features_out: int
    kernel_init: object = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', self.kernel_init,
                            (self.features_in, self.features_out),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features_out,), jnp.float32)
        return kernel, bias


class QuantizationLayer(nn.Module):
    """Learnable event -> voxel-grid representation.

    Produces a ``[B, H, W, L*C]`` grid (NHWC): for each of the ``L`` elements
    of a sample, ``C = depth`` temporal channels.  Each event contributes
    ``kernel(t_norm - c/(C-1)) * polarity`` to channel ``c`` at its pixel,
    where ``t_norm`` normalises the event time into its element's frame
    window.  ``kernel`` is an MLP initialised near the triangular (bilinear)
    kernel, so training starts from the classic voxel grid.
    """
    depth: int = 9
    hidden: int = 30
    dtype: jnp.dtype = jnp.float32
    # 'auto' (pallas on TPU, scatter elsewhere) | 'scatter' | 'matmul'
    # | 'pallas'
    scatter_method: str = 'auto'
    # per-event MLP backend: 'auto' (Pallas on TPU: the 4-group
    # block-diagonal kernel runs the whole MLP in 0.55 ms/step vs the
    # XLA form's ~4 ms of [E*C, hidden] HBM traffic — see
    # scripts/benchmarks/ab_kernel_mlp.py and PERFORMANCE.md round 3),
    # 'xla', 'pallas', 'interpret'
    kernel_mlp: str = 'auto'

    @nn.compact
    def __call__(self, events, timestamps, sample_idx, imsize,
                 num_elements: int, batch_size: int):
        H, W = imsize
        C = self.depth
        L = num_elements
        E = events.capacity

        # --- element time windows -------------------------------------
        starts = segment_starts(sample_idx, batch_size)      # [B]
        valid = events.sample_index < batch_size             # padding mask
        safe_sample = jnp.clip(events.sample_index, 0, batch_size - 1)
        safe_elem = jnp.clip(events.element_index, 0, L - 1)
        ts_base = starts[safe_sample] + safe_elem
        t0 = timestamps[ts_base]
        t1 = timestamps[ts_base + 1]
        denom = jnp.maximum(t1 - t0, 1e-9)
        t_norm = jnp.clip((events.timestamp - t0) / denom, 0.0, 1.0)  # [E]

        # --- learnable temporal kernel --------------------------------
        # All per-(event, channel) tensors run CHANNEL-MAJOR [C, E]: with
        # the event axis on the lanes the TPU tile is fully used, whereas
        # [E, C=9] tensors in {1,0} layout pad 9 lanes to 128 (14x HBM
        # inflation — ~670 MB/step measured in the recipe HLO, round 3).
        # One transpose at the voxel-pack boundary restores [E, C].
        centers = jnp.arange(C, dtype=jnp.float32) / max(C - 1, 1)
        delta = t_norm[None, :] - centers[:, None]            # [C, E]
        w1, b1 = DenseParams(1, self.hidden, name='kernel_hidden1')()
        w2, b2 = DenseParams(self.hidden, self.hidden,
                             name='kernel_hidden2')()
        w3, b3 = DenseParams(
            self.hidden, 1, name='kernel_out',
            kernel_init=nn.initializers.normal(1e-2))()
        method = self.kernel_mlp
        if method == 'auto':
            on_tpu = jax.default_backend() not in ('cpu', 'gpu')
            # the Pallas kernel packs the hidden axis into 32-sublane
            # groups; larger hidden sizes fall back to the XLA path
            method = 'pallas' if on_tpu and self.hidden <= 32 else 'xla'
        if method in ('pallas', 'interpret'):
            # one VMEM-resident kernel for the whole MLP: the XLA form's
            # [E*C, hidden] activations are pure HBM traffic — 4.4 ms of
            # the 19.9 ms recipe step (scripts/benchmarks/ab_mlp_cost.py)
            from dvs_of_training_framework_tpu.ops.kernel_mlp_pallas \
                import kernel_mlp_pallas
            k_out = kernel_mlp_pallas(delta, w1, b1, w2, b2, w3, b3,
                                      512, method == 'interpret')
            k_out = k_out.astype(self.dtype)
        else:
            # plain XLA path: identical math/promotion to the previous
            # nn.Dense stack (the CPU/test path)
            k_in = delta.reshape(-1, 1).astype(self.dtype)
            h = jnp.tanh(k_in @ w1.astype(self.dtype)
                         + b1.astype(self.dtype))
            h = jnp.tanh(h @ w2.astype(self.dtype)
                         + b2.astype(self.dtype))
            k_out = (h @ w3.astype(self.dtype)
                     + b3.astype(self.dtype)).reshape(C, E)
        # residual triangular kernel: max(0, 1 - |delta|*(C-1)) keeps the
        # init close to the classic voxel grid while staying learnable
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(delta) * max(C - 1, 1))
        weight = tri.astype(self.dtype) + k_out.reshape(C, E)

        value = weight * events.polarity[None, :].astype(self.dtype)
        value = jnp.where(valid[None, :], value, 0.0)
        value = value.T                                       # [E, C]

        # --- voxel binning (auto | scatter | matmul | pallas) ----------
        # 'auto' selects the Pallas kernel on TPU (17% faster end-to-end,
        # PERFORMANCE.md) and the XLA scatter elsewhere.
        from dvs_of_training_framework_tpu.ops.voxel import (
            voxelize_matmul, voxelize_scatter)
        plane = safe_sample * L + safe_elem
        method = self.scatter_method
        if method == 'auto':
            on_tpu = jax.default_backend() not in ('cpu', 'gpu')
            method = 'pallas' if on_tpu else 'scatter'
        if method == 'pallas':
            from dvs_of_training_framework_tpu.ops.voxel_pallas import \
                voxelize_pallas
            grid = voxelize_pallas(events.x, events.y, plane, value, valid,
                                   batch_size * L, H, W)
        else:
            voxelize = (voxelize_matmul if method == 'matmul'
                        else voxelize_scatter)
            grid = voxelize(events.x, events.y, plane, value, valid,
                            num_planes=batch_size * L, height=H, width=W)
        grid = grid.reshape(batch_size, L, H, W, C).astype(self.dtype)
        # [B, H, W, L*C]
        grid = grid.transpose(0, 2, 3, 1, 4).reshape(batch_size, H, W, L * C)
        return grid


class ResBlock(nn.Module):
    channels: int
    act: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(x)
        h = self.act(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        return self.act(x + h)


class Predictor(nn.Module):
    """Conv encoder-decoder with 4-scale flow heads (NHWC).

    ``split_decoder``: route the 2-channel upsampled-flow input of each
    decoder stage through its own (bias-free) conv summed into the main
    conv's output instead of concatenating it.  ``conv(concat(a, f))``
    equals ``conv_a(a) + conv_f(f)`` with the kernel split along input
    channels, so the function and parameter count are unchanged (float
    summation order aside) — but the concat widths drop from 386/194/66
    to 384/192/64, multiples of the 128-lane TPU tile, removing the
    layout padding that inflates the decoder activations and dW
    reductions (PERFORMANCE.md, round-3 lever 3).  Off by default:
    checkpoints are not interchangeable across the two layouts.
    """
    base_channels: int = 64
    activation: str = 'relu'
    dtype: jnp.dtype = jnp.float32
    split_decoder: bool = False

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        b = self.base_channels
        skips = []
        # encoder: 4 strided convs
        for i, ch in enumerate((b, 2 * b, 4 * b, 8 * b)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        dtype=self.dtype, name=f'enc{i}')(x)
            x = act(x)
            skips.append(x)
        # 2 residual blocks at the bottleneck
        x = ResBlock(8 * b, act, self.dtype, name='res0')(x)
        x = ResBlock(8 * b, act, self.dtype, name='res1')(x)

        flows = []
        features = []
        flow = None
        dec_channels = (4 * b, 2 * b, b, b // 2)
        for i, ch in enumerate(dec_channels):
            x = upsample2x_nearest(x)
            parts = [x]
            skip_idx = 2 - i  # skips at 1/8, 1/4, 1/2 resolution
            if skip_idx >= 0:
                parts.append(skips[skip_idx])
            up_flow = None
            if flow is not None:
                up_flow = (upsample2x_nearest(flow) * 2.0).astype(self.dtype)
                if not self.split_decoder:
                    parts.append(up_flow)
            x = parts[0] if len(parts) == 1 else \
                jnp.concatenate(parts, axis=-1)
            in_ch = x.shape[-1]
            x = nn.Conv(ch, (3, 3), dtype=self.dtype, name=f'dec{i}')(x)
            if self.split_decoder and up_flow is not None:
                # init-match the fused layout: the flow slice of the fused
                # kernel is drawn at lecun std 1/sqrt((in_ch+2)*9), not the
                # standalone conv's 1/sqrt(2*9) — rescale so training from
                # scratch is init-equivalent across the two layouts
                # (function/params already identical; ADVICE round 3).
                flow_init = nn.initializers.variance_scaling(
                    2.0 / (in_ch + 2), 'fan_in', 'truncated_normal')
                x = x + nn.Conv(ch, (3, 3), use_bias=False,
                                kernel_init=flow_init,
                                dtype=self.dtype, name=f'dec{i}_flow')(up_flow)
            x = act(x)
            features.append(x)
            flow = nn.Conv(2, (1, 1), dtype=jnp.float32,
                           kernel_init=nn.initializers.normal(1e-3),
                           name=f'flow{i}')(x.astype(jnp.float32))
            flows.append(flow)
        return flows, features


class Model(nn.Module):
    """Flagship plugin model; see the plugin contract in models/loader.py."""
    prefix_length: int = 0
    suffix_length: int = 0
    max_sequence_length: int = 1
    dynamic_sample_length: bool = False
    event_representation_depth: int = 9
    activation: str = 'relu'
    base_channels: int = 64
    dtype: str = 'float32'
    scatter_method: str = 'auto'
    kernel_mlp: str = 'auto'
    split_decoder: bool = False

    def setup(self):
        dtype = jnp.dtype(self.dtype)
        self.quantization_layer = QuantizationLayer(
            depth=self.event_representation_depth, dtype=dtype,
            scatter_method=self.scatter_method,
            kernel_mlp=self.kernel_mlp)
        self.predictor = Predictor(base_channels=self.base_channels,
                                   activation=self.activation,
                                   dtype=dtype,
                                   split_decoder=self.split_decoder)

    def _batch_size(self, timestamps):
        num_timestamps = self.max_sequence_length + 1
        assert timestamps.shape[0] % num_timestamps == 0, \
            'timestamps must hold (sequence_length + 1) entries per sample'
        return timestamps.shape[0] // num_timestamps

    def quantize(self, events, timestamps, sample_idx, imsize):
        """Bake the learned representation into a dense [B, L*C, H, W]."""
        batch_size = self._batch_size(timestamps)
        grid = self.quantization_layer(events, timestamps, sample_idx,
                                       tuple(imsize),
                                       self.max_sequence_length, batch_size)
        return grid.transpose(0, 3, 1, 2).astype(jnp.float32)  # NCHW

    def __call__(self,
                 events,
                 timestamps: jnp.ndarray,
                 sample_idx: jnp.ndarray,
                 imsize: Tuple[int, int],
                 raw: bool = True,
                 intermediate: bool = False):
        imsize = tuple(imsize)
        batch_size = self._batch_size(timestamps)
        L = self.max_sequence_length

        if raw:
            grid = self.quantization_layer(events, timestamps, sample_idx,
                                           imsize, L, batch_size)
        else:
            # dense input [B, L*C, H, W] (quantized pipeline) -> NHWC
            grid = jnp.transpose(events, (0, 2, 3, 1))
            grid = grid.astype(jnp.dtype(self.dtype))

        flows_nhwc, features = self.predictor(grid)
        flows = tuple(jnp.transpose(f, (0, 3, 1, 2)) for f in flows_nhwc)

        starts = segment_starts(sample_idx, batch_size)
        flow_ts = jnp.stack(
            [timestamps[starts + self.prefix_length],
             timestamps[starts + self.prefix_length + 1]], axis=1)
        flow_sample_idx = jnp.arange(batch_size, dtype=jnp.int32)

        if intermediate:
            return flows, flow_ts, flow_sample_idx, tuple(features)
        return flows, flow_ts, flow_sample_idx


def compute_event_image(events, start_ts, stop_ts, shape, depth=9,
                        **_ignored):
    """Host-side event->image conversion for the --ev_images pipeline.

    NumPy analogue of the quantization layer with the fixed triangular
    kernel (the representation the learnable kernel is initialised to).

    Args:
        events: float32 ``[N, 5]`` rows ``(x, y, t, p, element_index)``.
        start_ts, stop_ts: per-element window bounds, each ``[L]``.
        shape: (H, W).
        depth: channels per element.

    Returns:
        float32 ``[L, depth, H, W]`` dense representation.
    """
    H, W = shape
    L = len(start_ts)
    C = depth
    out = np.zeros((L, C, H, W), np.float32)
    x = events[:, 0].astype(np.int64)
    y = events[:, 1].astype(np.int64)
    t = events[:, 2]
    p = events[:, 3]
    e = events[:, 4].astype(np.int64)
    start_ts = np.asarray(start_ts)
    stop_ts = np.asarray(stop_ts)
    denom = np.maximum(stop_ts[e] - start_ts[e], 1e-9)
    t_norm = np.clip((t - start_ts[e]) / denom, 0.0, 1.0)
    centers = np.arange(C, dtype=np.float32) / max(C - 1, 1)
    weight = np.maximum(0.0, 1.0 - np.abs(t_norm[:, None] - centers[None])
                        * max(C - 1, 1))
    values = weight * p[:, None]
    flat = (((e[:, None] * C + np.arange(C)[None]) * H + y[:, None]) * W
            + x[:, None])
    np.add.at(out.reshape(-1), flat.reshape(-1).astype(np.int64),
              values.reshape(-1))
    return out
