"""Torch implementation of the loss math, used as an independent oracle.

Implements the published objective (Charbonnier photometric via
grid_sample(align_corners=True), 4-direction smoothness, per-sample-
normalised out-of-border penalty) directly with torch ops, so the JAX loss
is validated against torch's kernel semantics rather than against itself.
"""
import torch
import torch.nn.functional as F


def charb(delta, alpha=0.45, eps=1e-3, denominator=None):
    if delta.numel() == 0:
        return torch.tensor(0.0)
    value = (delta.pow(2) + eps * eps).pow(alpha)
    if denominator is None:
        return value.mean()
    return (value / denominator).sum()


def loss_terms(prev_images, next_images, flow):
    """Return (smoothness, photometric, outborder) floats."""
    N, C, H, W = prev_images.shape
    gy, gx = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32),
                            indexing='ij')
    grid = torch.stack([gx, gy], dim=0)[None].expand(N, -1, -1, -1)
    warp = grid + flow
    warp = torch.stack([warp[:, 0] / ((W - 1) / 2.0) - 1,
                        warp[:, 1] / ((H - 1) / 2.0) - 1], dim=1)

    warped = F.grid_sample(next_images, warp.permute(0, 2, 3, 1),
                           mode='bilinear', padding_mode='zeros',
                           align_corners=True)
    photometric = charb(warped - prev_images)

    smoothness = (charb(flow[..., 1:] - flow[..., :-1])
                  + charb(flow[..., 1:, :] - flow[..., :-1, :])
                  + charb(flow[..., 1:, 1:] - flow[..., :-1, :-1])
                  + charb(flow[..., :-1, 1:] - flow[..., 1:, :-1])) / 4

    with torch.no_grad():
        mask = ((warp < -1) | (warp > 1)).sum(1) > 0
        denominators = mask.view(N, -1).sum(dim=1) * 2
        mask2 = mask.unsqueeze(1).expand(-1, 2, -1, -1)
        stop = torch.cumsum(denominators, dim=0)
        num_points = denominators.sum()
        idx = torch.searchsorted(stop, torch.arange(num_points), right=True)
        per_value_den = denominators[idx] * N
    values = flow[mask2]
    outborder = charb(values, denominator=per_value_den)
    return (float(smoothness), float(photometric), float(outborder))


def multi_scale_terms(flows, start_idx, stop_idx, images):
    """Chained-interpolation multi-scale evaluation (smallest scale first)."""
    out = []
    for flow in flows:
        shape = flow.shape[-2:]
        with torch.no_grad():
            images = F.interpolate(images, size=shape, mode='bilinear',
                                   align_corners=True)
        out.append(loss_terms(images[start_idx], images[stop_idx], flow))
    return tuple(zip(*out))
