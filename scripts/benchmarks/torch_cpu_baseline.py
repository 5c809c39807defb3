#!/usr/bin/env python3
"""Torch-CPU baseline: the reference framework's architecture, measured.

The reference publishes no numbers (BASELINE.md), so the comparison
baseline is measured here: a faithful torch implementation of the same
workload — event->voxel scatter quantization, conv encoder-decoder with
4-scale flow heads, multi-scale photometric/smoothness/out-of-border loss,
Adam step — on the torch-CPU build that ships in this image (the reference's
own GPU images cannot run here).  Results are cached to
``bench_baseline_cpu.json`` so bench.py amortises the measurement.
"""
import json
import time
from pathlib import Path

import numpy as np

CACHE = Path(__file__).resolve().parent / 'bench_baseline_cpu.json'


def build_torch_model(depth, base, imsize):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class VoxelNet(nn.Module):
        def __init__(self):
            super().__init__()
            b = base
            self.enc = nn.ModuleList([
                nn.Conv2d(depth, b, 3, 2, 1),
                nn.Conv2d(b, 2 * b, 3, 2, 1),
                nn.Conv2d(2 * b, 4 * b, 3, 2, 1),
                nn.Conv2d(4 * b, 8 * b, 3, 2, 1)])
            self.res = nn.ModuleList([
                nn.Conv2d(8 * b, 8 * b, 3, 1, 1) for _ in range(4)])
            dec_in = [8 * b + 4 * b, 4 * b + 2 * b + 2, 2 * b + b + 2,
                      b + 2]
            dec_out = [4 * b, 2 * b, b, b // 2]
            self.dec = nn.ModuleList([
                nn.Conv2d(i, o, 3, 1, 1) for i, o in zip(dec_in, dec_out)])
            self.flow = nn.ModuleList([
                nn.Conv2d(o, 2, 1) for o in dec_out])

        def forward(self, x):
            skips = []
            for conv in self.enc:
                x = torch.relu(conv(x))
                skips.append(x)
            for i in range(0, 4, 2):
                h = torch.relu(self.res[i](x))
                x = torch.relu(x + self.res[i + 1](h))
            flows = []
            flow = None
            for i, (conv, head) in enumerate(zip(self.dec, self.flow)):
                x = F.interpolate(x, scale_factor=2, mode='nearest')
                parts = [x]
                if 2 - i >= 0:
                    parts.append(skips[2 - i])
                if flow is not None:
                    parts.append(F.interpolate(flow, scale_factor=2,
                                               mode='nearest') * 2)
                x = torch.relu(conv(torch.cat(parts, dim=1)))
                flow = head(x)
                flows.append(flow)
            return flows

    return VoxelNet()


def voxelize_torch(events, batch_size, depth, imsize):
    import torch
    H, W = imsize
    x, y, t, p, s = events
    t0 = t.min()
    t1 = t.max()
    t_norm = (t - t0) / max(float(t1 - t0), 1e-9)
    centers = torch.arange(depth, dtype=torch.float32) / max(depth - 1, 1)
    w = torch.clamp(1 - (t_norm[:, None] - centers[None]).abs()
                    * max(depth - 1, 1), min=0)
    vals = (w * p[:, None]).reshape(-1)
    flat = (((s[:, None] * depth
              + torch.arange(depth)[None]) * H + y[:, None]) * W
            + x[:, None]).reshape(-1)
    grid = torch.zeros(batch_size * depth * H * W)
    grid.scatter_add_(0, flat.long(), vals)
    return grid.reshape(batch_size, depth, H, W)


def loss_torch(flows, images_prev, images_next):
    import torch
    import torch.nn.functional as F
    total = 0
    imgs_p, imgs_n = images_prev, images_next
    for flow in flows:
        H, W = flow.shape[-2:]
        imgs_p = F.interpolate(imgs_p, size=(H, W), mode='bilinear',
                               align_corners=True)
        imgs_n = F.interpolate(imgs_n, size=(H, W), mode='bilinear',
                               align_corners=True)
        gy, gx = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                                torch.arange(W, dtype=torch.float32),
                                indexing='ij')
        warp = torch.stack([
            (gx[None] + flow[:, 0]) / ((W - 1) / 2) - 1,
            (gy[None] + flow[:, 1]) / ((H - 1) / 2) - 1], dim=-1)
        warped = F.grid_sample(imgs_n, warp, align_corners=True)
        photo = ((warped - imgs_p).pow(2) + 1e-6).pow(0.45).mean()
        smooth = sum(
            ((a - b).pow(2) + 1e-6).pow(0.45).mean()
            for a, b in [(flow[..., 1:], flow[..., :-1]),
                         (flow[..., 1:, :], flow[..., :-1, :]),
                         (flow[..., 1:, 1:], flow[..., :-1, :-1]),
                         (flow[..., :-1, 1:], flow[..., 1:, :-1])]) / 4
        mask = ((warp < -1) | (warp > 1)).any(dim=-1)
        out = (torch.where(mask[:, None], flow.pow(2) + 1e-6,
                           torch.ones_like(flow) * 1e-6)
               .pow(0.45) * mask[:, None]).mean()
        total = total + photo + 0.5 * smooth + out
    return total


def measure(batch_size=8, n_events=2 ** 17, depth=9, base=64,
            imsize=(256, 256), warmup=1, iters=3, threads=None):
    import torch
    if threads:
        torch.set_num_threads(threads)
    H, W = imsize
    g = torch.Generator().manual_seed(0)
    events = (
        torch.randint(0, W, (n_events,), generator=g).float(),
        torch.randint(0, H, (n_events,), generator=g).float(),
        torch.rand(n_events, generator=g) * 0.04,
        torch.where(torch.rand(n_events, generator=g) > 0.5, 1.0, -1.0),
        torch.randint(0, batch_size, (n_events,), generator=g).float(),
    )
    images_prev = torch.rand(batch_size, 1, H, W, generator=g) * 255
    images_next = torch.rand(batch_size, 1, H, W, generator=g) * 255
    model = build_torch_model(depth, base, imsize)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, amsgrad=True)

    def step():
        opt.zero_grad(set_to_none=True)
        grid = voxelize_torch(events, batch_size, depth, imsize)
        flows = model(grid)
        loss = loss_torch(flows, images_prev, images_next)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return {'batches_per_sec': 1.0 / dt,
            'samples_per_sec': batch_size / dt,
            'events_per_sec': n_events / dt,
            'step_time_sec': dt,
            'batch_size': batch_size,
            'n_events': n_events,
            'depth': depth,
            'base_channels': base,
            'imsize': list(imsize)}


def get_cached_baseline(**kwargs):
    if CACHE.is_file():
        return json.loads(CACHE.read_text())
    result = measure(**kwargs)
    CACHE.write_text(json.dumps(result, indent=1))
    return result


if __name__ == '__main__':
    print(json.dumps(get_cached_baseline(), indent=1))
