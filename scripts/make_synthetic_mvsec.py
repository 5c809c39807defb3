#!/usr/bin/env python3
"""Generate a synthetic MVSEC-format dataset with exact ground-truth flow.

Real MVSEC raw data is not obtainable in this environment, so the accuracy
leg of the benchmark runs on a simulated DVS recording that uses the SAME
on-disk format and the SAME processing chain as real MVSEC
(sequence2samples -> prepare_batches -> train_flownet -> test.py):

- a large smooth random texture is observed through a translating
  260x346 camera window (integer positions, so GT flow is exact);
- events fire per sensor pixel whenever the log-intensity change since the
  pixel's last event crosses a threshold — fine-time-step brightness-change
  simulation, so events cluster on moving edges exactly like a real DVS
  (uniform-random events carry no motion information and make the
  self-supervised task unlearnable);
- outputs per sequence: ``raw/<ds>/<family>/<seq>_data.hdf5`` with
  ``davis/left/{events,image_raw,image_raw_ts,image_raw_event_inds}``, a
  ``raw/<ds>/FlowGT/<family>/<seq>_gt_flow_dist.npz`` ground-truth archive
  (``timestamps, x_flow_dist, y_flow_dist``), and ``info/<ds>.hdf5``
  sequence start times.

Usage:
    python scripts/make_synthetic_mvsec.py <out_root> [--train-secs 60]
        [--eval-secs 12]

Then:
    DVS_DATA_ROOT=<out_root> python scripts/sequence2samples.py \
        experiments/synth_train_datasets.yml
"""
import argparse
import sys
from pathlib import Path

import h5py
import numpy as np

H, W = 260, 346
FRAME_DT = 0.05          # 20 fps, like MVSEC GT cadence
FINE_STEPS = 10          # event-simulation sub-steps per frame
THRESHOLD = 0.18         # DVS contrast threshold (log-intensity units)
EPOCH_BASE = 1000.0      # fake epoch offset (exercises info alignment)


def make_scene(rng, shape=(720, 1024), num_blobs=260):
    """Smooth random log-intensity texture with strong local gradients."""
    img = np.zeros(shape, np.float64)
    ys, xs = np.mgrid[0:shape[0], 0:shape[1]]
    for _ in range(num_blobs):
        cy, cx = rng.uniform(0, shape[0]), rng.uniform(0, shape[1])
        sigma = rng.uniform(4, 30)
        amp = rng.uniform(30, 140) * rng.choice([-1, 1])
        img += amp * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2)
                            / (2 * sigma ** 2))
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-6)
    return img


def camera_path(t, scene_shape, seed_phase=0.0, speed=1.0):
    """Integer camera-window position at time(s) t (sinusoidal drift).

    ``speed`` scales the drift amplitudes: 1.0 gives ~9 px/frame peak
    motion (the hard round-2 setting); ~0.35 gives MVSEC-outdoor-like
    1-5 px/frame (the round-3 accuracy protocol, VERDICT item 5).
    """
    cy = (scene_shape[0] - H) / 2
    cx = (scene_shape[1] - W) / 2
    ay, ax_ = (cy - 8) * speed, (cx - 8) * speed
    py = cy + ay * np.sin(2 * np.pi * t / 7.3 + seed_phase + 0.4)
    px = cx + ax_ * np.sin(2 * np.pi * t / 11.7 + seed_phase)
    return np.rint(py).astype(int), np.rint(px).astype(int)


def window(scene, py, px):
    return scene[py:py + H, px:px + W]


def simulate_sequence(rng, duration, seed_phase, speed=1.0):
    """Simulate one sequence; returns (events, frames, frame_ts, gt)."""
    scene = make_scene(rng)
    log_scene = np.log1p(scene)
    n_frames = int(round(duration / FRAME_DT)) + 1
    frame_ts = EPOCH_BASE + np.arange(n_frames) * FRAME_DT

    fine_t = EPOCH_BASE + np.arange((n_frames - 1) * FINE_STEPS + 1) \
        * (FRAME_DT / FINE_STEPS)
    pys, pxs = camera_path(fine_t - EPOCH_BASE, scene.shape, seed_phase,
                           speed)

    frames = np.stack([
        window(scene, pys[i * FINE_STEPS], pxs[i * FINE_STEPS])
        for i in range(n_frames)]).astype(np.uint8)

    # --- event generation: per-pixel log-intensity reference crossing ----
    ref = window(log_scene, pys[0], pxs[0]).copy()
    ev_x, ev_y, ev_t, ev_p = [], [], [], []
    for k in range(1, fine_t.size):
        cur = window(log_scene, pys[k], pxs[k])
        delta = cur - ref
        n_ev = np.floor(np.abs(delta) / THRESHOLD).astype(np.int32)
        np.minimum(n_ev, 3, out=n_ev)  # refractory cap
        yy, xx = np.nonzero(n_ev)
        if yy.size:
            counts = n_ev[yy, xx]
            pol = np.sign(delta[yy, xx])
            x_rep = np.repeat(xx, counts)
            y_rep = np.repeat(yy, counts)
            p_rep = np.repeat(pol, counts)
            t_rep = rng.uniform(fine_t[k - 1], fine_t[k],
                                size=x_rep.size)
            ev_x.append(x_rep)
            ev_y.append(y_rep)
            ev_t.append(t_rep)
            ev_p.append(p_rep)
            # the pixel's reference jumps by the emitted thresholds
            ref[yy, xx] += np.sign(delta[yy, xx]) * counts * THRESHOLD
    x = np.concatenate(ev_x).astype(np.float64)
    y = np.concatenate(ev_y).astype(np.float64)
    t = np.concatenate(ev_t)
    p = np.concatenate(ev_p).astype(np.float64)
    order = np.argsort(t, kind='stable')
    events = np.stack([x[order], y[order], t[order], p[order]], axis=1)

    # --- exact GT flow between consecutive frames ------------------------
    # camera moves by dp; image content shifts by -dp
    f_py = pys[::FINE_STEPS]
    f_px = pxs[::FINE_STEPS]
    gt_u = -(np.diff(f_px)).astype(np.float32)      # x displacement
    gt_v = -(np.diff(f_py)).astype(np.float32)
    gt = {
        'timestamps': frame_ts,
        'x_flow_dist': np.broadcast_to(
            gt_u[:, None, None], (gt_u.size, H, W)).astype(np.float32),
        'y_flow_dist': np.broadcast_to(
            gt_v[:, None, None], (gt_v.size, H, W)).astype(np.float32),
    }
    return events, frames, frame_ts, gt


def write_sequence(root, ds_name, seq_name, events, frames, frame_ts, gt):
    family = seq_name[:-1]
    seq_dir = root / 'raw' / ds_name / family
    gt_dir = root / 'raw' / ds_name / 'FlowGT' / family
    seq_dir.mkdir(parents=True, exist_ok=True)
    gt_dir.mkdir(parents=True, exist_ok=True)

    inds = np.searchsorted(events[:, 2], frame_ts, side='right') - 1
    with h5py.File(seq_dir / f'{seq_name}_data.hdf5', 'w') as f:
        left = f.create_group('davis').create_group('left')
        left.create_dataset('events', data=events, compression='gzip')
        left.create_dataset('image_raw', data=frames, compression='gzip')
        left.create_dataset('image_raw_ts', data=frame_ts)
        left.create_dataset('image_raw_event_inds',
                            data=inds.astype(np.int64))
    np.savez(gt_dir / f'{seq_name}_gt_flow_dist.npz', **gt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('out_root', type=Path)
    ap.add_argument('--train-secs', type=float, default=60.0)
    ap.add_argument('--eval-secs', type=float, default=12.0)
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--speed', type=float, default=1.0,
                    help='camera drift amplitude scale (~0.35 gives '
                         'MVSEC-like 1-5 px/frame motion)')
    args = ap.parse_args()

    ds_name = 'synth'
    specs = [('outdoor_synth2', args.train_secs, 0.0),     # train split
             ('outdoor_synth1', args.eval_secs, 2.1)]      # eval split
    names, starts = [], []
    for seq_name, secs, phase in specs:
        rng = np.random.default_rng(args.seed + len(names))
        events, frames, frame_ts, gt = simulate_sequence(rng, secs, phase,
                                                          args.speed)
        write_sequence(args.out_root, ds_name, seq_name, events, frames,
                       frame_ts, gt)
        names.append(seq_name)
        starts.append(frame_ts[0])
        rate = events.shape[0] / secs
        print(f'{seq_name}: {events.shape[0]} events ({rate / 1e3:.0f} '
              f'kev/s), {frames.shape[0]} frames, {secs:.0f}s')

    info_dir = args.out_root / 'info'
    info_dir.mkdir(parents=True, exist_ok=True)
    with h5py.File(info_dir / f'{ds_name}.hdf5', 'w') as f:
        f.create_dataset('set_name',
                         data=np.array([n.encode() for n in names]))
        f.create_dataset('start_time', data=np.array(starts))
    print(f'wrote {args.out_root}')


if __name__ == '__main__':
    main()
