#!/usr/bin/env python3
"""Generate a synthetic MVSEC-format dataset with exact ground-truth flow.

Real MVSEC raw data is not obtainable in this environment, so the accuracy
leg of the benchmark runs on a simulated DVS recording that uses the SAME
on-disk format and the SAME processing chain as real MVSEC
(sequence2samples -> prepare_batches -> train_flownet -> test.py):

- a large smooth random texture observed through a moving camera;
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

Two camera models (``--motion``):

- ``translate`` (rounds 2-3): the camera window translates by integer
  offsets — GT flow is exact but **globally constant per frame pair**
  (a per-frame 2-vector).  Kept for reproducibility of the earlier runs.
- ``varied`` (round 4): spatially-varying flow FIELDS with exact analytic
  GT.  The camera applies a time-varying similarity transform
  (translation + in-plane rotation + zoom) to a background texture plane
  plus a closer foreground layer (independent translation, doubled zoom
  response — depth parallax with occlusion boundaries).  GT flow at pixel
  p between frames i -> i+1 is closed-form: with the sensor->scene map
  A_t(z) = C + T(t) + m(t)(z - c), m = s e^{i theta} (complex similarity),
  flow(z) = c + (T_i - T_{i+1} + m_i (z - c)) / m_{i+1} - z, evaluated for
  the layer visible at p at frame i.  The resulting field varies by
  several px across the 256x256 eval crop and is discontinuous at
  foreground boundaries, so a constant per-frame 2-vector CANNOT fit it
  (see scripts/oracle_flow_baseline.py for that oracle's AEE).

Frames in ``varied`` mode are bilinear samples of the smooth textures;
events are threshold crossings of log1p of the SAME rendered intensity, so
events, frames and GT are mutually consistent (what the self-supervised
photometric loss assumes).

Usage:
    python scripts/make_synthetic_mvsec.py <out_root> [--train-secs 60]
        [--eval-secs 12] [--motion varied] [--speed 0.35]

Then:
    DVS_DATA_ROOT=<out_root> python scripts/sequence2samples.py \
        config/synth_train_datasets.yml
"""
import argparse
import sys
from pathlib import Path

import h5py
import numpy as np
from scipy.ndimage import map_coordinates

H, W = 260, 346
FRAME_DT = 0.05          # 20 fps, like MVSEC GT cadence
FINE_STEPS = 10          # event-simulation sub-steps per frame
THRESHOLD = 0.18         # DVS contrast threshold (log-intensity units)
EPOCH_BASE = 1000.0      # fake epoch offset (exercises info alignment)
SCENE = (720, 1024)


def make_scene(rng, shape=SCENE, num_blobs=260):
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


def make_foreground(rng, shape=SCENE, num_objects=28):
    """Textured opaque blobs (alpha mask) on a transparent plane."""
    tex = make_scene(rng, shape, num_blobs=200)
    alpha = np.zeros(shape, np.float64)
    ys, xs = np.mgrid[0:shape[0], 0:shape[1]]
    for _ in range(num_objects):
        cy = rng.uniform(0.15 * shape[0], 0.85 * shape[0])
        cx = rng.uniform(0.15 * shape[1], 0.85 * shape[1])
        ry = rng.uniform(14, 52)
        rx = rng.uniform(14, 52)
        # superellipse -> crisp but not axis-aligned-square boundaries
        d = (np.abs((ys - cy) / ry) ** 2.5
             + np.abs((xs - cx) / rx) ** 2.5)
        alpha[d <= 1.0] = 1.0
    return tex, alpha


# --------------------------------------------------------------------------
# round 2-3 model: integer-translation window (constant flow per pair)
# --------------------------------------------------------------------------

def camera_path(t, scene_shape, seed_phase=0.0, speed=1.0):
    """Integer camera-window position at time(s) t (sinusoidal drift).

    ``speed`` scales the drift amplitudes: 1.0 gives ~9 px/frame peak
    motion (the hard round-2 setting); ~0.35 gives MVSEC-outdoor-like
    1-5 px/frame (the round-3 accuracy protocol).
    """
    cy = (scene_shape[0] - H) / 2
    cx = (scene_shape[1] - W) / 2
    ay, ax_ = (cy - 8) * speed, (cx - 8) * speed
    py = cy + ay * np.sin(2 * np.pi * t / 7.3 + seed_phase + 0.4)
    px = cx + ax_ * np.sin(2 * np.pi * t / 11.7 + seed_phase)
    return np.rint(py).astype(int), np.rint(px).astype(int)


def window(scene, py, px):
    return scene[py:py + H, px:px + W]


def simulate_translate(rng, duration, seed_phase, speed=1.0):
    """Round 2-3 integer-translation simulation (constant GT per pair)."""
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

    ref = window(log_scene, pys[0], pxs[0]).copy()
    acc = _EventAccumulator(rng)
    for k in range(1, fine_t.size):
        cur = window(log_scene, pys[k], pxs[k])
        acc.step(ref, cur, fine_t[k - 1], fine_t[k])
    events = acc.finish()

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


# --------------------------------------------------------------------------
# round 4 model: similarity transform + depth parallax (flow FIELDS)
# --------------------------------------------------------------------------

class _EventAccumulator:
    """Per-pixel reference-crossing event generator (shared by both modes)."""

    def __init__(self, rng):
        self.rng = rng
        self.ev = []

    def step(self, ref, cur, t0, t1):
        """Emit events for the log-intensity move ref -> cur in (t0, t1].

        Mutates ``ref`` in place (the per-pixel reference level advances by
        the emitted threshold counts, like a real DVS pixel).
        """
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
            t_rep = self.rng.uniform(t0, t1, size=x_rep.size)
            self.ev.append((x_rep, y_rep, t_rep, p_rep))
            ref[yy, xx] += np.sign(delta[yy, xx]) * counts * THRESHOLD

    def finish(self):
        x = np.concatenate([e[0] for e in self.ev]).astype(np.float64)
        y = np.concatenate([e[1] for e in self.ev]).astype(np.float64)
        t = np.concatenate([e[2] for e in self.ev])
        p = np.concatenate([e[3] for e in self.ev]).astype(np.float64)
        order = np.argsort(t, kind='stable')
        return np.stack([x[order], y[order], t[order], p[order]], axis=1)


class _SimilarityPath:
    """Time-varying 2-D similarity transform sensor->scene, as complex maps.

    A_t(z) = C_scene + T(t) + m(t) * (z - c_sensor),   m = s * e^{i theta}
    with z = x + i y in sensor pixel coordinates.
    """

    def __init__(self, t_amp, t_periods, t_phases, rot_amp, rot_period,
                 rot_phase, zoom_amp, zoom_period, zoom_phase):
        self.t_amp = t_amp            # (ty_amp, tx_amp)
        self.t_periods = t_periods    # (py, px)
        self.t_phases = t_phases
        self.rot = (rot_amp, rot_period, rot_phase)
        self.zoom = (zoom_amp, zoom_period, zoom_phase)
        self.c_sensor = complex((W - 1) / 2, (H - 1) / 2)
        self.c_scene = complex((SCENE[1] - 1) / 2, (SCENE[0] - 1) / 2)

    def translation(self, t):
        ty = self.t_amp[0] * np.sin(2 * np.pi * t / self.t_periods[0]
                                    + self.t_phases[0])
        tx = self.t_amp[1] * np.sin(2 * np.pi * t / self.t_periods[1]
                                    + self.t_phases[1])
        return tx + 1j * ty

    def multiplier(self, t):
        amp, period, phase = self.rot
        theta = amp * np.sin(2 * np.pi * t / period + phase)
        zamp, zperiod, zphase = self.zoom
        log_s = zamp * np.sin(2 * np.pi * t / zperiod + zphase)
        return np.exp(log_s) * np.exp(1j * theta)

    def scene_coords(self, t, grid_z):
        """Sensor grid -> scene (row, col) float coords at time t."""
        zc = (self.c_scene + self.translation(t)
              + self.multiplier(t) * (grid_z - self.c_sensor))
        return zc.imag, zc.real   # (rows, cols)

    def flow(self, t0, t1, grid_z):
        """Exact displacement field t0 -> t1 at sensor pixels ``grid_z``."""
        m0, m1 = self.multiplier(t0), self.multiplier(t1)
        d = (self.translation(t0) - self.translation(t1)
             + m0 * (grid_z - self.c_sensor))
        z1 = self.c_sensor + d / m1
        f = z1 - grid_z
        return f.real.astype(np.float32), f.imag.astype(np.float32)


def _sensor_grid():
    ys, xs = np.mgrid[0:H, 0:W]
    return xs + 1j * ys


def _sample(plane, rows, cols):
    return map_coordinates(plane, [rows, cols], order=1, mode='nearest')


def simulate_varied(rng, duration, seed_phase, speed=1.0):
    """Similarity-camera + parallax simulation with exact flow-field GT.

    ``speed`` scales translation amplitude like the translate mode; the
    rotation/zoom amplitudes are fixed (chosen for 1-3 px of cross-frame
    flow variation across the 256x256 eval crop at 20 fps).
    """
    bg = make_scene(rng)
    fg_tex, fg_alpha = make_foreground(rng)
    grid_z = _sensor_grid()

    bg_path = _SimilarityPath(
        t_amp=(220 * speed, 330 * speed), t_periods=(7.3, 11.7),
        t_phases=(seed_phase + 0.4, seed_phase),
        rot_amp=0.35, rot_period=7.9, rot_phase=seed_phase + 1.3,
        zoom_amp=0.12, zoom_period=5.3, zoom_phase=seed_phase + 2.6)
    # closer layer: independent drift (-> relative motion at occlusions),
    # the SAME roll (in-plane rotation is depth-independent), doubled zoom
    # response (forward motion scales with inverse depth)
    fg_path = _SimilarityPath(
        t_amp=(300 * speed, 430 * speed), t_periods=(6.1, 9.4),
        t_phases=(seed_phase + 3.1, seed_phase + 1.7),
        rot_amp=0.35, rot_period=7.9, rot_phase=seed_phase + 1.3,
        zoom_amp=0.24, zoom_period=5.3, zoom_phase=seed_phase + 2.6)

    def render(t):
        """Composite intensity + foreground visibility at time t."""
        br, bc = bg_path.scene_coords(t, grid_z)
        fr, fc = fg_path.scene_coords(t, grid_z)
        bg_val = _sample(bg, br, bc)
        fg_val = _sample(fg_tex, fr, fc)
        vis = _sample(fg_alpha, fr, fc) > 0.5
        return np.where(vis, fg_val, bg_val), vis

    n_frames = int(round(duration / FRAME_DT)) + 1
    frame_ts = EPOCH_BASE + np.arange(n_frames) * FRAME_DT
    fine_dt = FRAME_DT / FINE_STEPS
    n_fine = (n_frames - 1) * FINE_STEPS + 1

    frames = np.empty((n_frames, H, W), np.uint8)
    fg_vis = np.empty((n_frames, H, W), bool)

    img0, vis0 = render(0.0)
    frames[0] = np.clip(img0, 0, 255).astype(np.uint8)
    fg_vis[0] = vis0
    ref = np.log1p(np.maximum(img0, 0.0))
    acc = _EventAccumulator(rng)
    for k in range(1, n_fine):
        t = k * fine_dt
        img, vis = render(t)
        cur = np.log1p(np.maximum(img, 0.0))
        acc.step(ref, cur, EPOCH_BASE + (k - 1) * fine_dt, EPOCH_BASE + t)
        if k % FINE_STEPS == 0:
            i = k // FINE_STEPS
            frames[i] = np.clip(img, 0, 255).astype(np.uint8)
            fg_vis[i] = vis
    events = acc.finish()

    # exact per-pixel GT: the visible layer's closed-form displacement
    gt_u = np.empty((n_frames - 1, H, W), np.float32)
    gt_v = np.empty((n_frames - 1, H, W), np.float32)
    for i in range(n_frames - 1):
        t0, t1 = i * FRAME_DT, (i + 1) * FRAME_DT
        bu, bv = bg_path.flow(t0, t1, grid_z)
        fu, fv = fg_path.flow(t0, t1, grid_z)
        gt_u[i] = np.where(fg_vis[i], fu, bu)
        gt_v[i] = np.where(fg_vis[i], fv, bv)

    gt = {'timestamps': frame_ts, 'x_flow_dist': gt_u, 'y_flow_dist': gt_v}
    return events, frames, frame_ts, gt


def simulate_sequence(rng, duration, seed_phase, speed=1.0,
                      motion='translate'):
    if motion == 'translate':
        return simulate_translate(rng, duration, seed_phase, speed)
    assert motion == 'varied', motion
    return simulate_varied(rng, duration, seed_phase, speed)


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
    ap.add_argument('--val-secs', type=float, default=12.0,
                    help='length of the outdoor_synth3 VALIDATION split '
                         '(independent phase + seed; 0 disables).  '
                         'Checkpoint selection happens on this sequence '
                         'so the test sequence (outdoor_synth1) stays '
                         'untouched until the headline table — mirrors '
                         'the reference val/test separation (reference '
                         'utils/dataloader.py:62-72 + config/testing.yml)')
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--speed', type=float, default=1.0,
                    help='camera drift amplitude scale (~0.35 gives '
                         'MVSEC-like 1-5 px/frame motion)')
    ap.add_argument('--motion', choices=('translate', 'varied'),
                    default='translate',
                    help='translate = constant flow per frame pair '
                         '(rounds 2-3); varied = rotation+zoom+parallax '
                         'flow fields with exact analytic GT (round 4)')
    args = ap.parse_args()

    ds_name = 'synth'
    specs = [('outdoor_synth2', args.train_secs, 0.0),     # train split
             ('outdoor_synth1', args.eval_secs, 2.1)]      # test split
    if args.val_secs > 0:
        # appended LAST so outdoor_synth2/1 keep their seeds (seed+index)
        # and stay bit-identical to the round 2-4 datasets
        specs.append(('outdoor_synth3', args.val_secs, 4.2))  # val split
    names, starts = [], []
    for seq_name, secs, phase in specs:
        rng = np.random.default_rng(args.seed + len(names))
        events, frames, frame_ts, gt = simulate_sequence(
            rng, secs, phase, args.speed, args.motion)
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
