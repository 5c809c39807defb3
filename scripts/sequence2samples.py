#!/usr/bin/env python3
"""Slice raw MVSEC sequences into per-element training files.

For every inter-frame window of each configured sequence, writes one HDF5
file holding the window's events, the bracketing frames, and start/stop
timestamps — the schema consumed by DatasetImpl.  Time ranges come from
``config/training_datasets.yml``; per-sequence epoch start times from
``data/info/<dataset>.hdf5``.  (Reference: scripts/sequence2samples.py.)
"""
from pathlib import Path
import os
import sys

import h5py
import numpy as np
import yaml
from tqdm import tqdm

sys.path.append(os.getcwd())

from dvs_of_training_framework_tpu.data.dataset import read_info  # noqa: E402
from dvs_of_training_framework_tpu.utils.common import is_inside_docker  # noqa: E402


def write_samples(events, images, image_ts, img2event_map, out_dir, ts0):
    """Write one file per inter-frame window.

    ``img2event_map[i]`` is the index of the last event at or before frame i
    (MVSEC's image_raw_event_inds), so window i spans events
    (map[i], map[i+1]].
    """
    for i, (b, e, start_ts, stop_ts) in tqdm(
            enumerate(zip(img2event_map[:-1], img2event_map[1:],
                          image_ts[:-1], image_ts[1:])),
            total=img2event_map.size - 1):
        frame_events = np.array(events[b + 1:e + 1])
        assert frame_events[0, 2] >= start_ts, \
            'The first event is before the first image'
        assert b < 0 or events[b, 2] <= start_ts, 'Some events are missed'
        assert frame_events[-1, 2] <= stop_ts, \
            'The last event is after the second image'
        assert e + 1 >= events.shape[0] or events[e + 1, 2] >= stop_ts, \
            'Some events are missed'
        frame_events[:, 2] -= ts0
        with h5py.File(str(out_dir / f'{i:06d}.hdf5'), 'w') as of:
            of.create_dataset('image1', data=np.array(images[i]))
            of.create_dataset('image2', data=np.array(images[i + 1]))
            of.create_dataset('events', data=frame_events)
            of.create_dataset('start', data=start_ts - ts0)
            of.create_dataset('stop', data=stop_ts - ts0)


def main():
    script_dir = Path(__file__).resolve().parent.parent
    if is_inside_docker():
        data_dir = Path('/data')
        info_dir = data_dir / 'info'
    else:
        data_dir = (script_dir / '..' / 'data').resolve()
        info_dir = script_dir / 'data' / 'info'

    config_path = script_dir / 'config' / 'training_datasets.yml'
    with open(config_path, 'r') as f:
        config = yaml.safe_load(f)

    raw_data_dir = data_dir / 'raw'
    training_dir = data_dir / 'training'

    for ds_name, ds_config in config.items():
        ds_raw_dir = raw_data_dir / ds_name
        ds_training_dir = training_dir / ds_name
        ds_info = read_info(str(info_dir / (ds_name + '.hdf5')))
        for seq_name, seq_config in ds_config.items():
            seq_raw_file = ds_raw_dir / seq_name[:-1] / \
                (seq_name + '_data.hdf5')
            seq_training_dir = ds_training_dir / seq_name
            start_ts = seq_config['start'] or 0
            stop_ts = seq_config['stop']
            t0 = ds_info[seq_name]
            seq_training_dir.mkdir(parents=True, exist_ok=True)

            with h5py.File(str(seq_raw_file), 'r') as data:
                left = data['davis']['left']
                events = left['events']
                image_ts = np.array(left['image_raw_ts'])
                images = left['image_raw']
                img2event_map = np.array(left['image_raw_event_inds'],
                                         dtype=np.int64)

                mask = image_ts >= t0 + start_ts
                if stop_ts is not None:
                    mask = np.logical_and(mask, image_ts <= t0 + stop_ts)

                image_ts = image_ts[mask]
                images = images[mask, :]
                img2event_map = img2event_map[mask]
                write_samples(events, images, image_ts, img2event_map,
                              seq_training_dir, t0)


if __name__ == '__main__':
    main()
