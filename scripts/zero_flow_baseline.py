#!/usr/bin/env python3
"""Zero-flow baseline AEE over a test matrix.

The AEE of the all-zeros predictor equals the mean GT displacement
magnitude over the masked pixels — the number any trained model must beat
to demonstrate genuine motion estimation.  Uses the same windows, crops,
GT propagation and metric math as test.py.

Usage:
    DVS_DATA_ROOT=<root> python scripts/zero_flow_baseline.py \
        [--test-config experiments/synth_testing.yml]
"""
import argparse
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import test as test_cli  # noqa: E402
from dvs_of_training_framework_tpu.evaluation import evaluate  # noqa: E402


class ZeroFlow:
    def __init__(self, shape):
        self.shape = tuple(shape)

    def __call__(self, events_list, starts, stops):
        return [np.zeros((*self.shape, 2), np.float32)
                for _ in events_list]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--test-config', type=Path, default=None)
    cli = ap.parse_args()
    args = SimpleNamespace(test_config=cli.test_config)
    for dataset, shared_cfg in test_cli.build_test_matrix(args):
        cfg = SimpleNamespace(**vars(shared_cfg))
        cfg = test_cli.resolve_time_range(cfg, dataset)
        event_crop, gt_crop = test_cli.build_crops(
            dataset.imshape, cfg.test_shape, cfg.crop_type)
        aee, paee = evaluate(ZeroFlow(cfg.test_shape),
                             dataset.events,
                             test_cli.generate_frames(cfg,
                                                      dataset.image_ts),
                             dataset.gt,
                             event_preproc_fun=event_crop,
                             pred_postproc_fun=None,
                             gt_proc_fun=gt_crop,
                             is_car=cfg.is_car)
        print(f'[{cfg.sequence}, step={cfg.step}] zero-flow '
              f'AEE={aee:.4f} px, %AEE<3px={paee * 100:.2f}')


if __name__ == '__main__':
    main()
