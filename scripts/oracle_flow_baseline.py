#!/usr/bin/env python3
"""Constant-flow oracle AEE over a test matrix.

The strongest possible per-frame-pair CONSTANT predictor: for every eval
window it is handed the propagated GT itself and plays the single 2-vector
(geometric median / mean, whichever scores lower) that minimises the AEE
over exactly the metric's mask.  On spatially-varying GT this oracle has an
irreducible residual — a trained model must beat it decisively to
demonstrate genuine flow-FIELD estimation rather than global-motion
regression (VERDICT round 3, item 1).  On constant-translation GT
(rounds 2-3 data) this oracle scores ~0 by construction, which is exactly
why that data could not support the claim.

Uses the same windows, crops, GT propagation and metric math as test.py
(the mask comes from evaluation.flow_metrics.masked_gt, shared with
flow_error_dense).

Usage:
    DVS_DATA_ROOT=<root> python scripts/oracle_flow_baseline.py \
        [--test-config config/synth_testing.yml]
"""
import argparse
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import test as test_cli  # noqa: E402
from dvs_of_training_framework_tpu.data.augmentation import (  # noqa: E402
    frame_generator, get_count_image)
from dvs_of_training_framework_tpu.evaluation.flow_metrics import (  # noqa: E402,E501
    constant_flow_oracle, estimate_corresponding_gt_flow)


def oracle_for_config(dataset, cfg):
    """Mean oracle AEE / %AEE over the config's eval windows."""
    cfg = test_cli.resolve_time_range(cfg, dataset)
    event_crop, gt_crop = test_cli.build_crops(
        dataset.imshape, cfg.test_shape, cfg.crop_type)
    gt = dataset.gt
    totals = np.zeros(2)
    count = 0
    for w, start, stop in frame_generator(
            dataset.events, test_cli.generate_frames(cfg,
                                                     dataset.image_ts)):
        events = event_crop(np.array(w).T).T
        gt_uv = estimate_corresponding_gt_flow(
            gt['x_flow_dist'], gt['y_flow_dist'], gt['timestamps'],
            start, stop)
        gt_flow = gt_crop(np.dstack(gt_uv))
        count_image = get_count_image(events, gt_flow.shape[:2])
        aee, paee, _, _ = constant_flow_oracle(gt_flow, count_image,
                                               cfg.is_car)
        totals += (aee, paee)
        count += 1
    return totals / max(count, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--test-config', type=Path, default=None)
    cli = ap.parse_args()
    args = SimpleNamespace(test_config=cli.test_config)
    for dataset, shared_cfg in test_cli.build_test_matrix(args):
        cfg = SimpleNamespace(**vars(shared_cfg))
        aee, paee = oracle_for_config(dataset, cfg)
        print(f'[{cfg.sequence}, step={cfg.step}] constant-flow oracle '
              f'AEE={aee:.4f} px, %AEE<3px={paee * 100:.2f}')


if __name__ == '__main__':
    main()
