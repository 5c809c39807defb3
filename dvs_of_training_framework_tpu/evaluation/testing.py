"""Evaluation harness: run a flow predictor over frame windows and
accumulate AEE/%AEE, plus test-config expansion.

Reference: utils/testing.py.
"""
import itertools
from types import SimpleNamespace

import numpy as np
import yaml

from ..data.augmentation import frame_generator, get_count_image
from .flow_metrics import estimate_corresponding_gt_flow, flow_error_dense


def evaluate(of,
             events,
             frames,
             gt,
             event_preproc_fun=None,
             pred_postproc_fun=None,
             gt_proc_fun=None,
             is_car=False,
             log=False):
    """Evaluate flow quality over a sequence.

    Args:
        of: callable ``([events], [start], [stop]) -> [1, H, W, 2]`` flow.
        events: ``[x, y, t, p]`` arrays for the full sequence (sorted by t).
        frames: list of (start_ts, stop_ts) evaluation windows.
        gt: dict with 'timestamps', 'x_flow_dist', 'y_flow_dist'.
        event_preproc_fun / pred_postproc_fun / gt_proc_fun: optional crops.
        is_car: car-hood crop for outdoor sequences.

    Returns:
        (mean AEE, mean %AEE)
    """
    def ev_pre_fun(x):
        return x if event_preproc_fun is None else event_preproc_fun(x)

    def fl_post_fun(x):
        return x if pred_postproc_fun is None else pred_postproc_fun(x)

    def gt_post_fun(x):
        return x if gt_proc_fun is None else gt_proc_fun(x)

    AEE_sum = 0.0
    percent_AEE_sum = 0.0
    max_flow_sum = 0.0
    min_flow_sum = 0.0
    n = 0
    for i, (e, start, stop) in enumerate(frame_generator(events, frames)):
        e = ev_pre_fun(np.array(e).T).T
        flow = of([e], [start], [stop])[0]
        flow = fl_post_fun(flow)

        max_flow_sum += np.max(flow)
        min_flow_sum += np.min(flow)

        U_gt, V_gt = estimate_corresponding_gt_flow(gt['x_flow_dist'],
                                                    gt['y_flow_dist'],
                                                    gt['timestamps'],
                                                    start, stop)
        gt_flow = np.dstack((U_gt, V_gt))
        gt_flow = gt_post_fun(gt_flow)

        event_count_image = get_count_image(e, gt_flow.shape[:2])
        AEE, percent_AEE, n_points = flow_error_dense(gt_flow, flow,
                                                      event_count_image,
                                                      is_car)
        AEE_sum += AEE
        percent_AEE_sum += percent_AEE

        n = i + 1
        if log and n % 100 == 0:
            print('-------------------------------')
            print(f'Iter: {n}')
            print(f'Mean max flow: {max_flow_sum / n:.2f}, '
                  f'mean min flow: {min_flow_sum / n:.2f}')
            print(f'Mean AEE: {AEE_sum / n:.2f}, mean %AEE: '
                  f'{percent_AEE_sum / n:.2f}, #pts: {n_points},')

    res = (float(AEE_sum) / n, percent_AEE_sum / n)
    if log:
        print('Testing done.')
        print(f'Mean AEE: {res[0]:.6f}, mean %AEE: {res[1]:.6f}')
    return res


def read_config(filename):
    with open(str(filename), 'r') as f:
        return yaml.safe_load(f)


def option2list(option):
    if isinstance(option, list):
        return option
    return [option]


def shape2list(option):
    assert isinstance(option, list)
    if isinstance(option[0], list):
        return option
    return [option]


def ravel_config(config):
    """Expand a sequence's test config into its cartesian product."""
    cfg = {k: option2list(config[k])
           for k in ['start', 'stop', 'step', 'crop_type', 'is_car']}
    cfg['test_shape'] = shape2list(config['test_shape'])
    for (start, stop, step, test_shape, crop_type, is_car) \
            in itertools.product(cfg['start'], cfg['stop'], cfg['step'],
                                 cfg['test_shape'], cfg['crop_type'],
                                 cfg['is_car']):
        yield SimpleNamespace(start=start,
                              stop=stop,
                              step=step,
                              test_shape=test_shape,
                              crop_type=crop_type,
                              is_car=is_car)
