"""Evaluation harness: run a flow predictor over frame windows and
accumulate AEE/%AEE, plus test-config expansion.

Behavioural parity target: reference utils/testing.py (evaluate 10-108,
read_config 111-117, ravel_config 133-153).  Independent implementation:
the per-window pipeline is factored into ``_window_metrics`` feeding a
running-statistics accumulator, and the config expansion is keyed off a
normaliser table instead of positional unpacking.
"""
import itertools
from concurrent.futures import ThreadPoolExecutor
from types import SimpleNamespace

import numpy as np
import yaml

from ..data.augmentation import frame_generator, get_count_image
from .flow_metrics import (endpoint_error_stats,
                           estimate_corresponding_gt_flow)


def _identity(x):
    return x


class _RunningMeans:
    """Accumulates per-window scalars and reports their means."""

    def __init__(self, *names):
        self.totals = dict.fromkeys(names, 0.0)
        self.count = 0

    def add(self, **scalars):
        for name, value in scalars.items():
            self.totals[name] += float(value)
        self.count += 1

    def mean(self, name):
        return self.totals[name] / self.count


def _score_window(flow, gt_uv, window_events, gt_proc_fun, is_car):
    """Score one window's predicted flow against its propagated GT."""
    gt_flow = gt_proc_fun(np.dstack(gt_uv))
    count_image = get_count_image(window_events, gt_flow.shape[:2])
    return endpoint_error_stats(gt_flow, flow, count_image, is_car)


def _blocks(iterable, size):
    iterator = iter(iterable)
    while True:
        block = list(itertools.islice(iterator, size))
        if not block:
            return
        yield block


def evaluate(of,
             events,
             frames,
             gt,
             event_preproc_fun=None,
             pred_postproc_fun=None,
             gt_proc_fun=None,
             is_car=False,
             log=False,
             gt_flow_fn=None,
             batch_windows: int = 8,
             stats_out=None):
    """Evaluate flow quality over a sequence.

    Args:
        of: callable ``([events], [start], [stop]) -> [B, H, W, 2]`` flow.
        events: ``[x, y, t, p]`` arrays for the full sequence (sorted by t).
        frames: list of (start_ts, stop_ts) evaluation windows.
        gt: dict with 'timestamps', 'x_flow_dist', 'y_flow_dist'.
        event_preproc_fun / pred_postproc_fun / gt_proc_fun: optional crops.
        is_car: car-hood crop for outdoor sequences.
        gt_flow_fn: optional ``(start, stop) -> (gt_u, gt_v)`` override for
            the GT propagation (e.g. a memoising or pooled propagator).
        batch_windows: windows batched per device call.  The reference
            runs one window per forward (utils/testing.py:10-108); batched
            inference amortises the upload + dispatch over B windows and
            keeps the device matrix units fed (PERFORMANCE.md round-2
            lever 2: ~2.6 s/window through a tunnelled TPU was upload
            penalty, not compute).  A partial final block is repeat-padded
            so every call shares one compiled program per event bucket.

    Returns:
        (mean AEE, mean %AEE) — identical values for any batch_windows.

    ``stats_out``: optional dict the harness fills with the robust view of
    the same evaluation — ``median_ee`` (mean over windows of the
    per-window MEDIAN endpoint error, outlier-robust where mAEE is not)
    and ``windows``: one record per window ``(start, stop, aee,
    percent_aee, median_ee, n_points)`` so spiking checkpoints can be
    traced to the specific windows that spike (ACCURACY.md round-4
    caveat; reference analogue utils/eval.py returns per-window scalars
    that its harness then averages, utils/testing.py:10-108).

    The GT propagation for each window runs on a background thread WHILE
    the device computes the block's flow: propagation is GIL-bound NumPy
    and inference releases the GIL while blocked on the device, so the two
    overlap even on a single host core (measured in
    scripts/benchmarks/profile_eval_pool.py — more threads do NOT scale
    propagation, overlap is what helps).
    """
    event_preproc_fun = event_preproc_fun or _identity
    pred_postproc_fun = pred_postproc_fun or _identity
    gt_proc_fun = gt_proc_fun or _identity
    if gt_flow_fn is None:
        def gt_flow_fn(start, stop):
            return estimate_corresponding_gt_flow(
                gt['x_flow_dist'], gt['y_flow_dist'], gt['timestamps'],
                start, stop)

    batch_windows = max(int(batch_windows), 1)
    stats = _RunningMeans('aee', 'percent_aee', 'median_ee',
                          'max_flow', 'min_flow')
    window_records = []
    with ThreadPoolExecutor(1) as gt_pool:
        for block in _blocks(frame_generator(events, frames),
                             batch_windows):
            wins = [(event_preproc_fun(np.array(w).T).T, start, stop)
                    for w, start, stop in block]
            gt_futures = [gt_pool.submit(gt_flow_fn, start, stop)
                          for _, start, stop in wins]
            n = len(wins)
            # repeat-pad a partial final block: a single static batch size
            # per event bucket means one compile, extra rows are dropped
            padded = wins + [wins[-1]] * (batch_windows - n)
            flows = of([w for w, _, _ in padded],
                       [s for _, s, _ in padded],
                       [t for _, _, t in padded])
            for i in range(n):
                window_events = wins[i][0]
                flow = pred_postproc_fun(flows[i])
                ws = _score_window(
                    flow, gt_futures[i].result(), window_events,
                    gt_proc_fun, is_car)
                stats.add(aee=ws['aee'], percent_aee=ws['percent_aee'],
                          median_ee=ws['median_ee'],
                          max_flow=np.max(flow), min_flow=np.min(flow))
                if stats_out is not None:
                    window_records.append(
                        dict(start=float(wins[i][1]),
                             stop=float(wins[i][2]), **ws))

                if log and stats.count % 100 == 0:
                    print('-------------------------------')
                    print(f'Iter: {stats.count}')
                    print(f"Mean max flow: {stats.mean('max_flow'):.2f}, "
                          f"mean min flow: {stats.mean('min_flow'):.2f}")
                    print(f"Mean AEE: {stats.mean('aee'):.2f}, "
                          f"mean %AEE: {stats.mean('percent_aee'):.2f}, "
                          f"#pts: {ws['n_points']},")

    result = (stats.mean('aee'), stats.mean('percent_aee'))
    if stats_out is not None:
        stats_out['median_ee'] = stats.mean('median_ee')
        stats_out['windows'] = window_records
    if log:
        print('Testing done.')
        print(f'Mean AEE: {result[0]:.6f}, mean %AEE: {result[1]:.6f}')
    return result


def read_config(filename):
    with open(str(filename), 'r') as f:
        return yaml.safe_load(f)


# Per-field normalisers: how a raw config entry becomes a list of variants.
def _scalar_or_list(value):
    return value if isinstance(value, list) else [value]


def _shape_or_list(value):
    assert isinstance(value, list)
    return value if isinstance(value[0], list) else [value]


_CONFIG_FIELDS = {'start': _scalar_or_list,
                  'stop': _scalar_or_list,
                  'step': _scalar_or_list,
                  'test_shape': _shape_or_list,
                  'crop_type': _scalar_or_list,
                  'is_car': _scalar_or_list}

# Aliases kept for external callers of the reference helper names.
option2list = _scalar_or_list
shape2list = _shape_or_list


def ravel_config(config):
    """Expand a sequence's test config into its cartesian product."""
    names = list(_CONFIG_FIELDS)
    variants = [_CONFIG_FIELDS[name](config[name]) for name in names]
    for combination in itertools.product(*variants):
        yield SimpleNamespace(**dict(zip(names, combination)))
