"""Shared helpers: cumulative sums, run provenance, docker detection.

Parity targets in the reference: utils/common.py (cumsum_with_prefix 26-50,
provenance 97-237, is_inside_docker 13-14, mean 22-23, to_tensor 240-259).
The TPU build keeps host-side batch assembly in NumPy, so these helpers are
NumPy-first; ``to_array`` replaces torch ``to_tensor``.
"""
import copy
import os
from pathlib import Path
import re
import subprocess
import sys
from typing import Dict, Union

import numpy as np
import yaml


def is_inside_docker():
    return 'INSIDE_DOCKER' in os.environ and bool(os.environ['INSIDE_DOCKER'])


def mean(values):
    values = list(values)
    return sum(values) / len(values)


def cumsum_with_prefix(arr, dtype=None):
    """Cumulative sum of a 1-d array shifted by one: [1,2,3] -> [0,1,3,6]."""
    arr = np.asarray(arr)
    if dtype is None:
        dtype = arr.dtype
    result = np.zeros(arr.size + 1, dtype=dtype)
    np.cumsum(arr, dtype=dtype, out=result[1:])
    return result


def get_commithash(cwd=None):
    """Git commit hash of the repo at ``cwd`` (default: current directory)."""
    return subprocess.check_output('git rev-parse --verify HEAD',
                                   shell=True, cwd=cwd).decode().strip()


def encode_args(args):
    """YAML-encode an argparse namespace (paths/tuples made serialisable)."""
    result = copy.deepcopy(vars(args))
    for k, v in result.items():
        if isinstance(v, Path):
            result[k] = str(v)
        elif isinstance(v, tuple):
            result[k] = list(v)
    return yaml.dump(result)


def collect_execution_info(args):
    """argv + git revisions (framework and model plugin) + YAML'd args."""
    strings = [' '.join(sys.argv),
               '--',
               f'commit hash: {get_commithash()}']
    if 'flownet_path' in vars(args):
        try:
            strings.append(
                f'model commit hash: {get_commithash(args.flownet_path)}')
        except subprocess.CalledProcessError:
            # in-tree plugins share the framework repository
            pass
    strings.append('--')
    strings.append(encode_args(args))
    return '\n'.join(strings)


def file_for_execution_info(out_dir):
    return Path(out_dir) / 'parameters'


def write_execution_info(out_dir, execution_info):
    file_for_execution_info(out_dir).write_text(execution_info)


def read_execution_info(out_dir):
    path = file_for_execution_info(out_dir)
    if path.is_file():
        return path.read_text()
    return None


def split_execution_info_into_groups(execution_info):
    return re.split(r'^--$|^--\n|\n--$|\n--\n', execution_info)


def execution_info2code_revisions(execution_info):
    revisions_group = split_execution_info_into_groups(execution_info)[1]
    return dict(map(lambda y: y.strip(), x.split(':'))
                for x in revisions_group.split('\n') if x.strip())


def execution_info2args(execution_info):
    return yaml.safe_load(split_execution_info_into_groups(execution_info)[2])


# Arguments that may differ between a run and its resume without invalidating
# the output directory.
_VOLATILE_ARGS = {'allow_arguments_change', 'allow_obsolete_code', 'cache-dir',
                  'cache_dir'}


def check_execution_info(out_dir, execution_info, args):
    """Resume-safety gate: assert code revisions and args are unchanged.

    Overridable via --allow-obsolete-code / --allow-arguments-change
    (reference utils/common.py:205-237).
    """
    previous_execution_info = read_execution_info(out_dir)
    if previous_execution_info is None:
        return
    if not getattr(args, 'allow_obsolete_code', False):
        previous_revisions = \
            execution_info2code_revisions(previous_execution_info)
        current_revisions = execution_info2code_revisions(execution_info)
        for k in set(previous_revisions) & set(current_revisions):
            assert previous_revisions[k] == current_revisions[k], \
                f"Stored and current revisions for repository {k} are " \
                f"different ({previous_revisions[k]} vs {current_revisions[k]})"
    if not getattr(args, 'allow_arguments_change', False):
        previous_args = execution_info2args(previous_execution_info)
        current_args = execution_info2args(execution_info)
        keys = set(current_args) & set(previous_args)
        for k in keys - _VOLATILE_ARGS:
            assert previous_args[k] == current_args[k], \
                f'Stored and current value for argument {k} are ' \
                f'different ({previous_args[k]} vs {current_args[k]})'


def to_array(data: Union[np.ndarray, Dict, list, float]):
    """Convert nested data to NumPy arrays (int -> int64, rest -> float32).

    Host-side replacement for the reference ``to_tensor``
    (utils/common.py:240-259): integer inputs stay integral (int64),
    everything else becomes float32.
    """
    if isinstance(data, dict):
        return {k: to_array(v) for k, v in data.items()}
    arr = np.asarray(data)
    if arr.dtype == np.int_ or np.issubdtype(arr.dtype, np.integer) \
            or arr.dtype == np.bool_:
        if arr.dtype == np.bool_:
            return arr
        return arr.astype(np.int64)
    return arr.astype(np.float32)


def parse_template(template: str, value: str):
    """Minimal stand-in for ``parse.parse`` restricted to '{}' templates.

    Returns a list of captured groups or None when the value does not match.
    Used by the checkpoint serializer to rediscover checkpoints by name.
    """
    pattern = re.escape(template).replace(r'\{\}', '(.+?)')
    m = re.fullmatch(pattern, value)
    if m is None:
        return None
    return list(m.groups())
