"""Step-indexed checkpoint store with bounded history + permanent snapshots.

API and retention policy mirror the reference Serializer
(utils/serializer.py:37-148): checkpoints named ``step_{}.ckpt``, a rolling
window of ``keep_checkpoints_max`` temporal checkpoints, permanent keeps
every ``permanent_checkpoint_interval`` steps, rediscovery by filename
parsing on startup, and ``finalize`` to export weights-only files.

Storage is msgpack of nested state dicts (flax.serialization) — a single
self-contained file per step holding ``{model, optimizer, global_step,
samples_passed, ...}``; optimizer state round-trips exactly (including
Lookahead slow weights and schedule counters), making resume bit-faithful.
"""
import logging
import math
import os
from pathlib import Path
import threading
import typing

import numpy as np
from flax import serialization

from ..utils.common import parse_template


def _to_pure(tree):
    """Pytree -> nested dicts/lists of numpy arrays (msgpack-safe).

    One batched ``jax.device_get`` for the whole tree: per-leaf
    ``np.asarray`` issues a sequential D2H roundtrip per buffer, which
    costs ~47 s for a 213 MB train state through the tunnelled TPU
    (measured); the batched fetch is ~1 s.
    """
    state = serialization.to_state_dict(tree)
    import jax
    state = jax.device_get(state)
    return jax.tree_util.tree_map(np.asarray, state)


def save_state_file(path, state_dict: dict):
    data = serialization.msgpack_serialize(_to_pure(state_dict))
    tmp = Path(str(path) + '.tmp')
    tmp.write_bytes(data)
    os.replace(tmp, path)


def load_state_file(path) -> dict:
    return serialization.msgpack_restore(Path(path).read_bytes())


def read_params_file(path, target=None):
    """Load model params from a checkpoint or a weights-only file.

    Accepts both full checkpoints (with a 'model' key) and bare param trees,
    like the reference's ``if 'model' in state_dict`` handling
    (DummyNet/of.py:41-44).
    """
    state = load_state_file(path)
    if isinstance(state, dict) and 'model' in state:
        state = state['model']
    if target is not None:
        return serialization.from_state_dict(target, state)
    return state


def find_ema_params(opt_state_dict):
    """Locate the ``ema_params`` tree inside a serialized optimizer state.

    ``optimizers.with_param_ema`` is the outermost rider, but the state
    dict nests it under flax's namedtuple field names, so a small
    recursive search keyed on the distinctive ``ema_params`` field is
    robust to where the wrapper sits in the chain.
    """
    if not isinstance(opt_state_dict, dict):
        return None
    if 'ema_params' in opt_state_dict:
        return opt_state_dict['ema_params']
    for value in opt_state_dict.values():
        found = find_ema_params(value)
        if found is not None:
            return found
    return None


def remove_tree(path):
    path = Path(path)
    if path.is_file():
        path.unlink()
        return
    for child in sorted(path.rglob('*'), reverse=True):
        if child.is_file():
            child.unlink()
        else:
            child.rmdir()
    path.rmdir()


class Serializer:
    def __init__(self,
                 path: Path,
                 keep_checkpoints_max=math.inf,
                 permanent_checkpoint_interval=1,
                 name_template='step_{}.ckpt',
                 async_write=False):
        """
        Args:
            async_write: serialise to host memory synchronously but write
                the file in a background thread (the device-side state is
                already copied, so training can proceed immediately —
                the TPU analogue of Orbax's async checkpointing).
        """
        self._path = Path(path)
        self._path.mkdir(parents=True, exist_ok=True)
        self._history_size = keep_checkpoints_max
        self._permanent_interval = permanent_checkpoint_interval
        self._permanent_checkpoints = dict()
        self._temporal_checkpoints = dict()
        self._async_write = async_write
        self._pending = None
        assert parse_template(name_template,
                              name_template.format(0)) is not None, \
            'checkpoint name template must use exactly one argument'
        self._name_template = name_template
        self._find_checkpoints()

    def _remove_old(self):
        if self._history_size <= 0 or not math.isfinite(self._history_size):
            return
        history_size = int(self._history_size)
        temporal_steps = sorted(self._temporal_checkpoints.keys(),
                                key=lambda x: -x)
        for step in temporal_steps[history_size:]:
            remove_tree(self._path / self._temporal_checkpoints.pop(step))
            logging.info(f'Checkpoint with ID={step} is removed')

    def _find_checkpoints(self):
        names = [x.name for x in self._path.iterdir()]
        keys = [parse_template(self._name_template, name) for name in names]
        known_checkpoints = {int(step[0]): name
                             for step, name in zip(keys, names)
                             if step is not None and step[0].isdigit()}
        if self._permanent_interval > 0:
            self._permanent_checkpoints = {
                s: n for s, n in known_checkpoints.items()
                if s % self._permanent_interval == 0}
        self._temporal_checkpoints = {
            s: n for s, n in known_checkpoints.items()
            if s not in self._permanent_checkpoints}

    def _id2path(self, global_step):
        return self._path / self._name_template.format(global_step)

    def checkpoint_model(self, params, opt_state, global_step, **kwargs):
        """Persist model + optimizer + step (+ extra kwargs, e.g.
        samples_passed) for resumable training."""
        path = self._id2path(global_step)
        if (self._permanent_interval > 0
                and global_step % self._permanent_interval == 0):
            self._permanent_checkpoints[global_step] = path.name
        else:
            self._temporal_checkpoints[global_step] = path.name

        checkpoint_state_dict = {'model': params,
                                 'optimizer': opt_state,
                                 'global_step': global_step}
        checkpoint_state_dict.update(kwargs)
        if self._async_write:
            self.wait()
            # device->host copy happens here (synchronously, so the live
            # state can keep training); file IO moves off-thread
            data = serialization.msgpack_serialize(
                _to_pure(checkpoint_state_dict))

            def write():
                tmp = Path(str(path) + '.tmp')
                tmp.write_bytes(data)
                os.replace(tmp, path)
                self._remove_old()

            self._pending = threading.Thread(target=write, daemon=True)
            self._pending.start()
        else:
            save_state_file(path, checkpoint_state_dict)
            self._remove_old()

    def wait(self):
        """Block until a pending async checkpoint write completes."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    def has_checkpoints(self):
        return (len(self._temporal_checkpoints)
                + len(self._permanent_checkpoints)) > 0

    def list_known_steps(self):
        steps = (list(self._temporal_checkpoints.keys())
                 + list(self._permanent_checkpoints.keys()))
        return sorted(steps)

    def read_state_dict(self, global_step: int):
        return load_state_file(self._id2path(global_step))

    def finalize(self,
                 global_step: int,
                 path: typing.Union[str, os.PathLike],
                 use_ema: bool = False):
        """Export a weights-only file for inference/distribution.

        ``use_ema=True`` exports the parameter EMA maintained by
        ``optimizers.with_param_ema`` (``--ema-decay``) instead of the
        live weights; raises if the checkpoint carries no EMA.
        """
        checkpoint_state_dict = self.read_state_dict(global_step)
        model = checkpoint_state_dict['model']
        if use_ema:
            model = find_ema_params(checkpoint_state_dict.get('optimizer'))
            if model is None:
                raise ValueError(
                    f'checkpoint step {global_step} holds no parameter '
                    'EMA (train with --ema-decay to record one)')
        data = serialization.msgpack_serialize({'model': model})
        Path(path).write_bytes(data)

    def load_checkpoint(self, global_step, params_target=None,
                        opt_state_target=None):
        """Load a checkpoint; returns (global_step, params, opt_state,
        extra_state)."""
        if (global_step not in self._temporal_checkpoints
                and global_step not in self._permanent_checkpoints):
            raise ValueError(f'Checkpoint for step {global_step} not found')
        state = self.read_state_dict(global_step)
        step = int(state.pop('global_step'))
        params = state.pop('model')
        opt_state = state.pop('optimizer', None)
        if params_target is not None:
            params = serialization.from_state_dict(params_target, params)
        if opt_state is not None and opt_state_target is not None:
            opt_state = serialization.from_state_dict(opt_state_target,
                                                      opt_state)
        return step, params, opt_state, state
