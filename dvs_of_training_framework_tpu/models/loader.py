"""Model-plugin loading by path with kwargs filtering.

The framework treats the network as a pluggable package loaded by filesystem
path (reference utils/model.py:26-47): ``<plugin>/net.py`` must define a
``Model`` flax module.  Construction kwargs offered by the CLI are filtered
against the Model's accepted fields, so plugins only declare what they use.

Plugin contract (TPU build):

- ``Model`` is a ``flax.linen.Module`` whose ``__call__(events, timestamps,
  sample_idx, imsize, raw=True, intermediate=False)`` returns
  ``(flows, flow_ts, flow_sample_idx[, features])`` where ``flows`` is a
  tuple of ``[P, 2, H/2^i, W/2^i]`` arrays for i = 3..0.
- optional submodules ``quantization_layer`` and ``predictor`` enable
  two-group optimization with delayed representation learning
  (reference train_flownet.py:50-54, 78-109).
- optional ``quantize`` method for offline event-representation baking
  (reference scripts/quantize_preprocessed.py:87-91).
- ``<plugin>/net.py: compute_event_image`` host-side event->image converter
  used with --ev_images.
- ``<plugin>/__init__.py: OpticalFlow`` inference wrapper.
- ``<plugin>/test.py: vis_flow`` qualitative flow rendering.
"""
import dataclasses
import importlib.util
import inspect
import logging
from pathlib import Path
import sys


def filter_kwargs(func, kwargs):
    """Restrict kwargs to parameters accepted by ``func``.

    flax modules are dataclasses, so both dataclass fields and plain callables
    are supported.  A ``**kwargs`` parameter disables filtering.
    """
    if dataclasses.is_dataclass(func):
        names = {f.name for f in dataclasses.fields(func)}
    else:
        signature = inspect.signature(func)
        for key in signature.parameters:
            if signature.parameters[key].kind \
                    == inspect.Parameter.VAR_KEYWORD:
                return kwargs
        names = set(signature.parameters)
    keys_not2use = [k for k in kwargs if k not in names]
    if keys_not2use:
        logging.warning(f'{keys_not2use} are filtered out from '
                        'model parameters!')
    return {k: v for k, v in kwargs.items() if k in names}


def import_module(module_name, module_path):
    """Import a python module from an explicit file path."""
    module_path = Path(module_path)
    assert module_path.is_file(), f'Module file {module_path} not found'
    # make sibling modules of the plugin importable (net.py imports etc.)
    pkg_dir = str(module_path.parent.parent.resolve())
    if pkg_dir not in sys.path:
        sys.path.insert(0, pkg_dir)
    module_spec = importlib.util.spec_from_file_location(module_name,
                                                         module_path)
    assert module_spec is not None, \
        f'Module: {module_name} at {module_path.resolve()} not found'
    module = importlib.util.module_from_spec(module_spec)
    sys.modules[module_name] = module
    module_spec.loader.exec_module(module)
    return module


def load_model_class(flownet_path):
    flownet_path = Path(flownet_path)
    module = import_module(f'{flownet_path.name}.net',
                           flownet_path / 'net.py')
    return module


def init_model(args, rng, sample_inputs=None):
    """Construct the plugin Model and initialise (or warm-start) parameters.

    Args:
        args: namespace with flownet_path, model kwargs fields, and optional
            ``sp`` starting-point checkpoint.
        rng: ``jax.random.PRNGKey`` for parameter init.
        sample_inputs: optional ``(events, timestamps, sample_idx, imsize)``
            used to trace initialisation; a minimal probe is built otherwise.

    Returns:
        (model, params)
    """
    import jax.numpy as jnp
    from flax.core import unfreeze

    from ..utils.options import options2model_kwargs
    from ..data.schema import EventBuffer

    module = load_model_class(args.flownet_path)
    model_kwargs = filter_kwargs(module.Model, options2model_kwargs(args))
    model = module.Model(**model_kwargs)

    if sample_inputs is None:
        seq = getattr(args, 'max_sequence_length', 1)
        num_ts = seq + 1
        events = EventBuffer(
            x=jnp.zeros((8,), jnp.int32),
            y=jnp.zeros((8,), jnp.int32),
            timestamp=jnp.zeros((8,), jnp.float32),
            polarity=jnp.zeros((8,), jnp.float32),
            element_index=jnp.zeros((8,), jnp.int32),
            sample_index=jnp.full((8,), 1, jnp.int32),
            num_events=jnp.int32(0))
        timestamps = jnp.array([0.04 * i for i in range(num_ts)],
                               jnp.float32)
        sample_idx = jnp.zeros((num_ts,), jnp.int32)
        sample_inputs = (events, timestamps, sample_idx,
                         tuple(getattr(args, 'shape', (256, 256))))

    # one jitted init program: eager init dispatches thousands of small
    # ops, which costs minutes through a tunnelled TPU (latency-bound),
    # and its output buffers are fresh uploads (slow to fetch later)
    import jax
    imsize = sample_inputs[3]
    variables = jax.jit(
        lambda r, e, t, s: model.init(r, e, t, s, imsize))(
        rng, *sample_inputs[:3])
    params = unfreeze(variables['params'])

    if getattr(args, 'sp', None) is not None:
        from ..training.serializer import read_params_file
        loaded = read_params_file(args.sp, target=params)
        params = loaded
    return model, params
