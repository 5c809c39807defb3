"""Shared staged-step measurement harness for the A/B benchmark scripts.

Builds the bench workload (bench.make_batch), an EVFlowNet model, the
RANGER optimizer and the jitted train step, then times the staged step
— the protocol every `ab_*.py` previously copy-pasted.  Callers vary
one knob (model kwargs / loss precision / a module monkeypatch applied
around the call) and run ALL variants in one process (the tunnel
cross-process variance rule, CLAUDE.md).
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench  # noqa: E402

WARMUP = 3


def measure_step(dtype='bfloat16', loss_bf16x2=True, iters=30,
                 model_kwargs=None):
    """Build the bench-config train step and time it staged on device.

    Args:
        dtype: model compute dtype ('bfloat16' = recipe, 'float32' =
            golden; golden pairs with loss_bf16x2=False).
        loss_bf16x2: tri-state warp precision (False | True | 'x1').
        iters: timed iterations after WARMUP.
        model_kwargs: extra EVFlowNet Model kwargs (e.g. kernel_mlp).

    Returns:
        (seconds_per_step, final_loss)
    """
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from dvs_of_training_framework_tpu.losses import MultiScaleLoss
    from dvs_of_training_framework_tpu.models import load_model_class
    from dvs_of_training_framework_tpu.training.optimizers import \
        construct_optimizer
    from dvs_of_training_framework_tpu.training.state import (
        create_train_state, make_train_step)

    module = load_model_class(REPO / 'EVFlowNet')
    model = module.Model(event_representation_depth=bench.DEPTH,
                         base_channels=bench.BASE, dtype=dtype,
                         scatter_method=bench.SCATTER,
                         **(model_kwargs or {}))
    rng = np.random.default_rng(0)
    batch = bench.make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch.events,
                        batch.timestamps, batch.sample_idx,
                        bench.IMSIZE)['params']
    args = SimpleNamespace(optimizer='RANGER', lr=1e-3, wdw=1e-4,
                           half_life=100000, num_warmup_steps=0,
                           training_steps=1000000, rs=0.5)
    tx = construct_optimizer(args, params)
    evaluator = MultiScaleLoss(
        [tuple(x // 2 ** i for x in bench.IMSIZE)
         for i in range(4)][::-1], bf16x2=loss_bf16x2)
    step = make_train_step(model, evaluator, tx, [0.5, 1, 1],
                           accumulation_steps=1, is_raw=True)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    staged = jax.device_put(batch)
    for _ in range(WARMUP):
        state, (loss, _) = step(state, staged)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, (loss, _) = step(state, staged)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    return dt, float(loss)
