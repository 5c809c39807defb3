"""Model plugin contract: forward shapes, voxelization, plugin loading."""
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvs_of_training_framework_tpu.data.schema import pad_events
from dvs_of_training_framework_tpu.models import (filter_kwargs,
                                                 load_model_class)

REPO = Path(__file__).resolve().parents[2]


def make_inputs(batch_size=2, seq_length=1, n_events=64, imsize=(32, 48),
                capacity=128, seed=0):
    rng = np.random.default_rng(seed)
    H, W = imsize
    num_ts = seq_length + 1
    per_sample = np.linspace(0, 0.04 * seq_length, num_ts)
    timestamps = np.tile(per_sample, batch_size).astype(np.float32)
    sample_idx = np.repeat(np.arange(batch_size), num_ts).astype(np.int32)
    ev = {
        'x': rng.integers(0, W, n_events),
        'y': rng.integers(0, H, n_events),
        'timestamp': rng.uniform(0, 0.04 * seq_length, n_events)
        .astype(np.float32),
        'polarity': rng.choice([-1.0, 1.0], n_events),
        'element_index': rng.integers(0, seq_length, n_events),
        'sample_index': np.sort(rng.integers(0, batch_size, n_events)),
    }
    events = pad_events(ev, batch_size, capacity)
    return events, jnp.asarray(timestamps), jnp.asarray(sample_idx), imsize


@pytest.mark.parametrize('plugin', ['DummyFlowNet', 'EVFlowNet'])
def test_forward_contract(plugin):
    module = load_model_class(REPO / plugin)
    kwargs = filter_kwargs(module.Model, dict(
        prefix_length=0, suffix_length=0, max_sequence_length=1,
        dynamic_sample_length=False, event_representation_depth=4,
        activation='relu', base_channels=8))
    model = module.Model(**kwargs)
    events, timestamps, sample_idx, imsize = make_inputs()
    params = model.init(jax.random.PRNGKey(0), events, timestamps,
                        sample_idx, imsize)['params']
    flows, flow_ts, flow_sample_idx, features = model.apply(
        {'params': params}, events, timestamps, sample_idx, imsize,
        intermediate=True)
    assert len(flows) == 4
    H, W = imsize
    for i, flow in enumerate(flows):
        scale = 2 ** (3 - i)
        assert flow.shape == (2, 2, H // scale, W // scale), i
    assert flow_ts.shape == (2, 2)
    assert (np.asarray(flow_sample_idx) == np.arange(2)).all()
    # flow_ts rows must equal each sample's (start, stop) timestamps
    assert np.allclose(np.asarray(flow_ts),
                       np.asarray(timestamps).reshape(2, 2))


def test_dummy_zero_flow():
    module = load_model_class(REPO / 'DummyFlowNet')
    model = module.Model()
    events, timestamps, sample_idx, imsize = make_inputs()
    params = model.init(jax.random.PRNGKey(0), events, timestamps,
                        sample_idx, imsize)['params']
    flows, _, _ = model.apply({'params': params}, events, timestamps,
                              sample_idx, imsize)
    for flow in flows:
        assert float(jnp.abs(flow).max()) == 0.0


def test_quantization_matches_host_event_image():
    """With a zeroed kernel MLP the voxel grid equals the host-side
    triangular-kernel event image (compute_event_image)."""
    module = load_model_class(REPO / 'EVFlowNet')
    depth = 5
    model = module.Model(event_representation_depth=depth, base_channels=8)
    events, timestamps, sample_idx, imsize = make_inputs(
        batch_size=2, n_events=64, capacity=64)  # no padding slack
    params = model.init(jax.random.PRNGKey(0), events, timestamps,
                        sample_idx, imsize)['params']
    # zero the learnable residual -> pure triangular kernel
    params = jax.tree_util.tree_map(lambda x: x, params)
    params['quantization_layer']['kernel_out']['kernel'] = \
        jnp.zeros_like(params['quantization_layer']['kernel_out']['kernel'])
    params['quantization_layer']['kernel_out']['bias'] = \
        jnp.zeros_like(params['quantization_layer']['kernel_out']['bias'])

    grid = model.apply({'params': params}, events, timestamps, sample_idx,
                       imsize, method=model.quantize)
    assert grid.shape == (2, depth, *imsize)

    # host-side computation per sample
    ev = events
    x = np.asarray(ev.x)
    y = np.asarray(ev.y)
    t = np.asarray(ev.timestamp)
    p = np.asarray(ev.polarity)
    e = np.asarray(ev.element_index)
    s = np.asarray(ev.sample_index)
    ts = np.asarray(timestamps)
    for b in range(2):
        m = s == b
        rows = np.stack([x[m], y[m], t[m], p[m], e[m]], axis=1) \
            .astype(np.float32)
        block = ts[b * 2:(b + 1) * 2]
        host = module.compute_event_image(rows, block[:-1], block[1:],
                                          imsize, depth=depth)
        np.testing.assert_allclose(np.asarray(grid[b]), host[0],
                                   rtol=1e-5, atol=1e-5)


def test_optical_flow_wrapper():
    import importlib
    plugin = importlib.import_module('DummyFlowNet')
    of = plugin.OpticalFlow((32, 48), event_capacity=4096)
    rng = np.random.default_rng(0)
    n = 37
    window = np.stack([rng.integers(0, 48, n), rng.integers(0, 32, n),
                       np.sort(rng.uniform(5.0, 5.1, n)),
                       rng.choice([-1, 1], n)]).astype(np.float64)
    flow = of([window], [5.0], [5.1])
    assert flow.shape == (1, 32, 48, 2)
    all_scales = of([window], [5.0], [5.1], return_all=True)
    assert len(all_scales) == 4


def test_pallas_scatter_method_matches_default():
    """Model(scatter_method='pallas') produces the same voxel grid (the
    pallas kernel runs in interpret mode off-TPU via the JAX fallback)."""
    import jax.numpy as jnp
    from unittest import mock
    from dvs_of_training_framework_tpu.ops import voxel_pallas

    module = load_model_class(REPO / 'EVFlowNet')
    events, timestamps, sample_idx, imsize = make_inputs(
        batch_size=2, n_events=64, capacity=64)
    ref_model = module.Model(event_representation_depth=4, base_channels=8)
    params = ref_model.init(jax.random.PRNGKey(0), events, timestamps,
                            sample_idx, imsize)['params']
    ref = ref_model.apply({'params': params}, events, timestamps,
                          sample_idx, imsize, method=ref_model.quantize)

    orig = voxel_pallas.voxelize_pallas

    def interp(x, y, plane, w, valid, P, H, W, chunk=256, interpret=False):
        return orig(x, y, plane, w, valid, P, H, W, 32, True)

    with mock.patch.object(voxel_pallas, 'voxelize_pallas', interp):
        pal_model = module.Model(event_representation_depth=4,
                                 base_channels=8, scatter_method='pallas')
        got = pal_model.apply({'params': params}, events, timestamps,
                              sample_idx, imsize,
                              method=pal_model.quantize)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upsample2x_matches_resize():
    """The decoder's reshape-broadcast upsample is bit-identical to
    jax.image.resize(method='nearest') at the exact 2x factor it replaces
    (resize lowers to gather/scatter on TPU; the broadcast form does not)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'evflownet_net', REPO / 'EVFlowNet' / 'net.py')
    net = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(net)

    rng = np.random.default_rng(0)
    for shape in [(2, 16, 16, 8), (1, 5, 7, 3), (3, 32, 32, 2)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        B, H, W, C = shape
        ref = jax.image.resize(x, (B, 2 * H, 2 * W, C), method='nearest')
        got = net.upsample2x_nearest(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dense_params_match_nn_dense_init():
    """DenseParams reproduces nn.Dense's param tree and init values
    bit-for-bit (checkpoint compatibility guard for the kernel-MLP
    refactor, EVFlowNet/net.py DenseParams)."""
    import importlib.util
    import flax.linen as nn
    spec = importlib.util.spec_from_file_location(
        'evflownet_net_dp', REPO / 'EVFlowNet' / 'net.py')
    net = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(net)

    class DenseTwin(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(30, name='kernel_hidden1')(x)
            h = nn.Dense(30, name='kernel_hidden2')(jnp.tanh(h))
            return nn.Dense(1, name='kernel_out',
                            kernel_init=nn.initializers.normal(1e-2))(
                                jnp.tanh(h))

    class HolderTwin(nn.Module):
        @nn.compact
        def __call__(self, x):
            w1, b1 = net.DenseParams(1, 30, name='kernel_hidden1')()
            w2, b2 = net.DenseParams(30, 30, name='kernel_hidden2')()
            w3, b3 = net.DenseParams(
                30, 1, name='kernel_out',
                kernel_init=nn.initializers.normal(1e-2))()
            h = jnp.tanh(x @ w1 + b1)
            h = jnp.tanh(h @ w2 + b2)
            return h @ w3 + b3

    x = jnp.ones((4, 1), jnp.float32)
    p_dense = DenseTwin().init(jax.random.PRNGKey(7), x)['params']
    p_holder = HolderTwin().init(jax.random.PRNGKey(7), x)['params']
    flat_d = jax.tree_util.tree_leaves_with_path(p_dense)
    flat_h = jax.tree_util.tree_leaves_with_path(p_holder)
    assert [k for k, _ in flat_d] == [k for k, _ in flat_h]
    for (k, vd), (_, vh) in zip(flat_d, flat_h):
        np.testing.assert_array_equal(np.asarray(vd), np.asarray(vh),
                                      err_msg=str(k))
    # and the forward math agrees too
    y_d = DenseTwin().apply({'params': p_dense}, x)
    y_h = HolderTwin().apply({'params': p_holder}, x)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_h),
                               rtol=1e-6, atol=1e-6)


def test_kernel_mlp_pallas_matches_xla_path():
    """quantize() with the Pallas kernel-MLP (interpret mode) matches the
    XLA Dense path (both fp32) through the full quantization layer."""
    module = load_model_class(REPO / 'EVFlowNet')
    events, timestamps, sample_idx, imsize = make_inputs(
        batch_size=2, n_events=64, capacity=64)
    xla_model = module.Model(event_representation_depth=4, base_channels=8,
                             kernel_mlp='xla')
    params = xla_model.init(jax.random.PRNGKey(0), events, timestamps,
                            sample_idx, imsize)['params']
    ref = xla_model.apply({'params': params}, events, timestamps,
                          sample_idx, imsize, method=xla_model.quantize)
    pal_model = module.Model(event_representation_depth=4, base_channels=8,
                             kernel_mlp='interpret')
    got = pal_model.apply({'params': params}, events, timestamps,
                          sample_idx, imsize, method=pal_model.quantize)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_split_decoder_matches_fused():
    """Predictor(split_decoder=True) computes the same function as the
    fused-concat decoder once the per-stage flow kernel is concatenated
    back into the main conv kernel (conv over concat == sum of convs
    over the parts with the kernel split along input channels), and the
    parameter COUNT is unchanged.  Guards the layout-only claim of the
    --split-decoder knob (EVFlowNet/net.py Predictor docstring)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'evflownet_net_split', REPO / 'EVFlowNet' / 'net.py')
    net = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(net)
    from flax.core import unfreeze

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 12)), jnp.float32)
    fused = net.Predictor(base_channels=8)
    split = net.Predictor(base_channels=8, split_decoder=True)
    v_split = split.init(jax.random.PRNGKey(0), x)
    v_fused = fused.init(jax.random.PRNGKey(0), x)
    n_split = sum(v.size for v in jax.tree_util.tree_leaves(v_split))
    n_fused = sum(v.size for v in jax.tree_util.tree_leaves(v_fused))
    assert n_split == n_fused

    # graft the split weights into the fused layout: the fused dec{i}
    # kernel's input-channel slices are [x+skip | flow]
    fp = unfreeze(v_fused)['params']
    sp = unfreeze(v_split)['params']
    for name in list(fp):
        if name.startswith('dec') and not name.endswith('_flow'):
            flow_conv = sp.get(f'{name}_flow')
            fp[name]['bias'] = sp[name]['bias']
            fp[name]['kernel'] = sp[name]['kernel'] if flow_conv is None \
                else jnp.concatenate([sp[name]['kernel'],
                                      flow_conv['kernel']], axis=2)
        else:
            fp[name] = sp[name]

    flows_f, feats_f = fused.apply({'params': fp}, x)
    flows_s, feats_s = split.apply({'params': sp}, x)
    for a, b in zip(flows_f + feats_f, flows_s + feats_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # init-scale equivalence (ADVICE round 3): the standalone dec{i}_flow
    # conv must draw at the FUSED kernel's lecun std 1/sqrt((in_ch+2)*9),
    # not its own fan-in's 1/sqrt(2*9) — otherwise training from scratch
    # differs across the two layouts.
    fp0 = unfreeze(v_fused)['params']
    for name, leaf in sp.items():
        if name.endswith('_flow'):
            fused_k = fp0[name[:-len('_flow')]]['kernel']
            want = float(jnp.std(fused_k))          # lecun over full fan-in
            got = float(jnp.std(leaf['kernel']))
            assert abs(got - want) / want < 0.25, (name, got, want)
