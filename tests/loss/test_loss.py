"""Loss regression: analytic goldens, fixture goldens, torch-oracle parity.

The analytic zero case carries the same golden as the reference
(tests/loss/test_loss.py there): Charbonnier of zeros is
(1e-3^2)^0.45 ~= 0.002.  Fixture goldens below are computed for this
repository's synthetic fixtures and double-checked against the independent
torch oracle in torch_oracle.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dvs_of_training_framework_tpu.losses import MultiScaleLoss
from tests.helpers import read_test_elem


def _evaluate(images_np, timestamps_np, flow_np):
    """One-sample single-scale evaluation through MultiScaleLoss."""
    B = 1
    H, W = images_np.shape[-2:]
    evaluator = MultiScaleLoss([(H, W)])
    flow_sample_idx = jnp.zeros((B,), jnp.int32)
    sample_idx = jnp.zeros((2,), jnp.int32)
    timestamps = jnp.asarray(timestamps_np, jnp.float32)
    loss = evaluator([jnp.asarray(flow_np)],
                     timestamps.reshape(1, 2),
                     flow_sample_idx,
                     jnp.asarray(images_np),
                     timestamps,
                     sample_idx)
    assert len(loss) == 3
    return [float(term[0]) for term in loss]


def test_no_changes():
    """Zero images + zero flow: all-Charbonnier-of-zero terms."""
    H, W = 5, 6
    images = np.zeros((2, 1, H, W), np.float32)
    flow = np.zeros((1, 2, H, W), np.float32)
    got = _evaluate(images, np.array([0, 0.4]), flow)
    for i, (value, gt) in enumerate(zip(got, [0.002, 0.002, 0])):
        assert abs(value - gt) < 5e-6, i


def _fixture_case(read_pred=False):
    x0, y0, H, W = 0, 0, 246, 340
    out = read_test_elem(1, box=[y0, x0, H, W], read_pred=read_pred)
    events, start, stop, image1, image2 = out[:5]
    images = np.stack([image1, image2])[:, None].astype(np.float32)
    timestamps = np.array([0, stop - start], np.float32)
    if read_pred:
        flow = out[5].transpose(2, 0, 1)[None].astype(np.float32)
    else:
        flow = np.zeros((1, 2, H, W), np.float32)
    return images, timestamps, flow


# Goldens computed once for the synthetic fixtures of this repository and
# verified against the torch oracle (test_torch_oracle_parity).  They pin
# the loss math against regressions, like the hard-coded values in the
# reference test-suite.
GOLDEN_ZERO_FLOW = (0.0019953, 1.1095930, 0.0)
GOLDEN_PRED_FLOW = (0.0290016, 2.3335073, 1.3282926)


def test_zero_flow_fixture():
    images, timestamps, flow = _fixture_case(read_pred=False)
    got = _evaluate(images, timestamps, flow)
    for i, (value, gt) in enumerate(zip(got, GOLDEN_ZERO_FLOW)):
        assert abs(value - gt) < 5e-6, f'[{i}] {value} vs {gt}'


def test_pred_flow_fixture():
    images, timestamps, flow = _fixture_case(read_pred=True)
    got = _evaluate(images, timestamps, flow)
    for i, (value, gt) in enumerate(zip(got, GOLDEN_PRED_FLOW)):
        assert abs(value - gt) < 5e-6, f'[{i}] {value} vs {gt}'


@pytest.mark.parametrize('read_pred', [False, True])
def test_torch_oracle_parity(read_pred):
    torch = pytest.importorskip('torch')
    from tests.loss.torch_oracle import loss_terms
    images, timestamps, flow = _fixture_case(read_pred=read_pred)
    got = _evaluate(images, timestamps, flow)
    want = loss_terms(torch.tensor(images[:1]), torch.tensor(images[1:]),
                      torch.tensor(flow))
    # oracle order: (smoothness, photometric, outborder) — same as ours
    for i, (value, gt) in enumerate(zip(got, want)):
        assert abs(value - gt) < 5e-6, f'[{i}] {value} vs {gt}'


def test_multi_scale_matching():
    """Two samples, two scales: predictions match their own images."""
    torch = pytest.importorskip('torch')
    from tests.loss.torch_oracle import multi_scale_terms
    rng = np.random.default_rng(11)
    H, W = 32, 48
    B = 2
    # each sample has 2 timestamps -> D = 4
    images = rng.uniform(0, 255, size=(4, 1, H, W)).astype(np.float32)
    timestamps = np.array([0.0, 0.05, 0.0, 0.04], np.float32)
    sample_idx = np.array([0, 0, 1, 1], np.int32)
    flow_ts = np.array([[0.0, 0.05], [0.0, 0.04]], np.float32)
    flow_sample_idx = np.array([0, 1], np.int32)
    flows = [rng.normal(size=(B, 2, H // 2, W // 2)).astype(np.float32),
             rng.normal(size=(B, 2, H, W)).astype(np.float32)]

    evaluator = MultiScaleLoss([(H // 2, W // 2), (H, W)])
    got = evaluator([jnp.asarray(f) for f in flows],
                    jnp.asarray(flow_ts), jnp.asarray(flow_sample_idx),
                    jnp.asarray(images), jnp.asarray(timestamps),
                    jnp.asarray(sample_idx))

    want = multi_scale_terms([torch.tensor(f) for f in flows],
                             torch.tensor([0, 2]), torch.tensor([1, 3]),
                             torch.tensor(images))
    for term_got, term_want in zip(got, want):
        for scale_got, scale_want in zip(term_got, term_want):
            assert abs(float(scale_got) - scale_want) < 5e-5, \
                f'{float(scale_got)} vs {scale_want}'
