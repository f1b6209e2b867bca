"""Loss tests: golden values for the Laplace NLL, composite/multitask wiring,
masked-batch equivalence, auto-tune variant."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from monoloco_tpu.train.losses import (
    laplace_loss_terms, composite_losses, multitask_loss,
    LOSS_TASKS_MONO, LOSS_TASKS_STEREO,
)


def test_laplace_golden():
    # loss = |1 - mu/x| * exp(-s) + 0.01 + s + 2
    mu, s, x = 9.0, 0.5, 10.0
    out = float(laplace_loss_terms(jnp.array([[mu, s]]), jnp.array([[x]])))
    expected = abs(1 - mu / x) * math.exp(-s) + 0.01 + s + 2
    assert math.isclose(out, expected, rel_tol=1e-5)


def test_laplace_batch_mean():
    mu_si = jnp.array([[9.0, 0.0], [11.0, 0.0]])
    x = jnp.array([[10.0], [10.0]])
    out = float(laplace_loss_terms(mu_si, x))
    expected = (abs(1 - 0.9) + abs(1 - 1.1)) / 2 + 0.01 + 2
    assert math.isclose(out, expected, rel_tol=1e-5)


def _random_batch(rng, n, stereo=False):
    out_dim = 10 if stereo else 9
    lab_dim = 11 if stereo else 10
    outputs = rng.randn(n, out_dim).astype(np.float32)
    outputs[:, 2] = np.abs(outputs[:, 2]) + 5
    labels = rng.randn(n, lab_dim).astype(np.float32)
    labels[:, 3] = np.abs(labels[:, 3]) + 5
    if stereo:
        labels[:, 10] = (rng.rand(n) > 0.5).astype(np.float32)
    return jnp.asarray(outputs), jnp.asarray(labels)


def test_composite_tasks_mono():
    rng = np.random.RandomState(0)
    outputs, labels = _random_batch(rng, 6)
    vals = composite_losses(outputs, labels, LOSS_TASKS_MONO, phase='train')
    assert len(vals) == 7
    # 'x' task is plain L1 on channel 0
    l1x = float(jnp.abs(outputs[:, 0:1] - labels[:, 0:1]).mean())
    assert math.isclose(float(vals[1]), l1x, rel_tol=1e-5)


def test_val_losses_differ_for_d_and_ori():
    rng = np.random.RandomState(1)
    outputs, labels = _random_batch(rng, 6)
    tr = composite_losses(outputs, labels, LOSS_TASKS_MONO, phase='train')
    va = composite_losses(outputs, labels, LOSS_TASKS_MONO, phase='val')
    assert not math.isclose(float(tr[0]), float(va[0]))   # laplace vs |mu-x|
    d_l1 = float(jnp.abs(outputs[:, 2:3] - labels[:, 3:4]).mean())
    assert math.isclose(float(va[0]), d_l1, rel_tol=1e-5)
    assert not math.isclose(float(tr[6]), float(va[6]))   # l1 vs degrees


def test_masked_equals_unmasked():
    rng = np.random.RandomState(2)
    outputs, labels = _random_batch(rng, 5, stereo=True)
    pad_out = jnp.concatenate([outputs, jnp.ones((3, 10))])
    pad_lab = jnp.concatenate([labels, jnp.ones((3, 11))])
    mask = jnp.concatenate([jnp.ones(5), jnp.zeros(3)])
    full, _ = multitask_loss(outputs, labels, LOSS_TASKS_STEREO,
                             (1,) * 8, phase='train')
    masked, _ = multitask_loss(pad_out, pad_lab, LOSS_TASKS_STEREO,
                               (1,) * 8, phase='train', mask=mask)
    assert math.isclose(float(full), float(masked), rel_tol=1e-5)


def test_autotune_reduces_to_sum_at_zero_sigmas():
    rng = np.random.RandomState(3)
    outputs, labels = _random_batch(rng, 6)
    lambdas = (1,) * 7
    base, _ = multitask_loss(outputs, labels, LOSS_TASKS_MONO, lambdas, phase='train')
    log_sigmas = jnp.zeros(7)
    auto, _ = multitask_loss(outputs, labels, LOSS_TASKS_MONO, lambdas, phase='train',
                             log_sigmas=log_sigmas)
    # with sigma=1: sum(l/2) + 0
    assert math.isclose(float(auto), float(base) / 2, rel_tol=1e-5)


class TestAlternateLosses:
    """Numeric checks for the unused-by-default Gaussian / weighted-L1
    alternates (reference losses.py:145-238)."""

    def test_gaussian_nll_hand_computed(self):
        import jax.numpy as jnp
        from monoloco_tpu.train.losses import gaussian_loss_terms
        mu_si = jnp.array([[10.0, 2.0], [5.0, 0.01]])   # 2nd row floors si=0.1
        x = jnp.array([[12.0], [5.0]])
        v1 = (2.0 / 2.0) ** 2 / 2 + np.log(2.0 * np.sqrt(2 * np.pi))
        v2 = 0.0 + np.log(0.1 * np.sqrt(2 * np.pi))
        assert float(gaussian_loss_terms(mu_si, x)) == pytest.approx(
            (v1 + v2) / 2, rel=1e-6)

    def test_custom_l1_weights_near_range(self):
        import jax
        import jax.numpy as jnp
        from monoloco_tpu.train.losses import custom_l1_loss
        out = jnp.array([[10.0], [70.0]])
        gt = jnp.array([[11.0], [71.0]])        # equal absolute errors
        near = float(custom_l1_loss(out[:1], gt[:1]))
        far = float(custom_l1_loss(out[1:], gt[1:]))
        assert near == pytest.approx(1.0 - 10.0 / 78.0, rel=1e-6)
        assert far == pytest.approx(1.0 - 70.0 / 78.0, rel=1e-6)
        assert near > far                        # near-range emphasis
        # the weight never vanishes (floored at 0.1) and is gradient-detached
        assert float(custom_l1_loss(jnp.array([[200.0]]),
                                    jnp.array([[201.0]]))) == pytest.approx(0.1)
        g = jax.grad(lambda o: custom_l1_loss(o, gt))(out)
        w = np.maximum(0.1, 1 - np.asarray(out) / 78.0)
        np.testing.assert_allclose(np.asarray(g), -w / 2, rtol=1e-6)
