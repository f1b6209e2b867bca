"""Loss tests: golden values for the Laplace NLL, composite/multitask wiring,
masked-batch equivalence, auto-tune variant."""

import math

import numpy as np
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
