"""Pallas fused-MLP kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monoloco_tpu.models import init_loco_params, fold_eval_params, folded_forward
from monoloco_tpu.ops import fused_loco_forward


@pytest.fixture(scope='module')
def folded():
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 3)
    return fold_eval_params(params, bn)


def test_matches_xla_f32(folded):
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 34))
    ref = folded_forward(folded, x)
    out = fused_loco_forward(folded, x, dtype=jnp.float32, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_ragged_batch_padding(folded):
    x = jax.random.normal(jax.random.PRNGKey(2), (77, 34))
    ref = folded_forward(folded, x)
    out = fused_loco_forward(folded, x, dtype=jnp.float32, tile=128, interpret=True)
    assert out.shape == (77, 9)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_stereo_shape():
    params, bn = init_loco_params(jax.random.PRNGKey(3), 68, 10, 128, 2)
    folded_s = fold_eval_params(params, bn)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 68))
    ref = folded_forward(folded_s, x)
    out = fused_loco_forward(folded_s, x, dtype=jnp.float32, tile=64, interpret=True)
    assert out.shape == (64, 10)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_rejects_unaligned_hidden():
    params, bn = init_loco_params(jax.random.PRNGKey(5), 34, 9, 96, 2)
    folded_u = fold_eval_params(params, bn)
    x = jnp.zeros((8, 34))
    with pytest.raises(ValueError):
        fused_loco_forward(folded_u, x, interpret=True)
