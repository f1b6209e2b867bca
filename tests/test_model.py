"""Model tests: shapes, BN-fold parity, torch-compatible BatchNorm semantics,
dropout scaling, checkpoint round trip."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monoloco_tpu.models import (
    init_loco_params, init_monoloco_params, loco_forward, monoloco_forward,
    fold_eval_params, folded_forward, save_checkpoint, load_checkpoint,
)
from monoloco_tpu.models.loco import _batch_norm, BN_MOMENTUM, BN_EPS


@pytest.fixture(scope='module')
def loco():
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 3)
    return params, bn


class TestLocoModel:
    def test_output_shape(self, loco):
        params, bn = loco
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 34))
        out, _ = loco_forward(params, bn, x, train=False)
        assert out.shape == (8, 9)

    def test_stereo_shape(self):
        params, bn = init_loco_params(jax.random.PRNGKey(0), 68, 10, 64, 2)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 68))
        out, _ = loco_forward(params, bn, x, train=False)
        assert out.shape == (4, 10)

    def test_monoloco_shape(self):
        params, bn = init_monoloco_params(jax.random.PRNGKey(0), 34, 2, 64, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 34))
        out, _ = monoloco_forward(params, bn, x, train=False)
        assert out.shape == (4, 2)

    def test_fold_matches_eval(self, loco):
        params, bn = loco
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 34))
        out_eval, _ = loco_forward(params, bn, x, train=False)
        folded = fold_eval_params(params, bn)
        out_folded = folded_forward(folded, x)
        np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_folded),
                                   atol=1e-4, rtol=1e-4)

    def test_train_updates_bn_state(self, loco):
        params, bn = loco
        x = jax.random.normal(jax.random.PRNGKey(3), (32, 34)) * 2 + 1
        _, new_bn = loco_forward(params, bn, x, train=True, rng=jax.random.PRNGKey(4))
        assert not np.allclose(np.asarray(new_bn['bn1']['mean']),
                               np.asarray(bn['bn1']['mean']))

    def test_masked_batch_equals_ragged(self, loco):
        """A padded batch with a row mask must produce the same outputs (on
        valid rows) and the same BN state as the unpadded batch."""
        params, bn = loco
        x = jax.random.normal(jax.random.PRNGKey(5), (10, 34))
        pad = jnp.zeros((6, 34))
        x_padded = jnp.concatenate([x, pad])
        mask = jnp.concatenate([jnp.ones(10), jnp.zeros(6)])
        rng = jax.random.PRNGKey(6)
        out_full, bn_full = loco_forward(params, bn, x, train=True, rng=rng, p_dropout=0.0)
        out_masked, bn_masked = loco_forward(params, bn, x_padded, train=True, rng=rng,
                                             p_dropout=0.0, row_mask=mask)
        np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_masked[:10]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(bn_full['bn1']['mean']),
                                   np.asarray(bn_masked['bn1']['mean']), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bn_full['bn1']['var']),
                                   np.asarray(bn_masked['bn1']['var']), atol=1e-5)


class TestBatchNorm:
    def test_torch_semantics(self):
        """Training-mode normalization uses biased batch var; running stats use
        momentum 0.1 with unbiased var (torch BatchNorm1d convention)."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, 4).astype(np.float32) * 3 + 2)
        p = {'scale': jnp.ones(4), 'bias': jnp.zeros(4)}
        s = {'mean': jnp.zeros(4), 'var': jnp.ones(4)}
        y, new_s = _batch_norm(p, s, x, train=True, row_mask=None)
        xn = np.asarray(x)
        mean, var = xn.mean(0), xn.var(0)
        np.testing.assert_allclose(np.asarray(y), (xn - mean) / np.sqrt(var + BN_EPS),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_s['mean']), BN_MOMENTUM * mean, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_s['var']),
                                   (1 - BN_MOMENTUM) + BN_MOMENTUM * xn.var(0, ddof=1),
                                   atol=1e-5)

    def test_eval_uses_running_stats(self):
        x = jnp.ones((4, 2)) * 5
        p = {'scale': jnp.ones(2) * 2, 'bias': jnp.ones(2)}
        s = {'mean': jnp.ones(2) * 3, 'var': jnp.ones(2) * 4}
        y, same_s = _batch_norm(p, s, x, train=False, row_mask=None)
        np.testing.assert_allclose(np.asarray(y), 2 * (5 - 3) / np.sqrt(4 + BN_EPS) + 1,
                                   rtol=1e-5)
        assert same_s is s


class TestDropout:
    def test_mc_dropout_varies(self, loco):
        params, bn = loco
        x = jax.random.normal(jax.random.PRNGKey(7), (4, 34))
        o1, _ = loco_forward(params, bn, x, train=False, rng=jax.random.PRNGKey(1),
                             mc_dropout=True)
        o2, _ = loco_forward(params, bn, x, train=False, rng=jax.random.PRNGKey(2),
                             mc_dropout=True)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_no_dropout_in_eval(self, loco):
        params, bn = loco
        x = jax.random.normal(jax.random.PRNGKey(8), (4, 34))
        o1, _ = loco_forward(params, bn, x, train=False)
        o2, _ = loco_forward(params, bn, x, train=False)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestCheckpoint:
    def test_round_trip(self, tmp_path, loco):
        params, bn = loco
        path = str(tmp_path / 'model.pkl')
        save_checkpoint(path, params, bn, meta={'mode': 'mono'})
        p2, b2, meta = load_checkpoint(path)
        assert meta['mode'] == 'mono'
        x = jax.random.normal(jax.random.PRNGKey(9), (4, 34))
        o1, _ = loco_forward(params, bn, x, train=False)
        o2, _ = loco_forward(p2, b2, x, train=False)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestCheckpointBackends:
    def test_pickle_roundtrip_with_meta(self, tmp_path):
        import jax
        from monoloco_tpu.models import init_loco_params
        from monoloco_tpu.models.checkpoint import save_checkpoint, load_checkpoint
        params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
        path = str(tmp_path / 'm.pkl')
        save_checkpoint(path, params, bn, meta={'net': 'monoloco_pp', 'epoch': 7})
        p2, bn2, meta = load_checkpoint(path)
        assert meta == {'net': 'monoloco_pp', 'epoch': 7}
        np.testing.assert_array_equal(np.asarray(params['w1']['w']),
                                      np.asarray(p2['w1']['w']))
        np.testing.assert_array_equal(np.asarray(bn['bn1']['mean']),
                                      np.asarray(bn2['bn1']['mean']))

    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip('orbax.checkpoint')
        import jax
        from monoloco_tpu.models import init_loco_params
        from monoloco_tpu.models.checkpoint import save_checkpoint, load_checkpoint
        params, bn = init_loco_params(jax.random.PRNGKey(1), 34, 9, 64, 2)
        path = str(tmp_path / 'm.orbax')
        save_checkpoint(path, params, bn, meta={'net': 'monoloco_pp'})
        assert os.path.isdir(path)
        p2, bn2, meta = load_checkpoint(path)
        assert meta == {'net': 'monoloco_pp'}
        np.testing.assert_array_equal(np.asarray(params['stages']['w1']['w']),
                                      np.asarray(p2['stages']['w1']['w']))
        np.testing.assert_array_equal(np.asarray(bn['stages']['bn2']['var']),
                                      np.asarray(bn2['stages']['bn2']['var']))
