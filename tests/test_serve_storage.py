"""Serving weight-storage policy (MONOLOCO_TPU_SERVE_STORAGE, round 5).

Under TPU default matmul precision the MXU rounds operands to bf16 anyway;
bf16-STORED weights compute the same multiplies while streaming half the HBM
bytes per dispatch (+7.3-7.6% at 512-2048 rows, tools/serve_storage_r5.jsonl).
The policy (utils/precision.py serve_storage_bf16) must:
 - resolve 'auto' to bf16 on TPU under default/bfloat16 matmul precision —
   certified by the full-volume end-metric A/B (mono ALE delta -0.01%/+0.01%
   seeds 1-2, stereo -0.05%; tools/serve_storage_parity_r5.jsonl),
 - keep f32 under tensorfloat32 (its multiplies carry more mantissa than
   bf16 storage would preserve),
 - never cast on non-TPU backends (their matmuls are genuine f32),
 - never cast under the f32-pinned precisions (they promise f32 multiplies),
 - honor the explicit f32/bf16 overrides (bf16 only on TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monoloco_tpu.models import init_loco_params
from monoloco_tpu.network import Loco
from monoloco_tpu.utils import precision


@pytest.mark.parametrize('raw,pin,matmul,backend,expect', [
    ('auto', False, 'default', 'tpu', True),    # certified r5 (A/B above)
    ('auto', False, 'bfloat16', 'tpu', True),
    ('auto', False, 'tensorfloat32', 'tpu', False),  # tf32 > bf16 mantissa
    ('auto', False, 'default', 'cpu', False),
    ('f32', False, 'default', 'tpu', False),
    ('bf16', False, 'default', 'tpu', True),
    ('bf16', False, 'default', 'cpu', False),  # non-TPU: cast changes results
    ('bf16', True, 'float32', 'tpu', False),   # f32-pinned always wins
    ('auto', True, 'float32', 'tpu', False),
])
def test_policy_resolution(monkeypatch, raw, pin, matmul, backend, expect):
    monkeypatch.setattr(precision, '_RAW_STORAGE', raw)
    monkeypatch.setattr(precision, 'PIN_F32', pin)
    monkeypatch.setattr(precision, 'MATMUL_PRECISION', matmul)
    assert precision.serve_storage_bf16(backend) is expect


def test_policy_rejects_unknown_value(monkeypatch):
    monkeypatch.setattr(precision, '_RAW_STORAGE', 'bf8')
    with pytest.raises(ValueError, match='bf8'):
        precision.serve_storage_bf16('tpu')


def _toy_net():
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    return Loco((params, bn), mode='mono', linear_size=64, n_stage=2)


def test_engine_default_keeps_f32_storage_off_tpu():
    """The suite runs on CPU: auto must NOT cast there (genuine f32 matmuls),
    so the engine serves the f32-stored fold."""
    net = _toy_net()
    assert net.serve_storage == 'f32'
    assert net.mlp_weights['folded']['l0']['w'].dtype == jnp.float32


def test_engine_auto_casts_on_tpu(monkeypatch):
    """auto (the default) serves the bf16-stored fold on TPU under default
    matmul precision — the round-5 certified configuration."""
    import monoloco_tpu.network.engine as engine
    monkeypatch.setattr(precision, '_RAW_STORAGE', 'auto')
    monkeypatch.setattr(engine.jax, 'default_backend', lambda: 'tpu')
    net = _toy_net()
    assert net.serve_storage == 'bf16'
    assert net.mlp_weights['folded']['l0']['w'].dtype == jnp.bfloat16
    assert net.folded['l0']['w'].dtype == jnp.float32


def test_engine_bf16_storage_casts_and_serves(monkeypatch):
    """With the policy forced on (backend spoofed to 'tpu' — the suite runs
    on CPU), the engine casts the SERVED fold to bf16, keeps self.folded
    f32 for downstream consumers (int8 packing, export), reports itself via
    serve_storage, and still decodes sane outputs (CPU computes the bf16
    weights in f32 matmuls, an upper bound on the TPU numerics delta)."""
    import monoloco_tpu.network.engine as engine
    monkeypatch.setattr(precision, '_RAW_STORAGE', 'bf16')
    monkeypatch.setattr(engine.jax, 'default_backend', lambda: 'tpu')
    net = _toy_net()
    assert net.serve_storage == 'bf16'
    assert net.mlp_weights['folded']['l0']['w'].dtype == jnp.bfloat16
    assert net.folded['l0']['w'].dtype == jnp.float32

    kps = np.random.RandomState(0).rand(5, 3, 17).astype(np.float32) * 300
    kk = np.asarray([[718.3, 0, 600], [0, 718.3, 181], [0, 0, 1]], np.float32)
    out = net.forward(kps, kk)
    d_bf16 = np.asarray(out['xyzd'])[:, 3]
    assert np.all(np.isfinite(d_bf16))

    monkeypatch.setattr(precision, '_RAW_STORAGE', 'f32')
    net_f32 = _toy_net()
    d_f32 = np.asarray(net_f32.forward(kps, kk)['xyzd'])[:, 3]
    # Storage rounding only: the decoded distances stay within a few percent
    # even at random init (trained-model end metrics are the real gate).
    assert np.allclose(d_bf16, d_f32, rtol=0.05, atol=0.05)


def test_bf16_storage_composes_with_int8_packing(monkeypatch):
    """MONOLOCO_TPU_PRECISION=int8 + MONOLOCO_TPU_SERVE_STORAGE=bf16: the
    int8 stack must quantize from the F32 fold (not the bf16-rounded copy —
    double rounding would change the packed weights), while sub-floor
    dispatches serve the bf16-stored fold."""
    import monoloco_tpu.network.engine as engine
    from monoloco_tpu.ops import pack_folded_weights_w8
    monkeypatch.setattr(precision, '_RAW_STORAGE', 'bf16')
    monkeypatch.setattr(engine.jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(engine, '_INT8', True)
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 3)
    net = Loco((params, bn), mode='mono', net='monoloco_pp')
    assert net.serve_storage == 'bf16'
    assert net.mlp_weights['folded']['l0']['w'].dtype == jnp.bfloat16
    assert 'packed_int8' in net.mlp_weights
    # packed from the f32 fold: bit-identical to packing net.folded directly
    expect = pack_folded_weights_w8(net.folded)
    for got, want in zip(jax.tree_util.tree_leaves(
            net.mlp_weights['packed_int8']),
            jax.tree_util.tree_leaves(expect)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
