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


class TestInt8Kernel:
    """Static-calibrated a8w8 fused kernel — ablation only (NOT what
    MONOLOCO_TPU_PRECISION=int8 serves; see TestDyn8AndW8Kernels). Accuracy
    asserted on IN-CALIBRATION data — the regime where static scales hold."""

    @pytest.fixture(scope='class')
    def setup(self):
        from monoloco_tpu.ops import pack_folded_weights_int8
        params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 3)
        folded = fold_eval_params(params, bn)
        calib = jax.random.normal(jax.random.PRNGKey(9), (512, 34))
        packed = pack_folded_weights_int8(folded, calib)
        return folded, packed, calib

    def test_packed_layout(self, setup):
        _, packed, _ = setup
        w0, b0, wq, inv_in, oscale, bstack, waux, baux, wfin, bfin = packed
        assert wq.dtype == jnp.int8 and wq.shape == (8, 128, 128)
        assert inv_in.shape == (8,) and oscale.shape == (8, 128)
        assert bstack.shape == (8, 128)
        assert w0.dtype == jnp.bfloat16 and wfin.shape == (128, 8)

    def test_tracks_f32_within_quant_tolerance(self, setup):
        """Same accuracy budget as the XLA int8 path (tests above): decoded
        raw outputs within a few percent of f32 on in-calibration data."""
        from monoloco_tpu.ops import fused_loco_forward_int8
        folded, packed, calib = setup
        x = calib[:256]
        ref = np.asarray(folded_forward(folded, x))
        out = np.asarray(fused_loco_forward_int8(packed, x, tile=128,
                                                 interpret=True))
        assert out.shape == ref.shape
        rel = np.abs(out - ref) / np.maximum(np.abs(ref), 0.5)
        assert rel.mean() < 0.05, rel.mean()

    def test_matches_xla_int8_streamed_semantics(self, setup):
        """The kernel's streamed matmuls quantize with the SAME scales as the
        XLA int8 path; residual stream in f32. Differences vs quantized_forward
        come only from l0/heads kept bf16 in-kernel — small and bounded."""
        from monoloco_tpu.ops import fused_loco_forward_int8
        from monoloco_tpu.ops.quant import quantize_folded, quantized_forward
        folded, packed, calib = setup
        x = calib[:128]
        q = quantize_folded(folded, calib)
        ref_q = np.asarray(quantized_forward(q, x))
        out = np.asarray(fused_loco_forward_int8(packed, x, tile=128,
                                                 interpret=True))
        rel = np.abs(out - ref_q) / np.maximum(np.abs(ref_q), 0.5)
        assert rel.mean() < 0.03, rel.mean()

    def test_ragged_batch_padding(self, setup):
        from monoloco_tpu.ops import fused_loco_forward_int8
        folded, packed, calib = setup
        out = fused_loco_forward_int8(packed, calib[:77], tile=128,
                                      interpret=True)
        full = fused_loco_forward_int8(packed, calib[:128], tile=128,
                                       interpret=True)
        assert out.shape == (77, 9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full)[:77],
                                   atol=1e-5)


class TestDyn8AndW8Kernels:
    """Round-4 kernel family: pack_folded_weights_w8 feeds both the
    weight-only (w8a16) and the per-row dynamic-int8 serving kernels.
    Neither takes calibration data — the accuracy must hold on ANY input
    distribution (the static-calibrated kernel's failure mode, see
    ops/fused_mlp.py module note)."""

    @pytest.fixture(scope='class')
    def setup(self):
        from monoloco_tpu.ops import pack_folded_weights_w8
        params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 3)
        folded = fold_eval_params(params, bn)
        return folded, pack_folded_weights_w8(folded)

    def test_packed_layout(self, setup):
        _, packed = setup
        w0, b0, wq, inv_in, oscale, bstack, waux, baux, wfin, bfin = packed
        assert wq.dtype == jnp.int8 and wq.shape == (8, 128, 128)
        assert inv_in.shape == (8,)                  # unused placeholder
        np.testing.assert_array_equal(np.asarray(inv_in), 1.0)
        assert oscale.shape == (8, 128) and bstack.shape == (8, 128)
        assert w0.dtype == jnp.bfloat16

    def test_dyn8_tracks_f32_under_distribution_shift(self, setup):
        """Per-row scales are computed from the data itself, so a 50x input
        rescale must NOT degrade quantization accuracy (static calibration
        fails exactly here: ~13x scale overestimate => ~3.3 effective bits).
        Use mean|err|/mean|ref| — exactly scale-invariant, no per-element
        denominator floor to distort the comparison — and assert the two
        scales agree within 2x, plus an absolute budget."""
        from monoloco_tpu.ops import fused_loco_forward_dyn8
        folded, packed = setup

        def mean_rel(scale):
            x = jax.random.normal(jax.random.PRNGKey(11), (256, 34)) * scale
            ref = np.asarray(folded_forward(folded, x))
            out = np.asarray(fused_loco_forward_dyn8(packed, x, tile=128,
                                                     interpret=True))
            return np.abs(out - ref).mean() / np.abs(ref).mean()

        r1, r50 = mean_rel(1.0), mean_rel(50.0)
        assert r1 < 0.02, r1
        assert r50 < 0.02, r50
        assert r50 < 2.0 * max(r1, 1e-3) and r1 < 2.0 * max(r50, 1e-3), (r1, r50)

    def test_w8_tracks_f32_tightly(self, setup):
        from monoloco_tpu.ops import fused_loco_forward_w8
        folded, packed = setup
        x = jax.random.normal(jax.random.PRNGKey(12), (256, 34))
        ref = np.asarray(folded_forward(folded, x))
        out = np.asarray(fused_loco_forward_w8(packed, x, tile=128,
                                               interpret=True))
        rel = np.abs(out - ref) / np.maximum(np.abs(ref), 0.5)
        assert rel.mean() < 0.005, rel.mean()

    def test_dyn8_ragged_batch_padding(self, setup):
        from monoloco_tpu.ops import fused_loco_forward_dyn8
        _, packed = setup
        x = jax.random.normal(jax.random.PRNGKey(13), (128, 34))
        out = fused_loco_forward_dyn8(packed, x[:77], tile=128, interpret=True)
        full = fused_loco_forward_dyn8(packed, x, tile=128, interpret=True)
        assert out.shape == (77, 9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full)[:77],
                                   atol=1e-5)


class TestEngineInt8Routing:
    """MONOLOCO_TPU_PRECISION=int8 routing inside Loco (flag monkeypatched —
    the env var is read once at import)."""

    def _net(self, mesh=None):
        from monoloco_tpu.network.engine import Loco
        params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 3)
        return Loco(model=(params, bn), mode='mono', net='monoloco_pp',
                    mesh=mesh)

    def test_packs_dyn8_weights_and_routes_large_batches(self, monkeypatch):
        from monoloco_tpu.network import engine
        monkeypatch.setattr(engine, '_INT8', True)
        net = self._net()
        assert 'packed_int8' in net.mlp_weights
        assert net.mlp_weights['packed_int8'][2].dtype == jnp.int8
        # >= _INT8_MIN_ROWS routes through the kernel; the decoded output
        # must stay close to the XLA path.
        x = jax.random.normal(jax.random.PRNGKey(1), (engine._INT8_MIN_ROWS, 34))
        out_kernel = np.asarray(engine._mlp_forward(net.mlp_weights, x, 'loco'))
        out_xla = np.asarray(engine._mlp_forward(net.folded, x, 'loco'))
        rel = np.abs(out_kernel - out_xla) / np.maximum(np.abs(out_xla), 0.5)
        assert rel.mean() < 0.02, rel.mean()
        # below the threshold the XLA path is exact
        small = np.asarray(engine._mlp_forward(net.mlp_weights, x[:8], 'loco'))
        np.testing.assert_allclose(small, out_xla[:8], atol=1e-5)

    def test_tp_mesh_disables_int8_with_warning(self, monkeypatch):
        """A pallas_call has no GSPMD rule, so a mesh with a non-trivial
        'model' axis refuses int8 (bf16 XLA remains fully partitionable)."""
        from monoloco_tpu.network import engine
        from monoloco_tpu.parallel import make_mesh_2d
        monkeypatch.setattr(engine, '_INT8', True)
        mesh = make_mesh_2d(dp=1, tp=2)
        with pytest.warns(RuntimeWarning, match='ignored under a device mesh'):
            net = self._net(mesh=mesh)
        assert 'packed_int8' not in net.mlp_weights

    def test_dp_mesh_serves_int8_via_shard_map(self, monkeypatch):
        """Data-parallel-only meshes serve the fused kernel: the batch
        program wraps in shard_map over 'data', each device running the
        single-chip kernel on its local image shard. The sharded int8 batch
        output must match the unsharded int8 path exactly (same kernel, same
        per-shard rows) and track the bf16 XLA path within quant tolerance."""
        from monoloco_tpu.network import engine
        from monoloco_tpu.parallel import make_mesh
        monkeypatch.setattr(engine, '_INT8', True)
        # Shrink the routing gate so CI-size batches exercise the kernel.
        monkeypatch.setattr(engine, '_INT8_MIN_ROWS', 8)
        mesh = make_mesh(jax.devices()[:4])
        net_mesh = self._net(mesh=mesh)
        assert 'packed_int8' in net_mesh.mlp_weights
        net_single = self._net()
        rng = np.random.RandomState(7)
        kps = [rng.rand(3, 3, 17).astype(np.float32) * 200 for _ in range(6)]
        kks = [np.array([[720., 0., 600.], [0., 720., 180.], [0., 0., 1.]],
                        np.float32)] * 6
        out_mesh = net_mesh.forward_batch(kps, kks)
        out_single = net_single.forward_batch(kps, kks)
        net_bf16 = self._net()
        net_bf16.mlp_weights = {'folded': net_bf16.folded}   # force XLA path
        out_xla = net_bf16.forward_batch(kps, kks)
        for i in range(6):
            np.testing.assert_allclose(out_mesh[i]['xyzd'],
                                       out_single[i]['xyzd'],
                                       rtol=0, atol=1e-5)
            d_mesh = np.asarray(out_mesh[i]['xyzd'])[:, 3]
            d_xla = np.asarray(out_xla[i]['xyzd'])[:, 3]
            rel = np.abs(d_mesh - d_xla) / np.maximum(np.abs(d_xla), 0.5)
            assert rel.mean() < 0.03, rel.mean()
        # The engagement counter mirrors the PER-SHARD routing the traced
        # program actually took (local rows 8/4 img * 4 kps = 8 >= floor 8).
        assert net_mesh.n_dispatches_int8 == net_mesh.n_dispatches == 1

    def test_dp_mesh_counters_track_per_shard_routing(self, monkeypatch):
        """Routing is decided at trace time on the PER-DEVICE shard inside
        shard_map, so a dispatch whose GLOBAL rows clear _INT8_MIN_ROWS but
        whose local shard does not runs bf16 — and the host counters (what
        /healthz and /metrics export) must say so, not report 'active'."""
        from monoloco_tpu.network import engine
        from monoloco_tpu.parallel import make_mesh
        monkeypatch.setattr(engine, '_INT8', True)
        # 6 images x 3 kps -> b_bucket 8, m_bucket 4: global rows 32 clear a
        # floor of 16, but each of the 4 shards sees only 2*4 = 8 rows.
        monkeypatch.setattr(engine, '_INT8_MIN_ROWS', 16)
        mesh = make_mesh(jax.devices()[:4])
        net_mesh = self._net(mesh=mesh)
        assert 'packed_int8' in net_mesh.mlp_weights
        rng = np.random.RandomState(7)
        kps = [rng.rand(3, 3, 17).astype(np.float32) * 200 for _ in range(6)]
        kks = [np.array([[720., 0., 600.], [0., 720., 180.], [0., 0., 1.]],
                        np.float32)] * 6
        out_mesh = net_mesh.forward_batch(kps, kks)
        assert net_mesh.n_dispatches == 1
        assert net_mesh.n_dispatches_int8 == 0   # dormant, and reported so
        # And the outputs really are the exact bf16 XLA path, per shard.
        net_bf16 = self._net()
        net_bf16.mlp_weights = {'folded': net_bf16.folded}
        out_xla = net_bf16.forward_batch(kps, kks)
        for i in range(6):
            np.testing.assert_allclose(out_mesh[i]['xyzd'],
                                       out_xla[i]['xyzd'],
                                       rtol=0, atol=1e-5)


def test_dyn8_batch_size_independent(folded):
    """Per-ROW dynamic quantization has no batch-size failure mode: row i's
    output depends only on row i (its own row-max scale, its own matmul
    rows), so the SAME rows produce bit-identical results whether dispatched
    as a small batch or embedded in a large one. This is the numerics leg of
    the routing-floor decision (engine._INT8_MIN_ROWS is a measured SPEED
    crossover, not a numerics gate — engine.py:75)."""
    from monoloco_tpu.ops import pack_folded_weights_w8, fused_loco_forward_dyn8
    packed = pack_folded_weights_w8(folded)
    big = jax.random.normal(jax.random.PRNGKey(7), (512, 34))
    out_big = np.asarray(
        fused_loco_forward_dyn8(packed, big, tile=128, interpret=True))
    for m in (8, 32, 128):
        out_small = np.asarray(fused_loco_forward_dyn8(
            packed, big[:m], tile=128, interpret=True))
        np.testing.assert_array_equal(out_small, out_big[:m])


def test_dyn8_resident_matches_streaming(folded):
    """The VMEM-resident dyn8 flavor is numerically identical to the served
    streaming flavor (same _int8_mm math, different weight residency)."""
    from monoloco_tpu.ops import (pack_folded_weights_w8,
                                  fused_loco_forward_dyn8,
                                  fused_loco_forward_dyn8_resident)
    packed = pack_folded_weights_w8(folded)
    x = jax.random.normal(jax.random.PRNGKey(11), (96, 34))
    out_s = np.asarray(fused_loco_forward_dyn8(packed, x, tile=32,
                                               interpret=True))
    out_r = np.asarray(fused_loco_forward_dyn8_resident(packed, x, tile=32,
                                                        interpret=True))
    np.testing.assert_array_equal(out_s, out_r)


def test_dyn8_auto_picks_resident_within_budget(folded):
    """The served entry point (fused_loco_forward_dyn8_auto) routes to the
    VMEM-resident flavor exactly when the int8 stack fits the 16 MB budget:
    true at every trainable hidden size (flagship 1024 = 8 MB), false above
    ~1408 where the double-buffered streaming kernel takes over."""
    from monoloco_tpu.ops import (pack_folded_weights_w8,
                                  dyn8_resident_eligible,
                                  fused_loco_forward_dyn8_auto,
                                  fused_loco_forward_dyn8_resident)
    packed = pack_folded_weights_w8(folded)
    assert dyn8_resident_eligible(packed)
    x = jax.random.normal(jax.random.PRNGKey(13), (64, 34))
    out_auto = np.asarray(fused_loco_forward_dyn8_auto(packed, x, tile=32,
                                                       interpret=True))
    out_r = np.asarray(fused_loco_forward_dyn8_resident(packed, x, tile=32,
                                                        interpret=True))
    np.testing.assert_array_equal(out_auto, out_r)
    # An over-budget stack (shape-only check, no compute): 8 x 2048^2 = 32 MB.
    big_stack = jnp.zeros((8, 2048, 2048), jnp.int8)
    fake = (jnp.zeros((34, 2048), jnp.bfloat16), None, big_stack)
    assert not dyn8_resident_eligible(fake)
