"""Inference-engine tests on CPU: bucketing invariance, stereo filtering,
MC dropout, post-processing contract, decode round trips."""

import numpy as np
import jax
import pytest

from monoloco_tpu.models import init_loco_params, init_monoloco_params, save_checkpoint
from monoloco_tpu.network import Loco, preprocess_pifpaf
from monoloco_tpu.network.decode import cluster_outputs, filter_outputs

KK = [[718.3351, 0., 600.3891], [0., 718.3351, 181.5122], [0., 0., 1.]]


def _keypoints(m, seed=0):
    rng = np.random.RandomState(seed)
    kps = rng.rand(m, 3, 17).astype(np.float32)
    kps[:, 0] = kps[:, 0] * 800 + 200
    kps[:, 1] = kps[:, 1] * 200 + 80
    kps[:, 2] = 0.8
    return kps


@pytest.fixture(scope='module')
def mono_net():
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    return Loco((params, bn), mode='mono', linear_size=64, n_stage=2)


@pytest.fixture(scope='module')
def stereo_net():
    params, bn = init_loco_params(jax.random.PRNGKey(1), 68, 10, 64, 2)
    return Loco((params, bn), mode='stereo', linear_size=64, n_stage=2)


class TestMonoForward:
    def test_output_keys(self, mono_net):
        dic = mono_net.forward(_keypoints(5), KK)
        for key in ('xyzd', 'd', 'bi', 'h', 'w', 'l', 'ori', 'yaw', 'epi'):
            assert key in dic
        assert dic['d'].shape == (5, 1)
        assert dic['xyzd'].shape == (5, 4)

    def test_bucketing_invariance(self, mono_net):
        """Results must not depend on the padding bucket."""
        kps = _keypoints(5)
        d5 = mono_net.forward(kps, KK)
        d3 = mono_net.forward(kps[:3], KK)
        np.testing.assert_allclose(d5['d'][:3], d3['d'], atol=1e-5)

    def test_empty_returns_none(self, mono_net):
        assert mono_net.forward([], KK) is None

    def test_mc_dropout_epi(self):
        params, bn = init_loco_params(jax.random.PRNGKey(2), 34, 9, 64, 2)
        net = Loco((params, bn), mode='mono', linear_size=64, n_stage=2, n_dropout=2)
        dic = net.forward(_keypoints(3), KK)
        epi = np.asarray(dic['epi'])
        assert epi.shape == (3,)
        assert (epi > 0).all()


class TestStereoForward:
    def test_stereo_keys_include_aux(self, stereo_net):
        dic = stereo_net.forward(_keypoints(4), KK, keypoints_r=_keypoints(3, seed=1))
        assert 'aux' in dic
        assert dic['d'].shape == (4, 1)

    def test_missing_right_falls_back(self, stereo_net):
        dic = stereo_net.forward(_keypoints(4), KK, keypoints_r=None)
        assert dic['d'].shape == (4, 1)

    def test_padding_does_not_change_argmax(self, stereo_net):
        kps = _keypoints(4)
        kps_r3 = _keypoints(3, seed=1)
        d_a = stereo_net.forward(kps, KK, keypoints_r=kps_r3)
        # Same right poses plus none: identical because r=3 pads to bucket 4.
        d_b = stereo_net.forward(kps, KK, keypoints_r=kps_r3[:3])
        np.testing.assert_allclose(d_a['d'], d_b['d'], atol=1e-6)


class TestLegacyNets:
    def test_monoloco_p(self):
        params, bn = init_monoloco_params(jax.random.PRNGKey(4), 34, 9, 256, 3)
        net = Loco((params, bn), mode='mono', net='monoloco_p')
        dic = net.forward(_keypoints(3), KK)
        for key in ('xyz', 'zb', 'xyzd', 'd', 'bi', 'yaw'):
            assert key in dic
        assert dic['xyzd'].shape == (3, 4)

    def test_monoloco_legacy(self):
        params, bn = init_monoloco_params(jax.random.PRNGKey(5), 34, 2, 256, 3)
        net = Loco((params, bn), mode='mono', net='monoloco')
        dic = net.forward(_keypoints(3), KK)
        assert dic['d'].shape == (3, 1)
        assert dic['bi'].shape == (3, 1)
        # post_process works without yaw/aux keys
        boxes = [[100, 80, 200, 280, 0.9]] * 3
        out = net.post_process(dic, boxes, _keypoints(3), KK)
        assert len(out['dds_pred']) == 3
        assert 'angles' not in out or not out['angles']


class TestClusterFilter:
    def test_cluster_filter_selects_max_aux(self):
        rng = np.random.RandomState(0)
        out = rng.randn(6, 10).astype(np.float32)
        clustered = cluster_outputs(out, 3)
        assert clustered.shape == (2, 3, 10)
        selected, mask = filter_outputs(clustered)
        for i in range(2):
            best = int(np.argmax(np.asarray(clustered)[i, :, -1]))
            np.testing.assert_allclose(np.asarray(selected)[i],
                                       np.asarray(clustered)[i, best])
            assert np.asarray(mask)[i, best]


class TestPostProcess:
    def test_contract_keys(self, mono_net):
        kps = _keypoints(4)
        boxes = [[100, 80, 200, 280, 0.9], [300, 80, 400, 280, 0.8],
                 [500, 80, 600, 280, 0.7], [700, 80, 800, 280, 0.95]]
        dic = mono_net.forward(kps, KK)
        out = mono_net.post_process(dic, boxes, kps, KK)
        assert len(out['dds_pred']) == 4
        assert len(out['xyz_pred'][0]) == 3
        assert len(out['confs']) == 4
        assert out['gt'] == [False] * 4

    def test_gt_matching(self, mono_net):
        kps = _keypoints(2)
        boxes = [[100, 80, 200, 280, 0.9], [500, 80, 600, 280, 0.8]]
        dic_gt = {'boxes': [[105, 82, 198, 278]],
                  'ys': [[0, 0, 0, 12.5, 0, 0, 0, 0, 0, 0]]}
        dic = mono_net.forward(kps, KK)
        out = mono_net.post_process(dic, boxes, kps, KK, dic_gt=dic_gt)
        assert out['gt'][0] is True or out['gt'][0] == True  # noqa: E712
        assert out['dds_real'] == [12.5]
        assert len(out['boxes_gt']) == 1


class TestCheckpointServing:
    def test_save_then_serve(self, tmp_path):
        params, bn = init_loco_params(jax.random.PRNGKey(3), 34, 9, 64, 2)
        path = str(tmp_path / 'm.pkl')
        save_checkpoint(path, params, bn)
        net = Loco(path, mode='mono', linear_size=64, n_stage=2)
        dic = net.forward(_keypoints(2), KK)
        assert dic['d'].shape == (2, 1)


class TestForwardBatch:
    def test_matches_per_image_forward(self, mono_net):
        kps_list = [_keypoints(3, seed=1), _keypoints(7, seed=2), _keypoints(1, seed=3)]
        kk2 = [[700., 0., 590.], [0., 700., 170.], [0., 0., 1.]]
        kks = [KK, kk2, KK]
        batch_out = mono_net.forward_batch(kps_list, kks)
        for kps, kk, out_b in zip(kps_list, kks, batch_out):
            out_s = mono_net.forward(kps, kk)
            np.testing.assert_allclose(np.asarray(out_b['d']),
                                       np.asarray(out_s['d']), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out_b['xyzd']),
                                       np.asarray(out_s['xyzd']), atol=1e-4)

    def test_empty_image_in_batch(self, mono_net):
        outs = mono_net.forward_batch([_keypoints(2), []], [KK, KK])
        assert outs[0]['d'].shape == (2, 1)
        assert outs[1] is None

    def test_mc_dropout_epi_matches_per_image(self):
        """Batched epistemic MC-dropout equals the per-image path when the
        detection buckets coincide (dropout/sampling draws depend on the
        padded shape, so per-image buckets of 4 vs a batch bucket of 4 share
        the PRNGKey(0) stream exactly; differing buckets agree only in
        distribution — same as the per-image path across crowd sizes)."""
        params, bn = init_loco_params(jax.random.PRNGKey(2), 34, 9, 64, 2)
        net = Loco((params, bn), mode='mono', linear_size=64, n_stage=2,
                   n_dropout=2)
        kps_list = [_keypoints(3, seed=1), _keypoints(4, seed=2)]
        kks = [KK, [[700., 0., 590.], [0., 700., 170.], [0., 0., 1.]]]
        batch_out = net.forward_batch(kps_list, kks)
        for kps, kk, out_b in zip(kps_list, kks, batch_out):
            epi_b = np.asarray(out_b['epi'])
            epi_s = np.asarray(net.forward(kps, kk)['epi'])
            assert (epi_b > 0).all()
            np.testing.assert_allclose(epi_b, epi_s, rtol=2e-4)

    def test_empty_batch(self, mono_net):
        assert mono_net.forward_batch([], []) == []

    def test_stereo_matches_per_image_forward(self, stereo_net):
        """Batched MonStereo (vmapped all-vs-all + aux argmax) must reproduce
        the per-image stereo forward across mixed crowd/right-candidate sizes,
        including an image with no right detections."""
        kps_list = [_keypoints(3, seed=1), _keypoints(6, seed=2),
                    _keypoints(2, seed=3)]
        kps_r_list = [_keypoints(4, seed=4), None, _keypoints(2, seed=5)]
        kk2 = [[700., 0., 590.], [0., 700., 170.], [0., 0., 1.]]
        kks = [KK, kk2, KK]
        batch_out = stereo_net.forward_batch(kps_list, kks, kps_r_list)
        for kps, kps_r, kk, out_b in zip(kps_list, kps_r_list, kks, batch_out):
            out_s = stereo_net.forward(kps, kk, keypoints_r=kps_r)
            np.testing.assert_allclose(np.asarray(out_b['d']),
                                       np.asarray(out_s['d']), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out_b['aux']),
                                       np.asarray(out_s['aux']), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out_b['xyzd']),
                                       np.asarray(out_s['xyzd']), atol=1e-4)

    def test_stereo_empty_image_in_batch(self, stereo_net):
        outs = stereo_net.forward_batch([_keypoints(2), []], [KK, KK],
                                        [_keypoints(3), None])
        assert outs[0]['d'].shape == (2, 1)
        assert outs[1] is None
