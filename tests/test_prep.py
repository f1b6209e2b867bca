"""Prep transforms and stereo-match selection tests."""

import math

import numpy as np

from monoloco_tpu.prep.transforms import (
    flip_inputs, flip_labels, height_augmentation, HFLIP_INDEX, BF, BASELINE,
)
from monoloco_tpu.geometry import extract_stereo_matches, to_spherical


class TestFlip:
    def test_hflip_index_involution(self):
        assert (HFLIP_INDEX[HFLIP_INDEX] == np.arange(17)).all()

    def test_flip_inputs_keypoints(self):
        rng = np.random.RandomState(0)
        kps = rng.rand(2, 3, 17) * 300
        im_w = 1238
        flipped = np.array(flip_inputs(kps.tolist(), im_w))
        # x mirrored and joints permuted
        np.testing.assert_allclose(flipped[:, 0, :], (im_w - kps[:, 0, :])[:, HFLIP_INDEX])
        np.testing.assert_allclose(flipped[:, 1, :], kps[:, 1, :][:, HFLIP_INDEX])
        # double flip is identity
        back = np.array(flip_inputs(flipped.tolist(), im_w))
        np.testing.assert_allclose(back, kps, atol=1e-9)

    def test_flip_inputs_boxes(self):
        boxes = [[100.0, 50.0, 300.0, 250.0, 0.9]]
        out = flip_inputs(boxes, im_w=1000, mode='box')
        assert out[0][0] == 1000 - 300 and out[0][2] == 1000 - 100
        assert out[0][1] == 50 and out[0][3] == 250

    def test_flip_labels_geometry(self):
        # A person at x=2, z=10: flipped x should be -2 + baseline.
        xyz = [2.0, 0.5, 10.0]
        rtp = to_spherical(xyz)
        label = rtp[1:3] + [xyz[2]] + rtp[0:1] + [1.8, 0.7, 0.8] + [0.1, 0.99, 0.5]
        boxes = [[100., 50., 200., 250.]]
        boxes_f, labels_f = flip_labels(boxes, [label], im_w=1238)
        # recover flipped x from spherical label
        lf = labels_f[0]
        x_f = lf[3] * math.sin(lf[1]) * math.cos(lf[0])
        np.testing.assert_allclose(x_f, -2.0 + BASELINE, atol=1e-6)
        # z unchanged
        z_f = lf[3] * math.sin(lf[1]) * math.sin(lf[0])
        np.testing.assert_allclose(z_f, 10.0, atol=1e-6)
        # box shifted by disparity
        disp = BF / 10.0
        np.testing.assert_allclose(boxes_f[0][0], 1238 - 200 + disp)


class TestHeightAugmentation:
    def _label(self, z=10.0, s_match=1):
        xyz = [1.0, 0.3, z]
        rtp = to_spherical(xyz)
        return rtp[1:3] + [z] + rtp[0:1] + [1.8, 0.7, 0.8, 0.1, 0.99, 0.5, s_match]

    def test_positive_match_produces_four(self):
        kps = np.random.RandomState(0).rand(1, 3, 17) * 100
        kps_r = kps - np.array([10.0, 0, 0]).reshape(1, 3, 1)
        label = self._label(s_match=1)
        kps_aug, labels_aug = height_augmentation(kps, kps_r, label, seed=3)
        assert len(kps_aug) == 4 and len(labels_aug) == 4
        # last entry keeps the original
        np.testing.assert_allclose(labels_aug[-1], label)
        np.testing.assert_allclose(kps_aug[-1][1], kps_r)

    def test_negative_match_produces_two(self):
        kps = np.random.RandomState(1).rand(1, 3, 17) * 100
        label = self._label(s_match=0)
        kps_aug, labels_aug = height_augmentation(kps, kps.copy(), label, seed=5)
        assert len(kps_aug) == 2

    def test_deterministic_given_seed(self):
        kps = np.random.RandomState(2).rand(1, 3, 17) * 100
        label = self._label()
        _, l1 = height_augmentation(kps, kps.copy(), label, seed=7)
        _, l2 = height_augmentation(kps, kps.copy(), label, seed=7)
        np.testing.assert_allclose(l1, l2)

    def test_disparity_consistent_with_new_depth(self):
        kps = np.random.RandomState(3).rand(1, 3, 17) * 100 + 50
        kps_r = kps - np.array([BF / 10.0, 0, 0]).reshape(1, 3, 1)
        label = self._label(z=10.0, s_match=1)
        kps_aug, labels_aug = height_augmentation(kps, kps_r, label, seed=11)
        for (kp, kp_r), lab in zip(kps_aug[:-1], labels_aug[:-1]):
            z_new = lab[2]
            if z_new == 10.0:  # skipped (z<2) entries keep original
                continue
            disp_new = np.median(np.asarray(kp)[0, 0, :] - np.asarray(kp_r)[0, 0, :])
            np.testing.assert_allclose(disp_new, BF / z_new, rtol=1e-6)


class TestStereoMatches:
    def test_true_match_selected(self):
        rng = np.random.RandomState(0)
        zz = 10.0
        kps = rng.rand(1, 3, 17) * 100 + 200
        kps[0, 2, :] = 0.9
        kps[0, 0, :] += np.linspace(-1, 1, 17)  # non-degenerate IQR
        # True right pose at correct disparity; distractor far away.
        kps_true = kps.copy(); kps_true[0, 0, :] -= BF / zz
        kps_far = kps.copy(); kps_far[0, 0, :] -= 300
        kps_r = np.concatenate([kps_far, kps_true])
        matches, _ = extract_stereo_matches(kps, kps_r, zz, phase='val')
        assert (1, 1) in matches

    def test_train_emits_negatives(self):
        rng = np.random.RandomState(1)
        zz = 8.0
        kps = rng.rand(1, 3, 17) * 100 + 300
        kps[0, 2, :] = 0.9
        kps[0, 0, :] += np.linspace(-1.5, 1.5, 17)
        kps_true = kps.copy(); kps_true[0, 0, :] -= BF / zz
        kps_near = kps.copy(); kps_near[0, 0, :] -= BF / zz + 15
        kps_r = np.concatenate([kps_true, kps_near])
        matches, _ = extract_stereo_matches(kps, kps_r, zz, phase='train', seed=0)
        flags = {f for _, f in matches}
        assert 1 in flags  # the true pair is found
