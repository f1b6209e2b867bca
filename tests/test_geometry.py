"""Unit tests for the geometry layer (camera, IoU, stereo) against
hand-computed golden values."""

import math

import numpy as np
import pytest

from monoloco_tpu.geometry import (
    pixel_to_camera, project_points, get_keypoints, xyz_from_distance,
    correct_angle, back_correct_angles, to_spherical, to_cartesian,
    iou_matrix, get_iou_matches, get_iou_matches_matrix, reorder_matches,
    interquartile_mask, mask_joint_disparity, average_locations,
    depth_to_pixel_error, disparity_to_depth, BF,
)

KK = [[718.3351, 0., 600.3891], [0., 718.3351, 181.5122], [0., 0., 1.]]


class TestCamera:
    def test_pixel_to_camera_analytic(self):
        # For diagonal K: x = (u - cx) / fx * z
        uv = np.array([[650.0, 200.0]])
        out = np.asarray(pixel_to_camera(uv, KK, 10))
        assert out.shape == (1, 3)
        np.testing.assert_allclose(out[0, 0], (650 - 600.3891) / 718.3351 * 10, rtol=1e-5)
        np.testing.assert_allclose(out[0, 1], (200 - 181.5122) / 718.3351 * 10, rtol=1e-5)
        np.testing.assert_allclose(out[0, 2], 10.0, rtol=1e-5)

    def test_pixel_to_camera_linear_in_z(self):
        uv = np.random.RandomState(0).rand(4, 2) * 400
        z1 = np.asarray(pixel_to_camera(uv, KK, 1))
        z5 = np.asarray(pixel_to_camera(uv, KK, 5))
        np.testing.assert_allclose(z5, 5 * z1, rtol=1e-5)

    def test_pixel_to_camera_keypoint_layout(self):
        # (m, 2, 17) channel-first layout is transposed internally
        kps = np.random.RandomState(1).rand(3, 2, 17) * 300
        out = np.asarray(pixel_to_camera(kps, KK, 10))
        assert out.shape == (3, 17, 2 + 1)
        flat = np.asarray(pixel_to_camera(kps[0].T, KK, 10))
        np.testing.assert_allclose(out[0], flat, rtol=1e-5)

    def test_project_round_trip(self):
        xyz = np.array([[1.5, -0.5, 12.0]])
        uv = np.asarray(project_points(xyz, KK))
        back = np.asarray(pixel_to_camera(uv, KK, 12.0))
        np.testing.assert_allclose(back[0, 0:2], xyz[0, 0:2], atol=1e-3)

    def test_get_keypoints_modes(self):
        kps = np.zeros((1, 3, 17))
        kps[0, 0, :] = np.arange(17)       # x: 0..16
        kps[0, 1, :] = np.arange(17) * 2   # y: 0..32
        center = np.asarray(get_keypoints(kps, 'center'))
        np.testing.assert_allclose(center, [[8.0, 16.0]])
        bottom = np.asarray(get_keypoints(kps, 'bottom'))
        np.testing.assert_allclose(bottom, [[8.0, 32.0]])
        shoulder = np.asarray(get_keypoints(kps, 'shoulder'))
        np.testing.assert_allclose(shoulder, [[5.5, 11.0]])
        hip = np.asarray(get_keypoints(kps, 'hip'))
        np.testing.assert_allclose(hip, [[11.5, 23.0]])

    def test_xyz_from_distance(self):
        centers = np.array([[0.3, 0.4, 1.0]])
        d = 10.0
        out = np.asarray(xyz_from_distance(d, centers))
        norm = np.linalg.norm(out)
        np.testing.assert_allclose(norm, 10.0, rtol=1e-5)

    def test_angle_round_trip(self):
        xyz = np.array([[2.0, 0.5, 10.0]])
        yaw_ego = 0.7
        s, c, alpha = correct_angle(yaw_ego, xyz[0])
        assert math.isclose(math.sin(alpha), s) and math.isclose(math.cos(alpha), c)
        back = np.asarray(back_correct_angles(np.array([[alpha]]), xyz))
        np.testing.assert_allclose(back[0, 0], yaw_ego, atol=1e-6)

    def test_spherical_round_trip(self):
        xyz = [3.0, -1.0, 20.0]
        rtp = to_spherical(xyz)
        back = to_cartesian(rtp)
        np.testing.assert_allclose(back, xyz, atol=1e-9)
        np.testing.assert_allclose(rtp[0], np.linalg.norm(xyz))

    def test_to_cartesian_prediction_layout(self):
        # Batched variant consumes [theta, psi, r] channels
        r, theta, psi = 15.0, 1.2, 1.4
        arr = np.array([[theta, psi, r]], dtype=np.float32)
        x = float(np.asarray(to_cartesian(arr, mode='x'))[0, 0])
        y = float(np.asarray(to_cartesian(arr, mode='y'))[0, 0])
        assert math.isclose(x, r * math.sin(psi) * math.cos(theta), rel_tol=1e-5)
        assert math.isclose(y, r * math.cos(psi), rel_tol=1e-5)


class TestIoU:
    def test_iou_matrix_golden(self):
        a = [[0, 0, 2, 2]]
        b = [[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]]
        mat = iou_matrix(a, b)
        np.testing.assert_allclose(mat[0], [1 / 7, 1.0, 0.0])

    def test_greedy_matching_confidence_order(self):
        # Two detections over one gt: the higher-confidence one wins.
        boxes = [[0, 0, 2, 2, 0.5], [0.1, 0, 2.1, 2, 0.9]]
        boxes_gt = [[0, 0, 2, 2]]
        matches = get_iou_matches(boxes, boxes_gt, iou_min=0.3)
        assert matches == [(1, 0)]

    def test_greedy_matching_first_match_wins(self):
        boxes = [[0, 0, 2, 2, 0.9], [0, 0, 2, 2, 0.8]]
        boxes_gt = [[0, 0, 2, 2], [10, 10, 12, 12]]
        matches = get_iou_matches(boxes, boxes_gt, iou_min=0.3)
        # Second detection's best gt is taken; it gets nothing (iou 0 with gt 1).
        assert matches == [(0, 0)]

    def test_matrix_matching_global_max(self):
        boxes = [[0, 0, 2, 2, 0.1], [1, 1, 3, 3, 0.9]]
        boxes_gt = [[1, 1, 3, 3]]
        matches = get_iou_matches_matrix(boxes, boxes_gt, thresh=0.1)
        assert matches == [(1, 0)]

    def test_reorder_matches_left_right(self):
        boxes = [[100, 0, 110, 10, .9], [0, 0, 10, 10, .8], [50, 0, 60, 10, .7]]
        matches = [(0, 0), (1, 1), (2, 2)]
        out = reorder_matches(matches, boxes, mode='left_right')
        assert out == [(1, 1), (2, 2), (0, 0)]


class TestStereo:
    def test_depth_pixel_error(self):
        assert math.isclose(depth_to_pixel_error(10.0, 1.0), BF / 100.0)

    def test_disparity_to_depth(self):
        z, ok = disparity_to_depth(BF / 20.0)
        assert ok and math.isclose(z, 20.0)
        z, ok = disparity_to_depth(float('nan'))
        assert not ok

    def test_interquartile_mask(self):
        dist = np.array([[1., 1.1, 0.9, 1.05, 50.0]])
        mask = interquartile_mask(dist)
        assert mask[0, :4].all() and not mask[0, 4]

    def test_mask_joint_disparity_shapes(self):
        rng = np.random.RandomState(0)
        kl = rng.rand(3, 3, 17) * 100 + 0.5
        kr = rng.rand(2, 3, 17) * 100 + 0.5
        avg, dx, dy = mask_joint_disparity(kl, kr)
        assert avg.shape == (3, 2) and dx.shape == (3, 2, 17)

    def test_mask_joint_disparity_known_median(self):
        kl = np.zeros((1, 3, 17)); kr = np.zeros((1, 3, 17))
        # disparities 9.2..12.4 (median 10.8) plus one 100-px outlier -> masked
        kl[0, 0, :] = 100.0 + np.linspace(9.2, 12.4, 17)
        kl[0, 0, 0] = 200.0
        kr[0, 0, :] = 100.0
        kl[0, 2, :] = kr[0, 2, :] = 0.9
        avg, dx, _ = mask_joint_disparity(kl, kr)
        assert np.isnan(dx[0, 0, 0])            # outlier removed by IQR
        np.testing.assert_allclose(avg[0, 0], np.median(np.linspace(9.2, 12.4, 17)[1:]))

    def test_average_locations_confidence_mask(self):
        spread = np.linspace(-2, 2, 17)  # non-degenerate IQR
        kl = np.zeros((1, 3, 17)); kl[0, 0, :] = 50.0 + spread; kl[0, 2, :] = 0.9
        kr = np.zeros((2, 3, 17)); kr[:, 0, :] = 40.0 + spread; kr[:, 2, :] = 0.9
        kr[1, 2, :] = 0.0  # all right joints below conf for pose 1
        al, ar, _, _ = average_locations(kl, kr)
        np.testing.assert_allclose(al[0], 50.0)
        np.testing.assert_allclose(ar[0], 40.0)
        assert np.isnan(ar[1])


class TestIoUMatchingFuzz:
    """Randomized cross-validation of the vectorized matchers against literal
    re-implementations of the reference loops (utils/iou.py:44-83)."""

    @staticmethod
    def _oracle_greedy(boxes, boxes_gt, iou_min):
        if not len(boxes) or not len(boxes_gt):
            return []
        confs = [b[4] for b in boxes]
        matches, used = [], []
        for idx in list(np.argsort(confs))[::-1]:
            ious = [float(iou_matrix([boxes[idx]], [g])[0, 0]) for g in boxes_gt]
            j = int(np.argmax(ious))
            if ious[j] >= iou_min and j not in used:
                matches.append((int(idx), j))
                used.append(j)
        return matches

    @staticmethod
    def _oracle_global(boxes, boxes_gt, thresh):
        mat = iou_matrix(boxes, boxes_gt)
        if not mat.size:
            return []
        mat = mat.copy()
        matches = []
        while np.max(mat) > thresh:
            i, j = np.unravel_index(np.argmax(mat), mat.shape)
            matches.append((int(i), int(j)))
            mat[i, :] = 0
            mat[:, j] = 0
        return matches

    def _random_case(self, rng):
        m, n = rng.randint(0, 7), rng.randint(0, 6)
        def boxes(k, conf):
            out = []
            for _ in range(k):
                x1, y1 = rng.rand(2) * 80
                w, h = rng.rand(2) * 40 + 1
                b = [x1, y1, x1 + w, y1 + h]
                if conf:
                    # quantized confidences force ties through the argsort
                    b.append(round(float(rng.rand()), 1))
                out.append(b)
            return out
        dets = boxes(m, conf=True)
        gts = boxes(n, conf=False)
        if m and n and rng.rand() < 0.5:
            # plant exact duplicates so perfect-IoU ties occur
            gts[0] = dets[0][:4]
            if n > 1:
                gts[1] = dets[0][:4]
        return dets, gts

    def test_greedy_matches_oracle_200_cases(self):
        rng = np.random.RandomState(7)
        for _ in range(200):
            dets, gts = self._random_case(rng)
            assert get_iou_matches(dets, gts, iou_min=0.3) == \
                self._oracle_greedy(dets, gts, 0.3)

    def test_global_max_matches_oracle_200_cases(self):
        rng = np.random.RandomState(8)
        for _ in range(200):
            dets, gts = self._random_case(rng)
            assert get_iou_matches_matrix(dets, gts, thresh=0.1) == \
                self._oracle_global(dets, gts, 0.1)


class TestHostDeviceTwins:
    """Systematic fuzz: the numpy host twins must match the jax device
    functions (the serving engine mixes both across the host/device split)."""

    def test_get_keypoints_all_modes(self):
        import jax.numpy as jnp
        from monoloco_tpu.geometry.camera import get_keypoints
        from monoloco_tpu.geometry.host import np_get_keypoints
        rng = np.random.RandomState(0)
        kps = rng.rand(5, 3, 17) * 400
        for mode in ('center', 'bottom', 'head', 'shoulder', 'hip', 'ankle'):
            np.testing.assert_allclose(
                np_get_keypoints(kps, mode),
                np.asarray(get_keypoints(jnp.asarray(kps), mode)),
                rtol=1e-5, err_msg=mode)

    def test_pixel_to_camera_and_xyz_from_distance(self):
        import jax.numpy as jnp
        from monoloco_tpu.geometry.camera import pixel_to_camera, xyz_from_distance
        from monoloco_tpu.geometry.host import (np_pixel_to_camera,
                                                np_xyz_from_distance)
        rng = np.random.RandomState(1)
        kk = np.array([[718.0, 0, 600], [0, 718.0, 180], [0, 0, 1.0]])
        uv = rng.rand(7, 2) * 800
        for z in (1.0, 10.0):
            np.testing.assert_allclose(
                np_pixel_to_camera(uv, kk, z),
                np.asarray(pixel_to_camera(jnp.asarray(uv), jnp.asarray(kk), z)),
                rtol=1e-4)
        dds = rng.rand(7) * 40 + 3
        centers = np_pixel_to_camera(uv, kk, 1.0)
        np.testing.assert_allclose(
            np_xyz_from_distance(dds, centers),
            np.asarray(xyz_from_distance(jnp.asarray(dds), jnp.asarray(centers))),
            rtol=1e-4)

    def test_preprocess_monoloco_twin(self):
        import jax.numpy as jnp
        from monoloco_tpu.network.preprocess import preprocess_monoloco
        from monoloco_tpu.geometry.host import np_preprocess_monoloco
        rng = np.random.RandomState(2)
        kps = rng.rand(4, 3, 17) * 500
        kk = np.array([[718.0, 0, 600], [0, 718.0, 180], [0, 0, 1.0]])
        for zc in (False, True):
            np.testing.assert_allclose(
                np_preprocess_monoloco(kps, kk, zero_center=zc),
                np.asarray(preprocess_monoloco(jnp.asarray(kps, jnp.float32),
                                               jnp.asarray(kk, jnp.float32),
                                               zero_center=zc)),
                rtol=2e-2, atol=2e-2)  # device matmul precision (bf16-ish)

    def test_laplace_sampling_twin_statistics(self):
        """Different RNG streams (numpy vs jax) but the same seeded
        determinism and the same Laplace(mu, |b|) distribution."""
        from monoloco_tpu.geometry.host import np_laplace_sampling
        outputs = np.array([[10.0, 1.0], [25.0, 2.0]])
        s1 = np_laplace_sampling(outputs, n_samples=4000, seed=1)
        s2 = np_laplace_sampling(outputs, n_samples=4000, seed=1)
        np.testing.assert_array_equal(s1, s2)          # deterministic
        assert s1.shape == (4000, 2)
        np.testing.assert_allclose(np.median(s1, axis=0), [10.0, 25.0], atol=0.3)
        # Laplace(b): std = sqrt(2) * b
        np.testing.assert_allclose(s1.std(axis=0),
                                   np.sqrt(2) * np.array([1.0, 2.0]), rtol=0.1)
