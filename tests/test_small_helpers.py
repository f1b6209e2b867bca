"""Remaining small helpers: transform_kp ablation warps, simplified
calibration parsing, gt rewrite, pedestrian-vs-cyclist categorization."""

import json
import os

import numpy as np
import pytest


def _pose():
    rng = np.random.RandomState(0)
    xs = (600 + rng.uniform(-30, 30, 17)).tolist()
    ys = (200 + rng.uniform(-80, 80, 17)).tolist()
    return [xs, ys, [0.9] * 17]


class TestTransformKp:

    def test_none_is_identity(self):
        from monoloco_tpu.geometry import transform_kp
        kps = _pose()
        assert transform_kp(kps, 'None') is kps

    def test_collapse_modes(self):
        from monoloco_tpu.geometry import transform_kp
        from monoloco_tpu.geometry.host import np_get_keypoints
        kps = _pose()
        cx, cy = np_get_keypoints(np.asarray(kps)[None], 'center')[0]
        sing = transform_kp(kps, 'singularity')
        assert sing[0] == [pytest.approx(cx)] * 17
        assert sing[1] == [pytest.approx(cy)] * 17
        vert = transform_kp(kps, 'vertical')
        assert vert[0] == [pytest.approx(cx)] * 17 and vert[1] == kps[1]
        horiz = transform_kp(kps, 'horizontal')
        assert horiz[0] == kps[0] and horiz[1] == [pytest.approx(cy)] * 17
        assert len(sing) == 4 and sing[3] == []   # reference output shape

    def test_partial_and_seeded_modes(self):
        from monoloco_tpu.geometry import transform_kp
        kps = _pose()
        shoulder = transform_kp(kps, 'shoulder')
        assert shoulder[1][:7] == kps[1][:7]
        assert shoulder[1][7:] == [kps[1][6]] * 10
        up = transform_kp(kps, 'up')
        assert up[1] == [pytest.approx(v - 300) for v in kps[1]]
        r1 = transform_kp(kps, 'random')
        r2 = transform_kp(kps, 'random')
        assert r1[0] == r2[0]                      # seeded -> deterministic
        assert min(kps[0]) <= min(r1[0]) and max(r1[0]) <= max(kps[0])

    def test_unimplemented_modes_fail_loudly(self):
        from monoloco_tpu.geometry import transform_kp
        for mode in ('upper', 'lower', 'lateral', 'upside'):
            with pytest.raises(NotImplementedError):
                transform_kp(_pose(), mode)
        with pytest.raises(AssertionError):
            transform_kp(_pose(), 'bogus')


def test_get_simplified_calibration(tmp_path):
    from monoloco_tpu.utils import get_simplified_calibration
    k = [721.5, 0.0, 609.5, 0.0, 721.5, 172.8, 0.0, 0.0, 1.0]
    path = tmp_path / 'calib_cam_to_cam.txt'
    path.write_text('S_02: 1242 375\nK_02: ' + ' '.join(str(v) for v in k) + '\n')
    kk = get_simplified_calibration(str(path))
    np.testing.assert_allclose(kk, np.array(k).reshape(3, 3))


def test_read_and_rewrite(tmp_path):
    from monoloco_tpu.utils import read_and_rewrite
    src = tmp_path / 'orig.txt'
    dst = tmp_path / 'new.txt'
    src.write_text('Pedestrian 0.0 0 -0.2 614.24 181.78 727.31 284.77 '
                   '1.892345 0.48 1.2578 2.7 1.74 13.02 -1.55\n')
    read_and_rewrite(str(src), str(dst))
    fields = dst.read_text().split()
    assert fields[8:11] == ['1.89', '0.48', '1.25']   # hwl truncated to 4 chars
    assert fields[0] == 'Pedestrian' and fields[13] == '13.02'

    missing_dst = tmp_path / 'empty.txt'
    read_and_rewrite(str(tmp_path / 'nope.txt'), str(missing_dst))
    assert missing_dst.read_text() == ''


def test_get_category_cyclist_flag(tmp_path):
    from monoloco_tpu.geometry import get_category
    rng = np.random.RandomState(1)
    kps = []
    for cx in (300.0, 700.0):
        k = np.zeros((3, 17))
        k[0] = cx + rng.uniform(-20, 20, 17)
        k[1] = 200 + np.linspace(0, 120, 17)
        k[2] = 0.9
        kps.append(k.tolist())
    lower = np.asarray(kps[0])[:, 9:]
    bike_box = [float(lower[0].min()) - 2, float(lower[1].min()) - 2,
                float(lower[0].max()) + 2, float(lower[1].max()) + 2]
    path_byc = tmp_path / 'img.png.bike.json'
    with open(path_byc, 'w') as f:
        json.dump({'boxes': [bike_box]}, f)
    flags = get_category(kps, str(path_byc))
    assert flags == [1.0, 0.0]      # person 0 rides the bike, person 1 walks
    # no bike annotations -> everyone is a pedestrian
    assert get_category(kps, str(tmp_path / 'absent.json')) == [0.0, 0.0]
