"""Direct fuzz parity: our vectorized stereo kernels vs the reference's own
numpy implementation, executed verbatim from /root/reference.

Only runs where the reference checkout exists (this build container); it is
the strongest possible evidence for the fiddliest parity area — the seeded
stereo match cascade (SURVEY.md section 7 'hard parts')."""

import importlib.util
import os

import numpy as np
import pytest

REF_STEREO = '/root/reference/monoloco/utils/stereo.py'
pytestmark = [
    pytest.mark.skipif(not os.path.exists(REF_STEREO),
                       reason='reference checkout not available'),
    # the reference's nanmedian over all-NaN rows warns; ours suppresses it
    pytest.mark.filterwarnings('ignore::RuntimeWarning'),
]


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location('ref_stereo', REF_STEREO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_scene(rng):
    """One left pose + r right candidates with plausible disparities."""
    zz = float(rng.uniform(4.5, 50.0))
    kp = np.zeros((1, 3, 17))
    kp[0, 0] = rng.uniform(300, 900) + rng.uniform(-25, 25, 17)
    kp[0, 1] = rng.uniform(100, 300) + rng.uniform(-60, 60, 17)
    kp[0, 2] = rng.uniform(0.0, 1.0, 17)
    r = rng.randint(1, 6)
    kps_r = np.zeros((r, 3, 17))
    for i in range(r):
        true_z = rng.uniform(4.5, 60.0)
        kps_r[i, 0] = kp[0, 0] - 0.54 * 721 / true_z + rng.uniform(-2, 2, 17)
        kps_r[i, 1] = kp[0, 1] + rng.uniform(-2, 2, 17)
        kps_r[i, 2] = rng.uniform(0.0, 1.0, 17)
    return kp, kps_r, zz


def test_extract_stereo_matches_fuzz(ref):
    from monoloco_tpu.geometry import extract_stereo_matches
    rng = np.random.RandomState(3)
    checked = 0
    for case in range(150):
        kp, kps_r, zz = _random_scene(rng)
        for phase in ('train', 'val'):
            seed = case
            ours, cnt = extract_stereo_matches(kp, kps_r, zz, phase=phase,
                                               seed=seed)
            theirs, cnt_ref = ref.extract_stereo_matches(kp, kps_r, zz,
                                                         phase=phase, seed=seed)
            assert [(int(i), int(f)) for i, f in ours] == \
                [(int(i), int(f)) for i, f in theirs], (case, phase)
            assert cnt == cnt_ref
            checked += 1
    assert checked == 300


def test_mask_joint_disparity_fuzz(ref):
    from monoloco_tpu.geometry import mask_joint_disparity
    rng = np.random.RandomState(4)
    for _ in range(50):
        kp, kps_r, _ = _random_scene(rng)
        m = rng.randint(1, 4)
        kps_l = np.repeat(kp, m, axis=0) + rng.uniform(-1, 1, (m, 3, 17))
        avg_o, dx_o, dy_o = mask_joint_disparity(kps_l, kps_r)
        # reference processes one left pose at a time
        for i in range(m):
            avg_r, dx_r, dy_r = ref.mask_joint_disparity(kps_l[i:i + 1], kps_r)
            np.testing.assert_allclose(avg_o[i], np.asarray(avg_r).ravel(),
                                       equal_nan=True, rtol=1e-10)
            np.testing.assert_allclose(dx_o[i], np.asarray(dx_r)[0],
                                       equal_nan=True, rtol=1e-10)
            np.testing.assert_allclose(dy_o[i], np.asarray(dy_r)[0],
                                       equal_nan=True, rtol=1e-10)


def test_scalar_helpers_match(ref):
    from monoloco_tpu.geometry import (depth_to_pixel_error, disparity_to_depth,
                                       interquartile_mask)
    rng = np.random.RandomState(5)
    for _ in range(100):
        zz = float(rng.uniform(1, 80))
        e = float(rng.uniform(0.1, 5))
        assert depth_to_pixel_error(zz, e) == pytest.approx(
            ref.depth_to_pixel_error(zz, e), rel=1e-12)
        disp = float(rng.uniform(-5, 80))
        z_o, ok_o = disparity_to_depth(disp)
        z_r, ok_r = ref.disparity_to_depth(disp)
        assert ok_o == ok_r
        if ok_o:
            assert z_o == pytest.approx(z_r, rel=1e-12)
    dist = rng.uniform(0, 30, (6, 17))
    np.testing.assert_array_equal(interquartile_mask(dist),
                                  ref.interquartile_mask(dist))


@pytest.fixture(scope='module')
def ref_iou():
    spec = importlib.util.spec_from_file_location(
        'ref_iou', '/root/reference/monoloco/utils/iou.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_iou_matchers_match_reference_verbatim(ref_iou):
    from monoloco_tpu.geometry import (calculate_iou, get_iou_matrix,
                                       get_iou_matches, get_iou_matches_matrix,
                                       reorder_matches)
    rng = np.random.RandomState(6)
    for _ in range(150):
        m, n = rng.randint(1, 7), rng.randint(1, 6)
        def make(k, conf):
            out = []
            for _ in range(k):
                x1, y1 = rng.rand(2) * 100
                w, h = rng.rand(2) * 50 + 1
                b = [float(x1), float(y1), float(x1 + w), float(y1 + h)]
                if conf:
                    b.append(round(float(rng.rand()), 1))
                out.append(b)
            return out
        dets, gts = make(m, True), make(n, False)
        if rng.rand() < 0.3:
            gts[0] = dets[0][:4]
        np.testing.assert_allclose(get_iou_matrix(dets, gts),
                                   ref_iou.get_iou_matrix(dets, gts), rtol=1e-12)
        assert calculate_iou(dets[0][:4], gts[0]) == pytest.approx(
            ref_iou.calculate_iou(dets[0][:4], gts[0]), rel=1e-12)
        ours = get_iou_matches(dets, gts, iou_min=0.3)
        theirs = [(int(i), int(j)) for i, j in
                  ref_iou.get_iou_matches(dets, gts, iou_min=0.3)]
        assert ours == theirs
        ours_m = get_iou_matches_matrix(dets, gts, thresh=0.1)
        theirs_m = [(int(i), int(j)) for i, j in
                    ref_iou.get_iou_matches_matrix(dets, gts, thresh=0.1)]
        assert ours_m == theirs_m
        if ours:
            assert [(int(i), int(j)) for i, j in
                    reorder_matches(ours, dets)] == \
                [(int(i), int(j)) for i, j in
                 ref_iou.reorder_matches(theirs, dets, mode='left_right')]


def test_misc_helpers_match_reference_verbatim():
    spec = importlib.util.spec_from_file_location(
        'ref_misc', '/root/reference/monoloco/utils/misc.py')
    ref_misc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_misc)
    from monoloco_tpu.utils import get_task_error, get_pixel_error, normalize_hwl
    rng = np.random.RandomState(7)
    for _ in range(60):
        d = float(rng.uniform(1, 60))
        assert get_task_error(d) == pytest.approx(ref_misc.get_task_error(d),
                                                  rel=1e-12)
        assert get_pixel_error(d) == pytest.approx(ref_misc.get_pixel_error(d),
                                                   rel=1e-9)
        lab = list(rng.uniform(-2, 2, 4)) + [float(rng.uniform(1.4, 2.0)),
                                             float(rng.uniform(0.4, 1.0)),
                                             float(rng.uniform(0.4, 1.0))] \
            + list(rng.uniform(-1, 1, 3))
        np.testing.assert_allclose(normalize_hwl(lab),
                                   ref_misc.normalize_hwl(lab), rtol=1e-9)


class _Torchish(np.ndarray):
    """numpy stand-in for the torch tensor the reference's get_keypoints
    returns: supports the single .unsqueeze call in features_similarity."""

    def unsqueeze(self, axis):
        return np.expand_dims(self, axis).view(_Torchish)


@pytest.fixture(scope='module')
def ref_sb():
    import types
    import sys
    from monoloco_tpu.geometry.host import np_get_keypoints
    from monoloco_tpu.geometry import mask_joint_disparity, disparity_to_depth

    saved = {k: sys.modules.get(k) for k in ('refmono3', 'refmono3.utils')}
    pkg = types.ModuleType('refmono3')
    pkg.__path__ = []
    utils_stub = types.ModuleType('refmono3.utils')
    utils_stub.get_keypoints = \
        lambda kps, mode: np.asarray(np_get_keypoints(kps, mode),
                                     dtype=np.float64).view(_Torchish)
    utils_stub.mask_joint_disparity = mask_joint_disparity
    utils_stub.disparity_to_depth = disparity_to_depth
    sys.modules.update({'refmono3': pkg, 'refmono3.utils': utils_stub})
    try:
        spec = importlib.util.spec_from_file_location(
            'refmono3.eval.stereo_baselines',
            '/root/reference/monoloco/eval/stereo_baselines.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_baselines_association_verbatim(ref_sb):
    from monoloco_tpu.eval.stereo_baselines import baselines_association
    rng = np.random.RandomState(9)
    for case in range(40):
        kp, kps_r, _ = _random_scene(rng)
        m = rng.randint(1, 4)
        kps_l = np.repeat(kp, m, axis=0) + rng.uniform(-3, 3, (m, 3, 17))
        zzs = [float(rng.uniform(5, 45)) for _ in range(m)]
        feats = (rng.rand(m, 16), rng.rand(kps_r.shape[0], 16))
        zz_o, cnt_o = baselines_association(
            ['ml_stereo', 'pose', 'reid'], zzs, kps_l, kps_r, feats)
        zz_r, cnt_r = ref_sb.baselines_association(
            ['ml_stereo', 'pose', 'reid'], zzs, kps_l, kps_r, feats)
        for key in ('ml_stereo', 'pose', 'reid'):
            np.testing.assert_allclose(zz_o[key], zz_r[key], rtol=1e-6,
                                       err_msg=f'{case}:{key}')
            assert cnt_o[key] == cnt_r[key]
        assert cnt_o['max'] == cnt_r['max']
