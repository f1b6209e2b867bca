"""Direct fuzz parity for the prep transforms and KITTI-file utilities against
the reference's own numpy modules (container-gated, like
test_reference_parity_stereo.py).

The reference transforms module imports `correct_angle / to_cartesian /
to_spherical` from its package; those primitives are supplied from OUR
geometry layer (themselves golden-tested and covered by tools/parity_check.py),
so these tests validate the transform logic verbatim on top of shared,
already-proven primitives. The reference `height_augmentation` calls
`.clone()` on its keypoints (a torch-ism); a clonable ndarray subclass stands
in so the comparison stays torch-free."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_TRANSFORMS = '/root/reference/monoloco/prep/transforms.py'
REF_KITTI = '/root/reference/monoloco/utils/kitti.py'
pytestmark = pytest.mark.skipif(not os.path.exists(REF_TRANSFORMS),
                                reason='reference checkout not available')


class _Clonable(np.ndarray):
    def clone(self):
        return self.copy()


def _clonable(a):
    return np.asarray(a, dtype=np.float64).view(_Clonable)


@pytest.fixture(scope='module')
def ref_tr():
    from monoloco_tpu.geometry import correct_angle, to_cartesian, to_spherical
    pkg = types.ModuleType('refmono')
    pkg.__path__ = []
    prep_pkg = types.ModuleType('refmono.prep')
    prep_pkg.__path__ = []
    utils_stub = types.ModuleType('refmono.utils')
    utils_stub.correct_angle = correct_angle
    utils_stub.to_cartesian = to_cartesian
    utils_stub.to_spherical = to_spherical
    sys.modules['refmono'] = pkg
    sys.modules['refmono.prep'] = prep_pkg
    sys.modules['refmono.utils'] = utils_stub
    spec = importlib.util.spec_from_file_location('refmono.prep.transforms',
                                                  REF_TRANSFORMS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_kitti():
    spec = importlib.util.spec_from_file_location('ref_kitti', REF_KITTI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_kps(rng, m=2):
    kps = rng.rand(m, 3, 17) * 300
    kps[:, 2, :] = rng.rand(m, 17)
    return kps


def _rand_stereo_label(rng, s_match):
    # [theta, psi, z, r, h, w, l, sin, cos, yaw, s_match]
    z = float(rng.uniform(4, 40))
    x = float(rng.uniform(-5, 5))
    y = float(rng.uniform(-1, 2))
    from monoloco_tpu.geometry import to_spherical, correct_angle
    rtp = to_spherical([x, y, z])
    yaw = float(rng.uniform(-np.pi, np.pi))
    sin, cos, _ = correct_angle(yaw, [x, y, z])
    return [rtp[1], rtp[2], z, rtp[0], 1.7, 0.7, 0.9, sin, cos, yaw, s_match]


class TestTransformsVerbatim:

    def test_flip_inputs_and_keypoints(self, ref_tr):
        from monoloco_tpu.prep.transforms import flip_inputs, transform_keypoints
        rng = np.random.RandomState(0)
        for _ in range(30):
            kps = _rand_kps(rng, m=rng.randint(1, 4))
            np.testing.assert_allclose(np.asarray(flip_inputs(kps, 1238.0)),
                                       np.asarray(ref_tr.flip_inputs(kps, 1238.0)),
                                       rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(transform_keypoints(kps, 'flip')),
                np.asarray(ref_tr.transform_keypoints(kps, 'flip')), rtol=1e-12)
            boxes = (rng.rand(3, 5) * 300).tolist()
            assert flip_inputs(boxes, 1238.0, mode='box') == \
                ref_tr.flip_inputs(boxes, 1238.0, mode='box')

    def test_flip_labels(self, ref_tr):
        from monoloco_tpu.prep.transforms import flip_labels
        rng = np.random.RandomState(1)
        for _ in range(40):
            labels = [_rand_stereo_label(rng, 1.0) for _ in range(rng.randint(1, 4))]
            boxes = (rng.rand(len(labels), 4) * 300).tolist()
            b_o, l_o = flip_labels(boxes, labels, im_w=1238.0)
            b_r, l_r = ref_tr.flip_labels(boxes, labels, im_w=1238.0)
            np.testing.assert_allclose(b_o, b_r, rtol=1e-10)
            np.testing.assert_allclose(l_o, l_r, rtol=1e-10, atol=1e-12)

    def test_height_augmentation_seeded(self, ref_tr):
        from monoloco_tpu.prep.transforms import height_augmentation
        rng = np.random.RandomState(2)
        for case in range(40):
            s_match = 1.0 if case % 2 == 0 else 0.0
            label = _rand_stereo_label(rng, s_match)
            kps = _rand_kps(rng, m=1)
            kps_r = _rand_kps(rng, m=1)
            ka_o, la_o = height_augmentation(kps, kps_r, list(label), seed=case)
            ka_r, la_r = ref_tr.height_augmentation(
                _clonable(kps), _clonable(kps_r), list(label), seed=case)
            assert len(ka_o) == len(ka_r) == (4 if s_match else 2)
            np.testing.assert_allclose(la_o, la_r, rtol=1e-10)
            for (kp_o, kpr_o), (kp_r, kpr_r) in zip(ka_o, ka_r):
                np.testing.assert_allclose(np.asarray(kp_o), np.asarray(kp_r),
                                           rtol=1e-12)
                np.testing.assert_allclose(np.asarray(kpr_o), np.asarray(kpr_r),
                                           rtol=1e-12)


class TestKittiUtilsVerbatim:

    def test_get_calibration(self, ref_kitti, tmp_path):
        from monoloco_tpu.utils import get_calibration
        rng = np.random.RandomState(3)
        for case in range(10):
            lines = []
            for name in ('P0', 'P1', 'P2', 'P3'):
                vals = rng.rand(12) * 700
                vals[[1, 4, 8, 9]] = 0.0
                vals[10] = 1.0
                lines.append(name + ': ' + ' '.join(f'{v:.6e}' for v in vals))
            path = tmp_path / f'calib_{case}.txt'
            path.write_text('\n'.join(lines) + '\n')
            (kk_o, tt_o), (kkr_o, ttr_o) = get_calibration(str(path))
            (kk_r, tt_r), (kkr_r, ttr_r) = ref_kitti.get_calibration(str(path))
            np.testing.assert_allclose(kk_o, kk_r, rtol=1e-12)
            np.testing.assert_allclose(tt_o, tt_r, rtol=1e-12)
            np.testing.assert_allclose(kkr_o, kkr_r, rtol=1e-12)
            np.testing.assert_allclose(ttr_o, ttr_r, rtol=1e-12)

    def test_check_conditions_and_difficulty(self, ref_kitti):
        from monoloco_tpu.utils import check_conditions, get_difficulty
        rng = np.random.RandomState(4)
        cats = ('Pedestrian', 'Cyclist', 'Person_sitting', 'Car', 'DontCare')
        for _ in range(80):
            cat = cats[rng.randint(len(cats))]
            gt_line = f'{cat} 0.1 1 -0.2 1 2 3 4 1.7 0.6 0.8 2 1 20 0.5'
            for want in ('pedestrian', 'cyclist', 'all'):
                assert check_conditions(gt_line, want, 'gt') == \
                    ref_kitti.check_conditions(gt_line, want, 'gt')
                split = [cat.lower()] + ['0'] * 14 + [f'{rng.rand():.2f}']
                assert check_conditions(split, want, 'm3d', thresh=0.3) == \
                    ref_kitti.check_conditions(split, want, 'm3d', thresh=0.3)
            box = [0, 0, 0, float(rng.uniform(10, 80))]
            trunc = float(rng.uniform(0, 0.6))
            occ = int(rng.randint(0, 4))
            assert get_difficulty(box, trunc, occ) == \
                ref_kitti.get_difficulty(box, trunc, occ)

    def test_find_cluster(self, ref_kitti):
        from monoloco_tpu.utils import find_cluster
        clusters = ('3', '5', '7', '9', '11', '13', '49')
        rng = np.random.RandomState(5)
        for _ in range(60):
            dd = float(rng.uniform(0, 60))
            assert find_cluster(dd, clusters) == \
                ref_kitti.find_cluster(dd, clusters)


@pytest.fixture(scope='module')
def ref_prep_kitti(ref_tr):
    """Load the reference preprocess_kitti module verbatim, stubbing its torch
    import (unused by parse_ground_truth) and package imports with OUR
    already-proven primitives. sys.modules is restored afterwards."""
    from monoloco_tpu import utils as our_utils
    from monoloco_tpu import geometry as our_geo
    from monoloco_tpu.geometry.host import np_preprocess_monoloco
    from monoloco_tpu.network.preprocess import preprocess_pifpaf

    saved = {k: sys.modules.get(k) for k in
             ('torch', 'refmono', 'refmono.prep', 'refmono.utils',
              'refmono.network', 'refmono.network.process',
              'refmono.prep.transforms')}
    torch_stub = types.ModuleType('torch')
    pkg = types.ModuleType('refmono')
    pkg.__path__ = []
    pkg.__version__ = '0.0-test'
    prep_pkg = types.ModuleType('refmono.prep')
    prep_pkg.__path__ = []
    utils_stub = types.ModuleType('refmono.utils')
    for name in ('split_training', 'get_calibration', 'append_cluster',
                 'make_new_directory', 'check_conditions'):
        setattr(utils_stub, name, getattr(our_utils, name))
    for name in ('get_iou_matches', 'open_annotations',
                 'extract_stereo_matches', 'to_spherical', 'correct_angle'):
        setattr(utils_stub, name, getattr(our_geo, name))
    net_pkg = types.ModuleType('refmono.network')
    net_pkg.__path__ = []
    process_stub = types.ModuleType('refmono.network.process')
    process_stub.preprocess_pifpaf = preprocess_pifpaf
    process_stub.preprocess_monoloco = np_preprocess_monoloco
    sys.modules.update({
        'torch': torch_stub, 'refmono': pkg, 'refmono.prep': prep_pkg,
        'refmono.utils': utils_stub, 'refmono.network': net_pkg,
        'refmono.network.process': process_stub,
        'refmono.prep.transforms': ref_tr,
    })
    try:
        spec = importlib.util.spec_from_file_location(
            'refmono.prep.preprocess_kitti',
            '/root/reference/monoloco/prep/preprocess_kitti.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_parse_ground_truth_verbatim(ref_prep_kitti, tmp_path):
    """Training-label parity: our parse_ground_truth vs the reference's, on
    synthetic KITTI gt files (both spherical and cartesian label modes)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tools'))
    from make_synthetic_kitti import write_scene
    from monoloco_tpu.prep import parse_ground_truth
    rng = np.random.RandomState(9)
    for case in range(8):
        people = [(float(rng.uniform(-6, 6)), float(rng.uniform(6, 35)),
                   float(rng.uniform(-np.pi + 0.2, np.pi - 0.2)))
                  for _ in range(rng.randint(1, 5))]
        name = write_scene(str(tmp_path), case, people, rng)
        path_gt = os.path.join(str(tmp_path), 'data', 'kitti', 'gt', name + '.txt')
        for spherical in (False, True):
            ours = parse_ground_truth(path_gt, 'pedestrian', spherical=spherical)
            theirs = ref_prep_kitti.parse_ground_truth(path_gt, 'pedestrian',
                                                       spherical=spherical)
            np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-12)  # boxes
            np.testing.assert_allclose(ours[2], theirs[2], rtol=1e-12)  # truncs
            assert ours[3] == theirs[3]                                 # occs
            # labels: numeric part + trailing category string
            for lo, lr in zip(ours[1], theirs[1]):
                np.testing.assert_allclose(lo[:-1], lr[:-1], rtol=1e-10)
                assert lo[-1] == lr[-1]
            assert ours[4] == theirs[4]
