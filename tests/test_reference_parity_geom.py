"""Direct fuzz parity for the geometric depth baseline against the reference's
own module (container-gated). The reference's `compute_depth` uses the
numpy<2 alias `np.float` and torch-based geometry primitives; the fixture
restores the alias for the module's lifetime and supplies our numpy twins of
pixel_to_camera/get_keypoints (golden-tested elsewhere)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_GEOM = '/root/reference/monoloco/eval/geom_baseline.py'
pytestmark = [
    pytest.mark.skipif(not os.path.exists(REF_GEOM),
                       reason='reference checkout not available'),
    # the reference's float(ndarray) scalar conversion deprecated in numpy 1.25
    pytest.mark.filterwarnings('ignore::DeprecationWarning'),
]


@pytest.fixture(scope='module')
def ref_geom():
    from monoloco_tpu.geometry.host import np_pixel_to_camera, np_get_keypoints
    saved = {k: sys.modules.get(k) for k in ('monoloco', 'monoloco.utils')}
    pkg = types.ModuleType('monoloco')
    pkg.__path__ = []
    utils_stub = types.ModuleType('monoloco.utils')
    utils_stub.pixel_to_camera = np_pixel_to_camera
    utils_stub.get_keypoints = np_get_keypoints
    sys.modules.update({'monoloco': pkg, 'monoloco.utils': utils_stub})
    had_float = hasattr(np, 'float')
    if not had_float:
        np.float = float  # numpy<2 alias the reference relies on
    try:
        spec = importlib.util.spec_from_file_location('ref_geom', REF_GEOM)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if not had_float:
            del np.float
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_compute_depth_fuzz(ref_geom):
    from monoloco_tpu.eval.geom_baseline import compute_depth
    rng = np.random.RandomState(0)
    for _ in range(200):
        p1 = [float(rng.uniform(-0.5, 0.5)), float(rng.uniform(-0.4, 0.0)), 1.0]
        p2 = [p1[0] + float(rng.uniform(-0.05, 0.05)),
              p1[1] + float(rng.uniform(0.02, 0.3)), 1.0]
        z_o = compute_depth(p1, p2, 0.48)
        z_r = ref_geom.compute_depth(p1, p2, 0.48)
        assert z_o == pytest.approx(z_r, rel=1e-6), (p1, p2)
        dy = float(rng.uniform(0.2, 0.8))
        assert compute_depth(p1, p2, 0.48, mode='real', dy_met=dy) == \
            pytest.approx(ref_geom.compute_depth(p1, p2, 0.48, mode='real',
                                                 dy_met=dy), rel=1e-6)


def test_geometric_coordinates_fuzz(ref_geom):
    from monoloco_tpu.eval.geom_baseline import geometric_coordinates
    rng = np.random.RandomState(1)
    kk = [[718.0, 0.0, 600.0], [0.0, 718.0, 180.0], [0.0, 0.0, 1.0]]
    for _ in range(25):
        m = rng.randint(1, 5)
        kps = np.zeros((m, 3, 17))
        kps[:, 0] = rng.uniform(200, 1000, (m, 17))
        kps[:, 1] = rng.uniform(80, 300, (m, 17))
        kps[:, 2] = 0.9
        zz_o, centers_o = geometric_coordinates(kps, kk)
        zz_r, centers_r = ref_geom.geometric_coordinates(kps, kk)
        np.testing.assert_allclose(zz_o, zz_r, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(centers_o),
                                   np.asarray(centers_r), rtol=1e-5)
