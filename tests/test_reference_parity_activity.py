"""Direct fuzz parity for the activity logic (F-formations, deterministic
social interactions, raised-hand rule) against the reference's own module,
loaded verbatim with its torch/visuals imports stubbed (they are unused by
these code paths). Container-gated."""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

REF_ACTIVITY = '/root/reference/monoloco/activity.py'
pytestmark = pytest.mark.skipif(not os.path.exists(REF_ACTIVITY),
                                reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref_act():
    import matplotlib
    matplotlib.use('Agg')
    saved = {k: sys.modules.get(k) for k in
             ('torch', 'refmono2', 'refmono2.network', 'refmono2.network.process',
              'refmono2.visuals', 'refmono2.visuals.pifpaf_show',
              'refmono2.visuals.printer')}
    torch_stub = types.ModuleType('torch')
    pkg = types.ModuleType('refmono2')
    pkg.__path__ = []
    net_pkg = types.ModuleType('refmono2.network')
    net_pkg.__path__ = []
    process_stub = types.ModuleType('refmono2.network.process')
    process_stub.laplace_sampling = lambda *a, **k: None  # probabilistic path untested here
    vis_pkg = types.ModuleType('refmono2.visuals')
    vis_pkg.__path__ = []
    show_stub = types.ModuleType('refmono2.visuals.pifpaf_show')
    show_stub.KeypointPainter = object
    show_stub.image_canvas = None
    show_stub.get_pifpaf_outputs = lambda *a: ([], [])
    printer_stub = types.ModuleType('refmono2.visuals.printer')
    printer_stub.draw_orientation = lambda *a, **k: None
    printer_stub.social_distance_colors = lambda c, d: c
    sys.modules.update({
        'torch': torch_stub, 'refmono2': pkg, 'refmono2.network': net_pkg,
        'refmono2.network.process': process_stub, 'refmono2.visuals': vis_pkg,
        'refmono2.visuals.pifpaf_show': show_stub,
        'refmono2.visuals.printer': printer_stub,
    })
    try:
        spec = importlib.util.spec_from_file_location('refmono2.activity',
                                                      REF_ACTIVITY)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_check_f_formations_fuzz(ref_act):
    from monoloco_tpu.activity import check_f_formations
    rng = np.random.RandomState(0)
    agree_true = 0
    for _ in range(300):
        n = rng.randint(2, 6)
        centers = [[float(rng.uniform(-4, 4)), float(rng.uniform(2, 10))]
                   for _ in range(n)]
        angles = [float(rng.uniform(-math.pi, math.pi)) for _ in range(n)]
        radii = (0.3, 0.5, 1.0)
        for sd in (False, True):
            ours = check_f_formations(0, 1, centers, angles, radii=radii,
                                      social_distance=sd)
            theirs = ref_act.check_f_formations(0, 1, centers, angles,
                                                radii=radii, social_distance=sd)
            assert bool(ours) == bool(theirs)
            agree_true += bool(ours)
    assert agree_true > 0  # the fuzz actually exercises positive cases


def test_social_interactions_deterministic_fuzz(ref_act):
    from monoloco_tpu.activity import social_interactions
    rng = np.random.RandomState(1)
    positives = 0
    for _ in range(200):
        n = rng.randint(2, 6)
        centers = [[float(rng.uniform(-3, 3)), float(rng.uniform(2, 8))]
                   for _ in range(n)]
        angles = [float(rng.uniform(-math.pi, math.pi)) for _ in range(n)]
        dds = [float(np.linalg.norm(c)) for c in centers]
        for sd in (False, True):
            ours = social_interactions(0, centers, angles, dds, n_samples=1,
                                       threshold_dist=2.5, radii=(0.3, 0.5, 1),
                                       social_distance=sd)
            theirs = ref_act.social_interactions(
                0, centers, angles, dds, n_samples=1, threshold_dist=2.5,
                radii=(0.3, 0.5, 1), social_distance=sd)
            assert bool(ours) == bool(theirs)
            positives += bool(ours)
    assert positives > 0


def test_is_raising_hand_fuzz(ref_act):
    from monoloco_tpu.activity import is_raising_hand
    rng = np.random.RandomState(2)
    outcomes = set()
    for _ in range(400):
        kp = np.zeros((3, 17))
        kp[0] = rng.uniform(100, 200, 17)
        kp[1] = rng.uniform(100, 300, 17)
        kp[2] = 0.9
        # bias some cases toward risen arms (hands above shoulders)
        if rng.rand() < 0.5:
            kp[1, 9] = kp[1, 5] - rng.uniform(5, 80)
        if rng.rand() < 0.5:
            kp[1, 10] = kp[1, 6] - rng.uniform(5, 80)
        ours = is_raising_hand(kp.tolist())
        theirs = ref_act.is_raising_hand(kp.tolist())
        assert ours == theirs
        outcomes.add(ours)
    assert {'left', 'right', 'both', None} <= outcomes
