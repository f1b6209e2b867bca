"""Direct fuzz parity for the KITTI evaluator's scoring math against the
reference's own module (container-gated): per-match error/uncertainty
accumulation, cluster statistics, and the true-negative padding. Anchors the
restructured EvalKitti (`_tally_error`/`_tally_spread`/`_cluster_stats`/
`_pad_misses`) to the reference semantics update_errors/update_uncertainty/
get_statistics/add_true_negatives."""

import importlib.util
import os
import sys
import types
from collections import defaultdict

import numpy as np
import pytest

REF_EVAL = '/root/reference/monoloco/eval/eval_kitti.py'
pytestmark = pytest.mark.skipif(not os.path.exists(REF_EVAL),
                                reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref_ek():
    """Load the reference evaluator with its package imports stubbed by our
    (verbatim-proven) primitives; visuals stubs are inert."""
    from monoloco_tpu.geometry import get_iou_matches, get_iou_matches_matrix
    from monoloco_tpu import utils as u
    saved = {k: sys.modules.get(k) for k in
             ('refmono4', 'refmono4.eval', 'refmono4.utils', 'refmono4.prep',
              'refmono4.visuals')}
    pkg = types.ModuleType('refmono4')
    pkg.__path__ = []
    utils_stub = types.ModuleType('refmono4.utils')
    utils_stub.get_iou_matches = get_iou_matches
    utils_stub.get_iou_matches_matrix = get_iou_matches_matrix
    for name in ('get_task_error', 'get_pixel_error', 'check_conditions',
                 'get_difficulty', 'split_training', 'average', 'find_cluster'):
        setattr(utils_stub, name, getattr(u, name))
    prep_stub = types.ModuleType('refmono4.prep')
    from monoloco_tpu.prep import parse_ground_truth
    prep_stub.parse_ground_truth = parse_ground_truth
    vis_stub = types.ModuleType('refmono4.visuals')
    for name in ('show_results', 'show_spread', 'show_task_error', 'show_box_plot'):
        setattr(vis_stub, name, lambda *a, **k: None)
    eval_pkg = types.ModuleType('refmono4.eval')
    eval_pkg.__path__ = []
    sys.modules.update({'refmono4': pkg, 'refmono4.eval': eval_pkg,
                        'refmono4.utils': utils_stub,
                        'refmono4.prep': prep_stub, 'refmono4.visuals': vis_stub})
    # the reference asserts data/logs exists at class-definition time
    import tempfile
    cwd = os.getcwd()
    scratch = tempfile.mkdtemp()
    os.makedirs(os.path.join(scratch, 'data', 'logs'))
    os.chdir(scratch)
    try:
        spec = importlib.util.spec_from_file_location('refmono4.eval.eval_kitti', REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _bare(cls):
    """An instance without running __init__ (the methods only need CLUSTERS)."""
    return object.__new__(cls)


def test_error_tally_matches_reference(ref_ek):
    from monoloco_tpu.eval.eval_kitti import EvalKitti
    ours, ref = _bare(EvalKitti), _bare(ref_ek.EvalKitti)
    rng = np.random.RandomState(0)
    e_o, e_r = defaultdict(list), defaultdict(list)
    for _ in range(300):
        dd_gt = float(rng.uniform(1, 55))
        dd = dd_gt + float(rng.normal(0, 2))
        difficulty = ('easy', 'moderate', 'hard', 'excluded')[rng.randint(4)]
        ours._tally_error(dd, dd_gt, difficulty, e_o)
        ref.update_errors(dd, dd_gt, difficulty, e_r)
    assert set(e_o) == set(e_r)
    for key in e_r:
        np.testing.assert_allclose(e_o[key], e_r[key], rtol=1e-12, err_msg=key)


def test_spread_tally_matches_reference(ref_ek):
    from monoloco_tpu.eval.eval_kitti import EvalKitti
    ours, ref = _bare(EvalKitti), _bare(ref_ek.EvalKitti)
    rng = np.random.RandomState(1)
    s_o = defaultdict(lambda: defaultdict(list))
    s_r = defaultdict(lambda: defaultdict(list))
    for _ in range(300):
        dd_gt = float(rng.uniform(1, 55))
        dd = dd_gt + float(rng.normal(0, 2))
        ale = float(rng.uniform(0.1, 3))
        epi = ale if rng.rand() < 0.3 else float(rng.uniform(0, 4))
        difficulty = ('easy', 'moderate', 'hard')[rng.randint(3)]
        ours._tally_spread(ale, epi, dd, dd_gt, difficulty, s_o)
        ref.update_uncertainty(ale, epi, dd, dd_gt, difficulty, s_r)
    assert set(s_o) == set(s_r)
    for group in s_r:
        assert set(s_o[group]) == set(s_r[group]), group
        for stat in s_r[group]:
            np.testing.assert_allclose(s_o[group][stat], s_r[group][stat],
                                       rtol=1e-12, err_msg=f'{group}/{stat}')


def test_cluster_stats_and_padding_match_reference(ref_ek):
    from monoloco_tpu.eval.eval_kitti import EvalKitti, _cluster_stats
    rng = np.random.RandomState(2)
    for method in ('monoloco_pp', 'm3d'):
        errors = list(rng.uniform(0, 5, 40))
        stds = {stat: list(rng.uniform(0, 2, 40)) for stat in
                ('ale', 'epi', 'epi_rel', 'interval', 'at_risk', 'prec_1', 'prec_2')}
        out_o, out_r = defaultdict(float), defaultdict(float)
        _cluster_stats(out_o, errors, stds, method)
        ref_ek.get_statistics(out_r, errors, stds, method)
        assert set(out_o) == set(out_r)
        for k in out_r:
            assert out_o[k] == pytest.approx(out_r[k], rel=1e-12), (method, k)
    # empty cluster: the reference only catches ValueError so average([])
    # escapes as ZeroDivisionError; we map it to the same -1 sentinel
    # (documented deviation).
    out_o = defaultdict(float)
    _cluster_stats(out_o, [], {}, 'm3d')
    assert dict(out_o) == {'mean': -1, 'max': -1, 'cnt': -1}
    with pytest.raises(ZeroDivisionError):
        ref_ek.get_statistics(defaultdict(float), [], {}, 'm3d')

    for n_match, n_gt in ((5, 12), (0, 3), (4, 4)):
        e_o = defaultdict(list)
        e_o['all'] = [1.0] * n_match
        for key in ('<0.5m', '<1m', '<2m'):
            e_o[key] = [1] * n_match
        import copy as _copy
        e_r = _copy.deepcopy(e_o)
        EvalKitti._pad_misses(e_o, n_gt)
        ref_ek.add_true_negatives(e_r, n_gt)
        assert {k: v for k, v in e_o.items()} == {k: v for k, v in e_r.items()}
