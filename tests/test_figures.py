"""Direct tests for the result figures (ALE curves, spread, task-error GMM,
box plots) — the EvalKitti printer path asserts only that files appear."""

import os
from collections import defaultdict

import matplotlib
matplotlib.use('Agg')
import numpy as np
import pytest

CLUSTERS = ('easy', 'moderate', 'hard', 'all', '3', '5', '7', '9', '11', '13',
            '15', '17', '19', '21', '23', '25', '27', '29', '31', '49')


def _stats_tree(methods):
    """Synthetic dic_stats['test'] with plausible per-cluster values."""
    rng = np.random.RandomState(0)
    tree = defaultdict(lambda: defaultdict(lambda: defaultdict(float)))
    for m in methods:
        for clst in CLUSTERS[:-1]:
            tree[m][clst]['mean'] = float(0.3 + rng.rand())
            tree[m][clst]['cnt'] = 25
            tree[m][clst]['std_ale'] = float(0.5 + 0.5 * rng.rand())
            tree[m][clst]['std_epi'] = float(0.6 + 0.5 * rng.rand())
    return {'test': tree}


def test_get_distances_bin_centers():
    from monoloco_tpu.visuals.figures import get_distances
    assert get_distances(CLUSTERS) == [4, 6, 8, 10, 12, 14, 16, 18, 20, 22,
                                       24, 26, 28, 30, 32]
    assert get_distances(('easy', 'all')) == []


def test_calculate_gmm_height_statistics():
    """Pin the GMM task-error constants to the reference derivation
    (figures.py:227-239 + height_distributions: N(178,7) + N(165,7),
    mm = E|1 - mu/h|): mu_gmm = 171.5 cm, mm_gmm = 0.0459 — the source of
    the published 0.046·d monocular bound (utils/misc.py:32-35)."""
    from monoloco_tpu.visuals.figures import calculate_gmm
    from monoloco_tpu.utils import get_task_error
    heights, mu, mm = calculate_gmm(n_samples=1_000_000, seed=0)
    assert mu == pytest.approx(171.5, abs=0.1)
    assert mm == pytest.approx(0.0459, abs=5e-4)
    # the drawn task-error line must be the published 0.046 coefficient,
    # consistent with the GMM bound to < 1e-3
    assert get_task_error(1.0) == pytest.approx(0.046, abs=1e-9)
    assert abs(get_task_error(1.0) - mm) < 1e-3
    assert len(heights) == 1_000_000


def test_show_task_error_returns_gmm_constants(tmp_path):
    from monoloco_tpu.visuals.figures import show_task_error
    mu, mm = show_task_error(str(tmp_path), save=True)
    assert mu == pytest.approx(171.5, abs=0.1)
    assert mm == pytest.approx(0.0459, abs=5e-4)


def test_show_results_and_spread_write_figures(tmp_path):
    """Files appear AND the drawn y-values are exactly the per-cluster ALE /
    spread statistics passed in (numeric pinning, not smoke)."""
    from monoloco_tpu.visuals.figures import show_results, show_spread
    dic_stats = _stats_tree(['monoloco_pp', 'task_error', 'pixel_error'])
    plotted = show_results(dic_stats, CLUSTERS, 'monoloco_pp', str(tmp_path),
                           save=True)
    xxs, errs, bis = show_spread(dic_stats, CLUSTERS, 'monoloco_pp',
                                 str(tmp_path), save=True)
    made = os.listdir(tmp_path)
    assert any('results' in f for f in made), made
    assert any('spread' in f for f in made), made

    num_clusters = [c for c in CLUSTERS
                    if c not in ('easy', 'moderate', 'hard', 'all', '49')]
    expected = [dic_stats['test']['monoloco_pp'][c]['mean']
                for c in num_clusters[:-1]]
    exp_x = [4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32]
    n = len(plotted['monoloco_pp'][0])
    assert plotted['monoloco_pp'][0] == exp_x[:n]
    assert plotted['monoloco_pp'][1] == pytest.approx(expected[:n])
    assert xxs == exp_x[:len(xxs)]
    assert errs == pytest.approx(expected[:len(errs)])
    assert bis == pytest.approx(
        [dic_stats['test']['monoloco_pp'][c]['std_ale']
         for c in num_clusters[:-1]][:len(bis)])


def test_show_task_error_writes_figure(tmp_path):
    from monoloco_tpu.visuals.figures import show_task_error
    show_task_error(str(tmp_path), save=True)
    assert any('task_error' in f for f in os.listdir(tmp_path))


def test_show_box_plot_writes_figure(tmp_path):
    from monoloco_tpu.visuals.figures import show_box_plot
    rng = np.random.RandomState(1)
    errors = defaultdict(lambda: defaultdict(list))
    for clst in CLUSTERS[4:-1]:
        errors['monstereo'][clst] = list(rng.uniform(0, 2, 30))
    show_box_plot(errors, CLUSTERS, str(tmp_path), save=True)
    assert any('box_plot' in f for f in os.listdir(tmp_path))


def test_spread_skips_missing_method(tmp_path):
    from monoloco_tpu.visuals.figures import show_spread
    show_spread({'test': {}}, CLUSTERS, 'monstereo', str(tmp_path), save=True)
    assert not os.listdir(tmp_path)   # nothing to plot, nothing written
