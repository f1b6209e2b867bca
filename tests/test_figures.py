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
    from monoloco_tpu.visuals.figures import calculate_gmm
    heights, mu, mm = calculate_gmm(n_samples=200_000, seed=0)
    # adult mixture: mean ~171.5 cm, expected relative spread ~4-7%
    assert mu == pytest.approx(171.5, abs=0.5)
    assert 0.03 < mm < 0.08
    assert len(heights) == 200_000


def test_show_results_and_spread_write_figures(tmp_path):
    from monoloco_tpu.visuals.figures import show_results, show_spread
    dic_stats = _stats_tree(['monoloco_pp', 'task_error', 'pixel_error'])
    show_results(dic_stats, CLUSTERS, 'monoloco_pp', str(tmp_path), save=True)
    show_spread(dic_stats, CLUSTERS, 'monoloco_pp', str(tmp_path), save=True)
    made = os.listdir(tmp_path)
    assert any('results' in f for f in made), made
    assert any('spread' in f for f in made), made


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
