"""Functional tests for the native C++ KITTI evaluator (kitti-eval/).

Builds synthetic gt + detections and checks the AP semantics:
 - perfect detections -> AP ~100 on detection and all RALP variants
 - good 2D boxes with bad 3D localization -> detection high, detection_5% ~0
 - orientation stats written when alpha valid
"""

import os
import subprocess

import numpy as np
import pytest

from conftest import ensure_kitti_eval_binary

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = ensure_kitti_eval_binary()

pytestmark = pytest.mark.skipif(BINARY is None,
                                reason="evaluate_object build failed")


def _gt_line(x1, y1, x2, y2, xyz, alpha=0.1, ry=0.2):
    return (f"Pedestrian 0.0 0 {alpha} {x1} {y1} {x2} {y2} "
            f"1.8 0.6 0.7 {xyz[0]} {xyz[1]} {xyz[2]} {ry}\n")


def _det_line(x1, y1, x2, y2, xyz, score, alpha=0.1, ry=0.2):
    return (f"Pedestrian -1 -1 {alpha} {x1} {y1} {x2} {y2} "
            f"1.8 0.6 0.7 {xyz[0]} {xyz[1]} {xyz[2]} {ry} {score}\n")


def _setup(tmp_path, det_offset_m=0.0, n_images=20):
    """Create lists/, data/object/label_2/, results/test/data/ trees.

    Uses >= 41 gt with distinct detection scores: the devkit's 41-point recall
    discretization can only fill as many precision slots as there are distinct
    score-ranked recall levels, so small gt counts cap AP below 100 by design.
    """
    (tmp_path / 'lists').mkdir()
    gt_dir = tmp_path / 'data' / 'object' / 'label_2'
    gt_dir.mkdir(parents=True)
    det_dir = tmp_path / 'results' / 'test' / 'data'
    det_dir.mkdir(parents=True)

    indices = []
    rng = np.random.RandomState(0)
    score = 0.99
    for i in range(1, n_images + 1):
        name = str(i).zfill(6)
        indices.append(name)
        gt_lines, det_lines = [], []
        for p in range(3):
            x1 = 100 + 300 * p + rng.rand() * 10
            y1 = 120.0
            x2, y2 = x1 + 60, y1 + 160  # height 160 -> easy
            z = 8.0 + 4 * p
            xyz = (0.5 * p, 1.0, z)
            gt_lines.append(_gt_line(x1, y1, x2, y2, xyz))
            det_xyz = (xyz[0] + det_offset_m, xyz[1], xyz[2])
            det_lines.append(_det_line(x1, y1, x2, y2, det_xyz, score))
            score -= 0.001  # strictly decreasing, all distinct
        (gt_dir / f'{name}.txt').write_text(''.join(gt_lines))
        (det_dir / f'{name}.txt').write_text(''.join(det_lines))
    (tmp_path / 'lists' / 'val.txt').write_text('\n'.join(indices) + '\n')
    return tmp_path


def _run(tmp_path):
    res = subprocess.run([BINARY, 'test', 'val'], cwd=tmp_path,
                         capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stdout + res.stderr
    return res.stdout


def _ap(tmp_path, param, row=3):
    stats = np.atleast_2d(np.loadtxt(
        tmp_path / 'results' / 'test' / f'stats_pedestrian_{param}.txt'))
    return 100 * np.mean(stats[row][1:41])


class TestPerfectDetections:
    def test_ap_100(self, tmp_path):
        _setup(tmp_path, det_offset_m=0.0)
        _run(tmp_path)
        assert _ap(tmp_path, 'detection') > 95
        assert _ap(tmp_path, 'detection_5%') > 95
        assert _ap(tmp_path, 'detection_10%') > 95
        assert _ap(tmp_path, 'detection_ground') > 95
        assert _ap(tmp_path, 'detection_3d') > 95

    def test_orientation_written(self, tmp_path):
        _setup(tmp_path)
        _run(tmp_path)
        assert (tmp_path / 'results' / 'test' /
                'stats_pedestrian_orientation.txt').exists()
        # Orientation/MPPE files carry rows only for difficulty bins that
        # evaluated (reference saveStats semantics); the last row is ALL.
        assert _ap(tmp_path, 'orientation', row=-1) > 95


class TestRelativeErrorGate:
    def test_bad_localization_fails_ralp(self, tmp_path):
        # 3 m lateral error: 2D boxes still match, but 5% of <=20 m + 0.2 < 3 m.
        _setup(tmp_path, det_offset_m=3.0)
        _run(tmp_path)
        assert _ap(tmp_path, 'detection') > 95
        assert _ap(tmp_path, 'detection_5%') < 5
        assert _ap(tmp_path, 'detection_10%') < 5

    def test_moderate_error_passes_10pct_at_range(self, tmp_path):
        # 0.5 m error: fails 1% (0.08-0.2 m) but passes 10% (1-2 m) thresholds.
        _setup(tmp_path, det_offset_m=0.5)
        _run(tmp_path)
        assert _ap(tmp_path, 'detection_10%') > 95
        assert _ap(tmp_path, 'detection_1%') < 50


class TestSweeps:
    def test_analyze_recall_and_distance(self, tmp_path):
        _setup(tmp_path)
        res = subprocess.run([BINARY, 'test', 'val', '1', '1'], cwd=tmp_path,
                             capture_output=True, text=True, timeout=300)
        assert res.returncode == 0, res.stdout + res.stderr
        iour = np.atleast_2d(np.loadtxt(
            tmp_path / 'results' / 'test' / 'stats_pedestrian_iour.txt'))
        assert iour.shape[1] == 51          # recall vs IoU sweep
        assert iour[0, 0] >= iour[0, -1]    # recall decreases with IoU
        dist = np.atleast_2d(np.loadtxt(
            tmp_path / 'results' / 'test' / 'stats_pedestrian_distance.txt'))
        assert dist.shape[1] == (60 - 10) // 5 + 1   # 10..60 step 5
        # perfect detections: recall 1.0 once all gt are within range
        assert dist[3, -1] > 0.95


class TestParser:
    def test_parser_runs(self, tmp_path):
        _setup(tmp_path)
        _run(tmp_path)
        parser = os.path.join(REPO, 'kitti-eval', 'parser.py')
        res = subprocess.run(['python', parser, 'test', str(tmp_path / 'results')],
                             capture_output=True, text=True, timeout=60)
        assert res.returncode == 0, res.stderr
        assert 'detection' in res.stdout
        assert 'Easy' in res.stdout
