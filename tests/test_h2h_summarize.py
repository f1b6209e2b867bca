"""Unit tests for tools/h2h_summarize.py — the statistics behind the
BASELINE.md head-to-head parity table (mean/sd/SEM aggregation and the
Welch delta, including the single-seed-side fallback)."""

import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from h2h_summarize import stats, welch_delta  # noqa: E402


def test_stats_basic():
    s = stats([1.0, 2.0, 3.0])
    assert s['n'] == 3
    assert abs(s['mean'] - 2.0) < 1e-12
    assert abs(s['sd'] - 1.0) < 1e-12
    assert abs(s['sem'] - 1.0 / math.sqrt(3)) < 1e-12
    assert (s['lo'], s['hi']) == (1.0, 3.0)


def test_stats_filters_sentinels_and_none():
    # the reference evaluator emits -1.0 for empty clusters
    s = stats([-1.0, None, 2.0, 4.0])
    assert s['n'] == 2 and abs(s['mean'] - 3.0) < 1e-12
    assert stats([-1.0, None]) is None
    assert stats([]) is None


def test_stats_single_value():
    s = stats([5.0])
    assert s['n'] == 1 and s['sd'] == 0.0 and s['sem'] is None


def test_welch_delta_two_sided():
    a = stats([1.0, 1.1, 0.9, 1.0])      # reference
    b = stats([1.2, 1.3, 1.1, 1.2])      # tpu
    d = welch_delta(a, b)
    assert not d['approx']
    assert abs(d['delta'] - 0.2) < 1e-12
    expected_se = math.sqrt(a['sem'] ** 2 + b['sem'] ** 2)
    assert abs(d['se'] - expected_se) < 1e-12
    assert abs(d['rel_pct'] - 20.0) < 1e-9


def test_welch_delta_single_seed_fallback():
    # one reference seed: its spread is approximated with the tpu per-seed sd
    a = stats([1.0])
    b = stats([1.2, 1.3, 1.1, 1.2])
    d = welch_delta(a, b)
    assert d['approx']
    borrowed = b['sd'] / math.sqrt(1)
    assert abs(d['se'] - math.sqrt(borrowed ** 2 + b['sem'] ** 2)) < 1e-12
    assert abs(d['delta'] - 0.2) < 1e-12


def test_welch_delta_degenerate():
    assert welch_delta(None, stats([1.0, 2.0])) is None
    # both single-seed: no spread estimate exists at all
    assert welch_delta(stats([1.0]), stats([2.0])) is None


def test_cli_end_to_end(tmp_path):
    """Run the summarizer CLI on a tiny fixture jsonl and check the markdown
    row emitter output."""
    recs = []
    for fw, seeds, base in (('reference', (1,), 1.30),
                            ('monoloco_tpu', (1, 2), 1.29)):
        for s in seeds:
            recs.append({
                'framework': fw, 'mode': 'mono', 'r_seed': s,
                'n_train': 10, 'n_val': 10, 'hard': True,
                'train_wall_s': 100.0,
                'ale': {'easy': 1.0, 'moderate': 2.0, 'hard': 3.0,
                        'all': base + 0.01 * s},
                'alp': {'<0.5m': 25.0, '<1m': 40.0, '<2m': 60.0},
                'matched': 7253,
                'ralp': {'detection': {'all': 75.0, 'moderate': 47.0},
                         'detection_5%': {'all': 33.0, 'moderate': 7.0},
                         'detection_10%': {'all': 65.0, 'moderate': 35.0}}})
    path = tmp_path / 'results.jsonl'
    path.write_text('\n'.join(json.dumps(r) for r in recs) + '\n')
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    out = subprocess.run([sys.executable, tool, str(path), '--md'],
                         capture_output=True, text=True, check=True).stdout
    assert 'reference (1 seeds' in out
    assert 'monoloco_tpu (2 seeds' in out
    assert 'approx SE: single-seed side' in out
    # markdown rows present, tpu row reports mean ± sd across its 2 seeds
    assert '| mono | reference | 1 | 1.310 |' in out
    assert '| mono | **monoloco_tpu** | 2 | 1.305 ± 0.007 |' in out

def test_welch_delta_borrows_zero_sd_ties():
    # a multi-seed side whose values tie exactly (sd 0.0) is still a valid
    # spread estimate — 0.0 must not be treated as "no estimate"
    a = stats([1.0])
    b = stats([2.0, 2.0, 2.0])
    d = welch_delta(a, b)
    assert d is not None and d['approx']
    assert d['delta'] == 1.0 and d['se'] == 0.0


def test_welch_delta_zero_reference_mean():
    # a reference-side mean of exactly 0 (possible for RALP AP columns) must
    # not divide-by-zero; the relative delta is simply undefined
    a = stats([0.0, 0.0])
    b = stats([1.0, 2.0])
    d = welch_delta(a, b)
    assert d is not None and d['rel_pct'] is None
    assert abs(d['delta'] - 1.5) < 1e-12


def test_cli_flag_before_path(tmp_path):
    """--md anywhere in argv must not be mistaken for the results path."""
    rec = {'framework': 'monoloco_tpu', 'mode': 'mono', 'r_seed': 1,
           'n_train': 10, 'n_val': 10, 'hard': True, 'train_wall_s': 1.0,
           'ale': {'easy': 1.0, 'moderate': 2.0, 'hard': 3.0, 'all': 1.5},
           'alp': {'<0.5m': 25.0, '<1m': 40.0, '<2m': 60.0}, 'matched': 10}
    path = tmp_path / 'r.jsonl'
    path.write_text(json.dumps(rec) + '\n')
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    out = subprocess.run([sys.executable, tool, '--md', str(path)],
                         capture_output=True, text=True, check=True).stdout
    assert 'monoloco_tpu (1 seeds' in out


def test_head_to_head_already_done_keys_on_dataset_config(tmp_path, monkeypatch):
    """A recorded seed only counts as done if it was measured on the SAME
    (n_train, n_val, hard) dataset config — otherwise re-running with a new
    config against an old results file silently skips every leg."""
    import head_to_head as h2h
    res = tmp_path / 'results.jsonl'
    res.write_text(json.dumps({
        'framework': 'reference', 'mode': 'mono', 'r_seed': 1,
        'n_train': 160, 'n_val': 40, 'hard': False}) + '\n')
    monkeypatch.setattr(h2h, 'RESULTS', str(res))
    monkeypatch.setattr(h2h, 'N_TRAIN', 160)
    monkeypatch.setattr(h2h, 'N_VAL', 40)
    monkeypatch.setattr(h2h, 'HARD', False)
    assert h2h.already_done('reference', 'mono', 1)
    assert not h2h.already_done('reference', 'mono', 2)
    monkeypatch.setattr(h2h, 'HARD', True)
    assert not h2h.already_done('reference', 'mono', 1)
    monkeypatch.setattr(h2h, 'HARD', False)
    monkeypatch.setattr(h2h, 'N_TRAIN', 2400)
    assert not h2h.already_done('reference', 'mono', 1)


def test_head_to_head_safe_ralp_never_raises(monkeypatch):
    """RALP runs after a multi-hour reference train; any failure there must
    degrade to ralp=None, not discard the leg's metrics record."""
    import head_to_head as h2h
    monkeypatch.setattr(h2h, 'compute_ralp',
                        lambda net: (_ for _ in ()).throw(OSError('boom')))
    assert h2h.safe_ralp('monoloco_pp') is None


def test_gt_bin_counts_mirrors_clean_data(tmp_path):
    """Bin assignment must match kitti-eval/evaluate_object.cpp clean_data:
    cat = easiest bin passed (occ/trunc/height), bin counts are exclusive,
    ALL counts every pedestrian; non-pedestrians and missing files ignored."""
    import head_to_head as h2h
    gt = tmp_path / 'gt'
    gt.mkdir()
    # height = y2 - y1; columns: type trunc occ alpha x1 y1 x2 y2 ...
    rows = [
        'Pedestrian 0.0 0 0 100 100 140 180 1.7 0.6 0.8 1 1 10 0',   # h=80 easy
        'Pedestrian 0.2 1 0 100 100 130 135 1.7 0.6 0.8 1 1 20 0',   # h=35 moderate
        'Pedestrian 0.4 2 0 100 100 120 128 1.7 0.6 0.8 1 1 30 0',   # h=28 hard
        'Pedestrian 0.9 2 0 100 100 110 115 1.7 0.6 0.8 1 1 60 0',   # trunc>0.5: all-only
        'Car 0.0 0 0 100 100 200 200 1.5 1.6 3.9 1 1 10 0',          # other class
    ]
    (gt / '000001.txt').write_text('\n'.join(rows) + '\n')
    counts = h2h.gt_bin_counts(['000001', '000002'], str(gt))  # 000002 missing
    assert counts == [1, 1, 1, 4]


def test_summarizer_all_sentinel_ale_prints_na(tmp_path):
    """Every ALE value the evaluator's -1.0 empty-cluster sentinel: the
    summarizer must print n/a rows, not crash on a None stats group."""
    rec = {'framework': 'monoloco_tpu', 'mode': 'mono', 'r_seed': 1,
           'n_train': 4, 'n_val': 4, 'hard': False, 'train_wall_s': 1.0,
           'ale': {'easy': -1.0, 'moderate': -1.0, 'hard': -1.0, 'all': -1.0},
           'alp': {'<0.5m': -1.0, '<1m': -1.0, '<2m': -1.0},
           'matched': 0, 'ralp': None}
    path = tmp_path / 'results.jsonl'
    path.write_text(json.dumps(rec) + '\n')
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    out = subprocess.run([sys.executable, tool, '--md', str(path)],
                         capture_output=True, text=True, check=True).stdout
    assert 'n/a' in out


def test_summarizer_refuses_mixed_dataset_configs(tmp_path):
    """A stray differently-scaled leg must abort the summary, not silently
    bias every pooled mean."""
    base = {'framework': 'monoloco_tpu', 'mode': 'stereo', 'train_wall_s': 1.0,
            'ale': {'easy': 1.0, 'moderate': 1.0, 'hard': 1.0, 'all': 1.0},
            'alp': {'<0.5m': 50.0, '<1m': 60.0, '<2m': 70.0},
            'matched': 10, 'ralp': None, 'hard': True}
    recs = [dict(base, r_seed=1, n_train=928, n_val=942),
            dict(base, r_seed=2, n_train=2400, n_val=2400)]
    path = tmp_path / 'results.jsonl'
    path.write_text('\n'.join(json.dumps(r) for r in recs) + '\n')
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    proc = subprocess.run([sys.executable, tool, str(path)],
                          capture_output=True, text=True)
    assert proc.returncode != 0
    assert 'mixed dataset configs' in proc.stderr + proc.stdout


def _rec(seed, ale_all, fw='monoloco_tpu'):
    return {'framework': fw, 'mode': 'mono', 'r_seed': seed,
            'n_train': 10, 'n_val': 10, 'hard': True, 'train_wall_s': 1.0,
            'ale': {'easy': 1.0, 'moderate': 2.0, 'hard': 3.0,
                    'all': ale_all},
            'alp': {'<0.5m': 25.0, '<1m': 40.0, '<2m': 60.0}, 'matched': 10}


def test_pooling_dedups_identical_legs_across_files(tmp_path):
    """A leg re-recorded verbatim in a later round file (overlapping
    snapshot) pools once, silently."""
    p1, p2 = tmp_path / 'a.jsonl', tmp_path / 'b.jsonl'
    p1.write_text(json.dumps(_rec(1, 1.30)) + '\n'
                  + json.dumps(_rec(2, 1.32)) + '\n')
    p2.write_text(json.dumps(_rec(1, 1.30)) + '\n')   # same payload
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    res = subprocess.run([sys.executable, tool, str(p1), str(p2)],
                         capture_output=True, text=True, check=True)
    assert 'monoloco_tpu (2 seeds' in res.stdout
    assert 'WARNING' not in res.stderr


def test_pooling_warns_on_conflicting_duplicate_leg(tmp_path):
    """A duplicate key with a DIFFERENT ale payload (a re-measured leg) must
    not be dropped silently — the pooled table would stand on the stale row."""
    p1, p2 = tmp_path / 'a.jsonl', tmp_path / 'b.jsonl'
    p1.write_text(json.dumps(_rec(1, 1.30)) + '\n')
    p2.write_text(json.dumps(_rec(1, 1.45)) + '\n')   # conflicting re-record
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    res = subprocess.run([sys.executable, tool, str(p1), str(p2)],
                         capture_output=True, text=True, check=True)
    assert 'monoloco_tpu (1 seeds' in res.stdout      # first occurrence kept
    assert 'DIFFERENT ale payload' in res.stderr
    assert 'kept: ale_all=1.3000' in res.stderr


def test_precision_ablation_legs_group_separately(tmp_path):
    """A leg with a 'precision' field (the round-4 f32-pinned ablation set)
    shares (framework, mode, seed, config) with its bf16 twin but holds
    DIFFERENT trained weights — it must pool as its own group, not be
    dropped as a conflicting duplicate of the bf16 leg."""
    p = tmp_path / 'r.jsonl'
    p.write_text(json.dumps(_rec(1, 1.30)) + '\n'
                 + json.dumps(dict(_rec(1, 1.28), precision='float32')) + '\n'
                 + json.dumps(dict(_rec(2, 1.29), precision='float32')) + '\n')
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'h2h_summarize.py')
    res = subprocess.run([sys.executable, tool, str(p)],
                         capture_output=True, text=True, check=True)
    assert 'monoloco_tpu (1 seeds' in res.stdout
    assert 'monoloco_tpu [float32] (2 seeds' in res.stdout
    assert 'WARNING' not in res.stderr
