"""Hyperparameter search test (slow: trains 6 trial models)."""

import glob
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
JOINTS = os.path.join(HERE, 'fixture_joints-kitti-mono.json')


@pytest.mark.slow
def test_hyp_tuning_runs(tmp_path, monkeypatch):
    import argparse
    from monoloco_tpu.train import HypTuning
    monkeypatch.chdir(tmp_path)
    os.makedirs('data/models', exist_ok=True)
    os.makedirs('data/logs', exist_ok=True)
    os.makedirs('data/outputs', exist_ok=True)
    args = argparse.Namespace(
        joints=JOINTS, mode='mono', out=None, epochs=2, bs=256, dropout=0.2,
        lr=0.002, sched_step=30, sched_gamma=0.98, hidden_size=64, n_stage=2,
        r_seed=1, auto_tune_mtl=False, no_save=True, print_loss=False)
    hyp = HypTuning(joints=JOINTS, epochs=2, monocular=True, dropout=0.2,
                    multiplier=1, r_seed=1)
    # Shrink the search space for the test: tiny hidden sizes only.
    hyp.hidden_list = [64] * 6
    hyp.bs_list = [128] * 6
    hyp.lr_list = hyp.lr_list[:2]
    best = hyp.train(args)
    assert 'lr' in best and 'acc_val' in best
    assert glob.glob('data/models/hyp-monoloco-*.pkl')
