"""Vmapped parallel hyperparameter search (train/hyp_tuning.py).

The parallel path must be a pure execution-strategy change: same trials, same
math, same winner as the reference-shaped serial loop. Also pins the traced
staircase lr schedule against optax.exponential_decay (the schedule optax.adam
used before lr became a traced argument) and the cross-Trainer program cache.
"""

import argparse
import os

import numpy as np
import jax.numpy as jnp
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
JOINTS = os.path.join(HERE, 'fixture_joints-kitti-mono.json')


def _args(**kw):
    base = dict(joints=JOINTS, mode='mono', out=None, epochs=2, bs=256,
                dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
                hidden_size=64, n_stage=2, r_seed=1, auto_tune_mtl=False,
                no_save=True, print_loss=False)
    base.update(kw)
    return argparse.Namespace(**base)


def _shrunk_hyp(epochs=2):
    from monoloco_tpu.train import HypTuning
    hyp = HypTuning(joints=JOINTS, epochs=epochs, monocular=True, dropout=0.2,
                    multiplier=1, r_seed=1)
    hyp.hidden_list = [64] * 6
    hyp.bs_list = [128] * 6
    hyp.n_stage_list = [2] * 6
    hyp.lr_list = hyp.lr_list[:3]
    return hyp


def test_parallel_matches_serial(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    for d in ('data/models', 'data/logs', 'data/outputs'):
        os.makedirs(d, exist_ok=True)

    monkeypatch.setenv('MONOLOCO_TPU_HYP_PARALLEL', '0')
    best_serial = _shrunk_hyp().train(_args())
    monkeypatch.setenv('MONOLOCO_TPU_HYP_PARALLEL', '1')
    best_parallel = _shrunk_hyp().train(_args())

    # Same winning combination, trial-for-trial identical selection.
    for key in ('lr', 'bs', 'sched_gamma', 'sched_step', 'hidden_size',
                'n_stage', 'best_epoch'):
        assert best_parallel[key] == best_serial[key], key
    # acc_val goes through a vmapped matmul layout; allow float-level noise.
    assert best_parallel['acc_val'] == pytest.approx(best_serial['acc_val'],
                                                     rel=2e-4)


def test_mixed_groups_cover_all_trials(tmp_path, monkeypatch):
    """Trials spanning two (bs, hidden) groups all run and the winner is the
    global argmin across groups."""
    monkeypatch.chdir(tmp_path)
    for d in ('data/models', 'data/logs', 'data/outputs'):
        os.makedirs(d, exist_ok=True)
    monkeypatch.setenv('MONOLOCO_TPU_HYP_PARALLEL', '1')
    hyp = _shrunk_hyp()
    # Groups: {trial 0, trial 2} at hidden 64 (vmapped) and {trial 1} at
    # hidden 32 (singleton fast path — plain program, no vmap).
    hyp.hidden_list = [64, 32, 64, 32, 64, 32]
    hyp.lr_list = hyp.lr_list[:3]
    best = hyp.train(_args())
    assert best['hidden_size'] in (32, 64)
    assert 0 < best['acc_val'] < 20


def test_traced_staircase_matches_optax_schedule():
    """lr0 * gamma^floor(count/ts) (trainer step) == optax.exponential_decay
    staircase (what optax.adam applied when the schedule was baked in)."""
    import optax
    lr0, gamma, ts = 0.002, 0.9, 30
    sched = optax.exponential_decay(init_value=lr0, transition_steps=ts,
                                    decay_rate=gamma, staircase=True)
    counts = np.array([0, 1, 29, 30, 59, 60, 299, 3000])
    ours = lr0 * jnp.power(jnp.float32(gamma),
                           jnp.floor(counts / jnp.float32(ts)))
    theirs = np.array([sched(c) for c in counts])
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6)


def test_equal_shape_trainers_share_programs(tmp_path, monkeypatch):
    """Trainers differing only in lr/gamma/step reuse the SAME jitted programs
    (the lru_cached factory) — one compile serves every such trial."""
    monkeypatch.chdir(tmp_path)
    os.makedirs('data/outputs', exist_ok=True)
    from monoloco_tpu.train.trainer import Trainer
    t1 = Trainer(_args(lr=0.001, sched_gamma=0.8, sched_step=10))
    t2 = Trainer(_args(lr=0.009, sched_gamma=1.0, sched_step=100))
    assert t1._programs is t2._programs
    t3 = Trainer(_args(bs=128))
    assert t3._programs is not t1._programs
