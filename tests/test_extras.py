"""Extra coverage: pallas engine routing, result figures, auto-tune training."""

import argparse
import glob
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
JOINTS = os.path.join(HERE, 'fixture_joints-kitti-mono.json')


def test_int8_routing_policy(monkeypatch):
    """MONOLOCO_TPU_PRECISION=int8 routes serving batches >= _INT8_MIN_ROWS
    through the fused dynamic-int8 kernel and keeps small per-image buckets
    on the exact XLA path (engine.py kernel-selection note)."""
    import monoloco_tpu.network.engine as e
    calls = []

    def fake_int8(packed, inputs, interpret=False):
        calls.append(inputs.shape[0])
        return e.folded_forward(packed['folded'], inputs, arch='loco')

    import monoloco_tpu.ops as ops
    monkeypatch.setattr(ops, 'fused_loco_forward_dyn8_auto', fake_int8)
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.models import init_loco_params, fold_eval_params
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 2)
    folded = fold_eval_params(params, bn, arch='loco')
    weights = {'folded': folded, 'packed_int8': {'folded': folded}}
    x_small = jnp.zeros((16, 34))
    x_big = jnp.zeros((e._INT8_MIN_ROWS, 34))
    e._mlp_forward(weights, x_small, 'loco')
    assert calls == []                       # small bucket: XLA path
    e._mlp_forward(weights, x_big, 'loco')
    assert calls == [e._INT8_MIN_ROWS]       # big batch: int8 kernel
    # Without packed weights (default precision) nothing routes to the kernel.
    e._mlp_forward({'folded': folded}, x_big, 'loco')
    assert calls == [e._INT8_MIN_ROWS]


def test_int8_engine_routing():
    """MONOLOCO_TPU_PRECISION=int8 builds packed int8 weights at Loco init
    and a large forward_batch runs through the fused kernel (interpret mode
    off-TPU), tracking the exact path within the quantization budget."""
    code = '''
import numpy as np, jax
import monoloco_tpu.network.engine as e
from monoloco_tpu.models import init_loco_params
params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 2)
net = e.Loco((params, bn), mode="mono")
assert "packed_int8" in net.mlp_weights, "int8 weights not packed at init"
assert net.mlp_weights["packed_int8"][2].dtype == jax.numpy.int8
kps = np.random.RandomState(0).rand(3, 3, 17) * 300
kk = [[718., 0., 600.], [0., 718., 180.], [0., 0., 1.]]
d = net.forward(kps, kk)                     # small bucket: exact path
# 256 images x 8-bucket = 2048 rows >= _INT8_MIN_ROWS: kernel path.
outs = net.forward_batch([kps[:1]] * 256, [kk] * 256)
print("OK", d["d"].shape, len(outs))
'''
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu',
               MONOLOCO_TPU_PRECISION='int8')
    res = subprocess.run([sys.executable, '-c', code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'OK (3, 1) 256' in res.stdout


def test_result_figures_render(tmp_path):
    """show_results / show_spread / show_task_error render from eval stats."""
    from collections import defaultdict
    from monoloco_tpu.visuals import show_results, show_spread, show_task_error
    clusters = ('easy', 'moderate', 'hard', 'all', '3', '5', '7', '9', '11',
                '13', '15', '17', '19', '21', '23', '25', '27', '29', '31', '49')
    stats = defaultdict(lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(float))))
    rng = np.random.RandomState(0)
    for clst in clusters:
        stats['test']['monoloco_pp'][clst]['mean'] = 0.5 + rng.rand()
        stats['test']['monoloco_pp'][clst]['cnt'] = 10
        stats['test']['monoloco_pp'][clst]['std_ale'] = 0.3
    d = str(tmp_path)
    show_results(stats, clusters, 'monoloco_pp', d, show=False, save=True)
    show_spread(stats, clusters, 'monoloco_pp', d, show=False, save=True)
    show_task_error(d, show=False, save=True)
    assert os.path.exists(os.path.join(d, 'results_monoloco_pp.png'))
    assert os.path.exists(os.path.join(d, 'spread_monoloco_pp.png'))
    assert os.path.exists(os.path.join(d, 'task_error.png'))


def test_auto_tune_training(tmp_path):
    """--auto_tune_mtl trains, reports sigmas, and the loss stays finite."""
    from monoloco_tpu.train import Trainer
    args = argparse.Namespace(
        joints=JOINTS, mode='mono', out=str(tmp_path / 'at.pkl'), epochs=4,
        bs=128, dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
        hidden_size=64, n_stage=2, r_seed=1, auto_tune_mtl=True,
        no_save=False, print_loss=False)
    t = Trainer(args)
    t.train()
    dic_err, _ = t.evaluate()
    sigmas = dic_err['val']['sigmas']
    assert len(sigmas) == len(t.tasks)
    assert all(np.isfinite(s) and s > 0 for s in sigmas)
    assert os.path.exists(str(tmp_path / 'at.pkl'))


def test_predict_empty_detections(tmp_path):
    """An image whose pifpaf json has no detections must not crash and must
    emit an empty result json."""
    import json
    import shutil
    from monoloco_tpu.predict import predict
    from monoloco_tpu.models import init_loco_params, save_checkpoint
    import jax
    img = str(tmp_path / 'empty.png')
    shutil.copy(os.path.join(HERE, 'fixture_002282.png'), img)
    with open(img + '.pifpaf.json', 'w') as f:
        json.dump([], f)
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    model = str(tmp_path / 'm.pkl')
    save_checkpoint(model, params, bn)
    args = argparse.Namespace(
        images=[img], glob=None, checkpoint=None, json_dir=None,
        output_directory=str(tmp_path), output_types=['json', 'multi'],
        json_output=None, no_save=False, hide_distance=False, dpi=100,
        long_edge=None, activities=[], mode='mono', model=model, net=None,
        path_gt=None, z_max=100, n_dropout=0, dropout=0.2, show_all=False,
        webcam=False, camera=0, calibration='kitti', focal_length=5.7,
        threshold_prob=0.25, threshold_dist=2.5, radii=(0.3, 0.5, 1))
    predict(args)
    with open(str(tmp_path / 'out_empty.png.monoloco.json')) as f:
        dic = json.load(f)
    assert dic == {} or not dic.get('dds_pred')


def test_trainer_profile_flag(tmp_path):
    """--profile writes a jax profiler trace directory without crashing."""
    from monoloco_tpu.train import Trainer
    prof_dir = str(tmp_path / 'prof')
    args = argparse.Namespace(
        joints=JOINTS, mode='mono', out=str(tmp_path / 'p.pkl'), epochs=2,
        bs=128, dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
        hidden_size=64, n_stage=2, r_seed=1, auto_tune_mtl=False,
        no_save=True, print_loss=False, profile=prof_dir)
    t = Trainer(args)
    t.train()
    assert os.path.isdir(prof_dir) and os.listdir(prof_dir)


def test_per_epoch_loop_matches_chunked_scan(tmp_path, monkeypatch):
    """The legacy per-epoch dispatch loop (MONOLOCO_TPU_EPOCH_CHUNK=1) and the
    chunked multi-epoch scan must produce identical trajectories and identical
    best-epoch selection."""
    import jax
    from monoloco_tpu.train import Trainer

    def run(chunk):
        monkeypatch.setattr(Trainer, 'CHUNK_EPOCHS', chunk)
        args = argparse.Namespace(
            joints=JOINTS, mode='mono', out=str(tmp_path / f'c{chunk}.pkl'),
            epochs=7, bs=128, dropout=0.2, lr=0.002, sched_step=5,
            sched_gamma=0.9, hidden_size=64, n_stage=2, r_seed=5,
            auto_tune_mtl=False, no_save=True, print_loss=False)
        t = Trainer(args)
        best_epoch = t.train()
        v = np.asarray(t._val_metrics(t.params, t.log_sigmas, t.bn_state,
                                      t.x_va, t.y_va))
        return best_epoch, v, t.params

    be1, v1, p1 = run(1)
    be10, v10, p10 = run(10)
    assert be1 == be10
    np.testing.assert_allclose(v1, v10, rtol=0, atol=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p1, p10)


def test_resume_reproduces_straight_run(tmp_path):
    """Training 2 epochs + resuming for 2 more must reproduce a straight
    4-epoch run: per-epoch RNG is fold_in(train_key, epoch) and the optimizer
    state (incl. LR-schedule count) is checkpointed."""
    from monoloco_tpu.train import Trainer

    def make_args(epochs, out, resume=None):
        return argparse.Namespace(
            joints=JOINTS, mode='mono', out=out, epochs=epochs, bs=128,
            dropout=0.2, lr=0.002, sched_step=5, sched_gamma=0.9,
            hidden_size=64, n_stage=2, r_seed=3, auto_tune_mtl=False,
            no_save=False, print_loss=False, resume=resume)

    # Straight 4-epoch run.
    t_a = Trainer(make_args(4, str(tmp_path / 'a.pkl')))
    t_a.train()
    v_a = np.asarray(t_a._val_metrics(t_a.params, t_a.log_sigmas, t_a.bn_state,
                                      t_a.x_va, t_a.y_va))

    # 2 epochs, checkpoint, resume 2 more.
    t_b1 = Trainer(make_args(2, str(tmp_path / 'b1.pkl')))
    t_b1.train()
    t_b1.evaluate()
    t_b2 = Trainer(make_args(4, str(tmp_path / 'b2.pkl'),
                             resume=str(tmp_path / 'b1.pkl')))
    assert t_b2.start_epoch == 2
    t_b2.train()
    v_b = np.asarray(t_b2._val_metrics(t_b2.params, t_b2.log_sigmas, t_b2.bn_state,
                                       t_b2.x_va, t_b2.y_va))
    np.testing.assert_allclose(v_a, v_b, rtol=1e-4, atol=1e-4)

    # Resume from an .orbax training checkpoint must reproduce the
    # pickle-resume trajectory exactly (full resume state — opt_state,
    # final params/BN, epoch — round-trips through the orbax directory).
    import pytest
    pytest.importorskip('orbax.checkpoint')
    t_c1 = Trainer(make_args(2, str(tmp_path / 'c1.orbax')))
    t_c1.train()
    t_c1.evaluate()
    t_c2 = Trainer(make_args(4, str(tmp_path / 'c2.pkl'),
                             resume=str(tmp_path / 'c1.orbax')))
    assert t_c2.start_epoch == 2
    t_c2.train()
    v_c = np.asarray(t_c2._val_metrics(t_c2.params, t_c2.log_sigmas, t_c2.bn_state,
                                       t_c2.x_va, t_c2.y_va))
    np.testing.assert_allclose(v_c, v_b, rtol=0, atol=0)


def test_auto_tune_resume_roundtrips_orbax(tmp_path):
    """Auto-tune log_sigmas survive the flag-prefixed orbax encoding: resume
    from .orbax reproduces the pickle-resume trajectory, and a flag mismatch
    between the checkpoint and --auto_tune_mtl is rejected."""
    import pytest
    pytest.importorskip('orbax.checkpoint')
    from monoloco_tpu.train import Trainer

    def make_args(epochs, out, resume=None, auto=True):
        return argparse.Namespace(
            joints=JOINTS, mode='mono', out=out, epochs=epochs, bs=128,
            dropout=0.2, lr=0.002, sched_step=5, sched_gamma=0.9,
            hidden_size=64, n_stage=2, r_seed=3, auto_tune_mtl=auto,
            no_save=False, print_loss=False, resume=resume)

    t_p1 = Trainer(make_args(2, str(tmp_path / 'p1.pkl')))
    t_p1.train()
    t_p1.evaluate()
    t_p2 = Trainer(make_args(4, str(tmp_path / 'p2.pkl'),
                             resume=str(tmp_path / 'p1.pkl')))
    t_p2.train()
    v_pkl = np.asarray(t_p2._val_metrics(t_p2.params, t_p2.log_sigmas,
                                         t_p2.bn_state, t_p2.x_va, t_p2.y_va))

    t_o1 = Trainer(make_args(2, str(tmp_path / 'o1.orbax')))
    t_o1.train()
    t_o1.evaluate()
    t_o2 = Trainer(make_args(4, str(tmp_path / 'o2.pkl'),
                             resume=str(tmp_path / 'o1.orbax')))
    assert t_o2.start_epoch == 2
    assert t_o2.log_sigmas is not None and t_o2.log_sigmas.shape[0] == len(t_o2.tasks)
    t_o2.train()
    v_orb = np.asarray(t_o2._val_metrics(t_o2.params, t_o2.log_sigmas,
                                         t_o2.bn_state, t_o2.x_va, t_o2.y_va))
    np.testing.assert_allclose(v_orb, v_pkl, rtol=0, atol=0)

    with pytest.raises(ValueError, match='auto_tune_mtl'):
        Trainer(make_args(4, str(tmp_path / 'x.pkl'),
                          resume=str(tmp_path / 'o1.orbax'), auto=False))


def test_eval_stats_matches_host_numpy(tmp_path):
    """The single-dispatch eval_stats program equals a per-subset host
    computation: masked losses == subset losses, error moments, bi coverage,
    and the reconstructed std matches numpy's ddof=1 std per cluster."""
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.train.trainer import Trainer
    from monoloco_tpu.train.losses import composite_losses

    # out under tmp_path keeps the test hermetic: out=None makes Trainer
    # require a cwd-relative data/outputs dir (reference trainer.py:72-78).
    t = Trainer(argparse.Namespace(
        joints=JOINTS, mode='mono', out=str(tmp_path / 'm.pkl'), epochs=1,
        bs=128, dropout=0.2, lr=0.002, sched_step=5, sched_gamma=0.9,
        hidden_size=64, n_stage=2, r_seed=0, auto_tune_mtl=False,
        no_save=True, print_loss=False))
    rng = np.random.RandomState(0)
    n1, n2 = 13, 7
    x = np.asarray(rng.randn(n1 + n2, 34), np.float32)
    y = np.concatenate([rng.rand(n1 + n2, 3).astype(np.float32),
                        (rng.rand(n1 + n2, 1) * 30 + 4).astype(np.float32),
                        rng.randn(n1 + n2, 5).astype(np.float32)], axis=1)
    masks = np.zeros((2, n1 + n2), np.float32)
    masks[0, :n1] = 1.0
    masks[1, n1:] = 1.0

    losses, stats = t._programs.eval_stats(
        t.params, t.bn_state, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(masks))
    losses, stats = np.asarray(losses), np.asarray(stats)

    from monoloco_tpu.models import loco_forward
    from monoloco_tpu.network.decode import extract_outputs, extract_labels
    out = np.asarray(loco_forward(t.params, t.bn_state, jnp.asarray(x),
                                  train=False)[0])
    for g, sl in enumerate((slice(0, n1), slice(n1, n1 + n2))):
        want = [float(v) for v in composite_losses(
            jnp.asarray(out[sl]), jnp.asarray(y[sl]), t.tasks, phase='val')]
        np.testing.assert_allclose(losses[g], want, rtol=1e-5, atol=1e-6)
        dec = extract_outputs(out[sl])
        gt = extract_labels(y[sl])
        errs = np.abs(np.asarray(dec['d']) - np.asarray(gt['d']))[:, 0]
        bis = np.asarray(dec['bi'])[:, 0]
        bi_mean, bi_cov, err_sum, err_sumsq, cnt, _aux = stats[g]
        assert int(cnt) == sl.stop - sl.start
        np.testing.assert_allclose(bi_mean, bis.mean(), rtol=1e-5)
        np.testing.assert_allclose(bi_cov, (errs <= bis).mean(), rtol=1e-6)
        np.testing.assert_allclose(err_sum, errs.sum(), rtol=1e-5)
        n = int(cnt)
        mean = err_sum / n
        var = max(0.0, (err_sumsq - n * mean * mean) / (n - 1))
        np.testing.assert_allclose(var ** 0.5, errs.std(ddof=1), rtol=1e-3)


def test_export_torch_state_dict_roundtrip():
    """Reverse checkpoint export (tools/export_torch.py): exporting our params
    to the reference state_dict layout and converting back is bit-identical,
    for both architectures. (Loading the export into the actual reference
    torch model is covered by tools/parity_check.py, marked slow.)"""
    import jax
    from monoloco_tpu.models import init_loco_params, init_monoloco_params
    from monoloco_tpu.models.checkpoint import (
        export_torch_state_dict, convert_torch_state_dict)

    for arch, init, dims in (
            ('loco', init_loco_params, (68, 10, 128, 3)),
            ('monoloco', init_monoloco_params, (34, 2, 64, 2))):
        params, bn = init(jax.random.PRNGKey(5), *dims)
        sd = export_torch_state_dict(params, bn, arch=arch)
        # torch layout invariants: Linear weight is (out, in); BN counters exist
        assert sd['w1.weight'].shape == (dims[2], dims[0])
        assert sd['batch_norm1.num_batches_tracked'].dtype == np.int64
        back_p, back_bn = convert_torch_state_dict(
            {k: v for k, v in sd.items() if 'num_batches_tracked' not in k},
            arch=arch)
        for got, want in ((back_p, params), (back_bn, bn)):
            flat_g = jax.tree_util.tree_leaves_with_path(got)
            flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
            assert len(flat_g) == len(flat_w)
            for path, leaf in flat_g:
                np.testing.assert_array_equal(np.asarray(leaf),
                                              np.asarray(flat_w[path]), err_msg=str(path))


def test_evaluate_debug_stats(tmp_path, capsys):
    """evaluate(debug=True) prints the headless distribution stats (the
    reference's debug_plots histograms, trainer.py:371-382, as summaries)."""
    import argparse
    from monoloco_tpu.train import Trainer
    args = argparse.Namespace(
        joints=os.path.join(REPO, 'tests', 'fixture_joints-kitti-mono.json'),
        mode='mono', out=str(tmp_path / 'm.pkl'), epochs=1, bs=512,
        dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
        hidden_size=32, n_stage=2, r_seed=1, auto_tune_mtl=False,
        no_save=True, print_loss=False)
    t = Trainer(args)
    t.train()
    t.evaluate(debug=True)
    out = capsys.readouterr().out
    assert 'debug shoulder-hip height' in out
    assert 'debug labels' in out


def test_trainer_honors_precision_env():
    """MONOLOCO_TPU_PRECISION=float32 must reach the TRAINER's jitted
    programs too (round-3 gap: it was inference-only), so f32-pinned
    head-to-head legs measure what they claim. Smoke: a 2-epoch train under
    the env runs and the wrapper is active."""
    code = '''
import argparse, os
import monoloco_tpu.utils.precision as p
assert p.MATMUL_PRECISION == "float32" and p.PIN_F32
from monoloco_tpu.train import Trainer
args = argparse.Namespace(
    joints="tests/fixture_joints-kitti-mono.json", mode="mono", out=None,
    epochs=2, bs=64, dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
    hidden_size=64, n_stage=2, r_seed=1, auto_tune_mtl=False, no_save=True,
    print_loss=False)
t = Trainer(args)
t.train()
print("F32 TRAIN OK")
'''
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu',
               MONOLOCO_TPU_PRECISION='float32')
    res = subprocess.run([sys.executable, '-c', code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'F32 TRAIN OK' in res.stdout


def test_f32_pin_and_stereo_aux_idx():
    """MONOLOCO_TPU_PRECISION=f32 pins the engine's matmul precision (shared
    knob, utils/precision.py), and the stereo forward exposes aux_idx for
    median_disparity."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu',
               MONOLOCO_TPU_PRECISION='f32')
    prog = """
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from monoloco_tpu.models import init_loco_params
from monoloco_tpu.network import Loco, load_calibration
import monoloco_tpu.network.engine as e
assert e._PIN_F32 and e._MATMUL_PRECISION == 'float32'
params, bn = init_loco_params(jax.random.PRNGKey(0), 68, 10, 128, 2)
net = Loco((params, bn), mode='stereo', linear_size=128, n_stage=2)
assert 'packed_int8' not in net.mlp_weights    # int8 is its own opt-in
kk = load_calibration('kitti', (1238, 374))
rng = np.random.RandomState(0)
mk = lambda n: [[list(rng.rand(17)*900), list(rng.rand(17)*300), list(rng.rand(17))]
                for _ in range(n)]
kl, kr = mk(3), mk(2)
ds = net.forward(kl, kk, keypoints_r=kr)
assert len(ds['aux_idx']) == 3 and (np.asarray(ds['aux_idx']) < 2).all()
from monoloco_tpu.network.engine import median_disparity
median_disparity(dict(ds), kl, kr)   # mask=None path uses aux_idx
print('PALLAS F32 OK')
"""
    res = subprocess.run([sys.executable, '-c', prog], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'PALLAS F32 OK' in res.stdout


def test_resume_zero_epochs_preserves_best_and_epoch(tmp_path):
    """Resuming with no additional epochs must be a no-op: the served weights
    stay the checkpoint's best-validation weights (not the final training
    state) and the saved meta 'epoch' does not inflate."""
    import pickle
    import jax
    from monoloco_tpu.train import Trainer

    def make_args(epochs, out, resume=None):
        return argparse.Namespace(
            joints=JOINTS, mode='mono', out=out, epochs=epochs, bs=128,
            dropout=0.2, lr=0.002, sched_step=5, sched_gamma=0.9,
            hidden_size=64, n_stage=2, r_seed=3, auto_tune_mtl=False,
            no_save=False, print_loss=False, resume=resume)

    a_path = str(tmp_path / 'a.pkl')
    t_a = Trainer(make_args(4, a_path))
    t_a.train()
    t_a.evaluate()
    with open(a_path, 'rb') as f:
        blob_a = pickle.load(f)
    assert blob_a['meta']['epoch'] == 4
    assert blob_a['meta']['best_val_acc'] is not None

    b_path = str(tmp_path / 'b.pkl')
    t_b = Trainer(make_args(4, b_path, resume=a_path))  # zero new epochs
    t_b.train()
    t_b.evaluate()
    with open(b_path, 'rb') as f:
        blob_b = pickle.load(f)
    # epoch must not inflate past the epochs actually run
    assert blob_b['meta']['epoch'] == 4, blob_b['meta']['epoch']
    # served weights must still be the prior best, not the final state
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(blob_a['params']),
            jax.tree_util.tree_leaves_with_path(blob_b['params'])):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(pa))
    assert blob_b['meta']['best_val_acc'] == blob_a['meta']['best_val_acc']
