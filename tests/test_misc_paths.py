"""Smaller CLI/API paths: geometric baseline, webcam gating, json output."""

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


def test_geometric_baseline_on_joints(tmp_path, monkeypatch):
    """eval --geometric on a prep-produced joints file."""
    from make_synthetic_kitti import make_dataset
    make_dataset(str(tmp_path), n_train=8, n_val=4, seed=21)
    monkeypatch.chdir(tmp_path)
    from monoloco_tpu.prep import PreprocessKitti
    prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
    path_joints, _ = prep.run()
    from monoloco_tpu.eval import geometric_baseline
    errors = geometric_baseline(path_joints)
    assert 'all' in errors


def test_geometric_coordinates_depth_accuracy():
    """Batched least-squares depth should recover synthetic depths roughly."""
    import numpy as np
    from make_synthetic_kitti import make_person, FX, CX, CY
    from monoloco_tpu.eval import geometric_coordinates
    rng = np.random.RandomState(0)
    kk = [[FX, 0, CX], [0, FX, CY], [0, 0, 1]]
    kps, zs = [], []
    for z in (8.0, 15.0, 25.0):
        flat, _, _ = make_person(0.5, z, rng)
        arr = np.asarray(flat).reshape(17, 3).T
        kps.append(arr)
        zs.append(z)
    zzs, centers = geometric_coordinates(np.asarray(kps), kk)
    for z_est, z_gt in zip(zzs, zs):
        assert abs(z_est - z_gt) / z_gt < 0.35  # avg-height prior: rough depth
    assert centers.shape == (3, 3)


def test_webcam_requires_cv2(monkeypatch):
    """The no-cv2 error path must fire even where cv2 IS installed: setting
    sys.modules['cv2'] = None makes `import cv2` raise ImportError, which is
    exactly the environment the gate protects against."""
    import argparse
    from monoloco_tpu.visuals.webcam import webcam
    monkeypatch.setitem(sys.modules, 'cv2', None)
    args = argparse.Namespace(mode='mono', z_max=10, long_edge=None, model=None,
                              net=None, n_dropout=0, dropout=0.2, checkpoint=None,
                              camera=0, calibration='custom', focal_length=5.7,
                              activities=[])
    with pytest.raises(ImportError, match='cv2'):
        webcam(args)


def test_predict_json_output_flag(tmp_path, monkeypatch):
    """--json-output re-emits the pose annotations as a predictions json."""
    import shutil
    from monoloco_tpu.predict import predict
    import argparse
    img = str(tmp_path / 'im.png')
    shutil.copy(os.path.join(REPO, 'tests', 'fixture_002282.png'), img)
    shutil.copy(os.path.join(REPO, 'tests', 'fixture_002282.pifpaf.json'),
                img + '.pifpaf.json')
    args = argparse.Namespace(
        images=[img], glob=None, checkpoint=None, json_dir=None,
        output_directory=str(tmp_path), output_types=[], json_output=True,
        no_save=False, hide_distance=False, dpi=100, long_edge=None,
        activities=[], mode='keypoints', model=None, net=None,
        path_gt=None, z_max=100, n_dropout=0, dropout=0.2,
        show_all=False, webcam=False, camera=0, calibration='kitti',
        focal_length=5.7, threshold_prob=0.25, threshold_dist=2.5,
        radii=(0.3, 0.5, 1))
    predict(args)
    out = str(tmp_path / 'im.png.predictions.json')
    assert os.path.exists(out)
    with open(out) as f:
        anns = json.load(f)
    assert len(anns) == 16

    # regression: a nonexistent -o directory is created before the
    # --json-output write, not only before the figure/json outputs
    args.output_directory = str(tmp_path / 'not_yet' / 'deeper')
    predict(args)
    assert os.path.exists(os.path.join(args.output_directory,
                                       'im.png.predictions.json'))


def test_process_activity_with_close_pair(tmp_path, monkeypatch):
    """Regression: two pedestrians within 2 m exercise the f-formation branch
    of the social-distance gt augmentation (label indices yaw=9, dd=3)."""
    import numpy as np
    from make_synthetic_kitti import write_scene
    rng = np.random.RandomState(0)
    # Facing each other along x (facing dir is (cos ry, -sin ry) in x-z),
    # 1.2 m apart -> inside THRESHOLD_DIST.
    people = [(-0.6, 8.0, 0.0), (0.6, 8.0, 3.1), (5.0, 20.0, 0.0)]
    name = write_scene(str(tmp_path), 1, people, rng)
    name_tr = write_scene(str(tmp_path), 2, [(2.0, 12.0, 0.3)], rng)
    (tmp_path / 'splits').mkdir()
    (tmp_path / 'splits' / 'kitti_train.txt').write_text(name_tr + '\n')
    (tmp_path / 'splits' / 'kitti_val.txt').write_text(name + '\n')
    monkeypatch.chdir(tmp_path)
    from monoloco_tpu.prep import PreprocessKitti
    prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
    prep.process_activity()
    out = (tmp_path / 'data' / 'kitti' / 'gt_activity' / (name + '.txt')).read_text()
    flags = [line.split()[-1] for line in out.strip().splitlines()]
    assert set(flags) <= {'0', '1'}
    assert '1' in flags  # the close, facing pair is a positive


def test_eval_variance_cli_dispatch(tmp_path, monkeypatch):
    """`eval --variance` runs the joints-variance study end to end."""
    import shutil
    here = os.path.dirname(os.path.abspath(__file__))
    shutil.copy(os.path.join(here, 'fixture_joints-kitti-stereo.json'),
                tmp_path / 'joints_pifpaf.json')
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, 'argv', [
        'monoloco_tpu.run', 'eval', '--variance',
        '--joints', str(tmp_path / 'joints')])
    from monoloco_tpu.run import main
    main()
    assert (tmp_path / 'figures' / 'joints_variance.png').exists()


def test_predict_accepts_reference_pifpaf_flags(tmp_path, monkeypatch):
    """Every reference predict flag parses here (pifpaf/visual passthroughs
    included), so reference invocations port unmodified."""
    from monoloco_tpu.run import cli
    monkeypatch.setattr(sys, 'argv', [
        'monoloco_tpu.run', 'predict', 'img.png', '--seed-threshold', '0.4',
        '--instance-threshold', '0.1', '--font-size', '12', '--white-overlay',
        '--monocolor-connections', '--disable-cuda', '--precise-rescaling'])
    args = cli()
    assert args.seed_threshold == 0.4 and args.instance_threshold == 0.1
    assert args.white_overlay == 0.8          # nargs='?' const
    assert args.monocolor_connections and args.disable_cuda
    assert args.fast_rescaling is False       # --precise-rescaling clears it


def test_eval_nuscenes_reeval_cli(tmp_path, monkeypatch):
    """`eval --dataset nuscenes` re-evaluates a trained model on a joints file
    via Trainer.evaluate(load=True) (reference run.py:203-206)."""
    import argparse
    from monoloco_tpu.train import Trainer
    joints = os.path.join(REPO, 'tests', 'fixture_joints-kitti-mono.json')
    model = str(tmp_path / 'nu.pkl')
    targs = argparse.Namespace(
        joints=joints, mode='mono', out=model, epochs=2, bs=64, dropout=0.2,
        lr=0.002, sched_step=30, sched_gamma=0.98, hidden_size=64, n_stage=2,
        r_seed=1, auto_tune_mtl=False, no_save=False, print_loss=False)
    t = Trainer(targs)
    t.train()
    t.evaluate()

    monkeypatch.chdir(tmp_path)
    os.makedirs('data/outputs')   # Trainer asserts the default out dir exists
    monkeypatch.setattr(sys, 'argv', [
        'monoloco_tpu.run', 'eval', '--dataset', 'nuscenes',
        '--joints', joints, '--model', model, '--mode', 'mono',
        '--hidden_size', '64', '--n_stage', '2'])
    from monoloco_tpu.run import main
    main()   # prints per-cluster stats; must not raise


def test_find_pifpaf_json_priority(tmp_path):
    """--json_dir candidates win over image-sibling files; first-match order
    is stable (predict.py:find_pifpaf_json)."""
    from monoloco_tpu.predict import find_pifpaf_json
    img = tmp_path / 'imgs' / 'scene.png'
    img.parent.mkdir()
    img.write_bytes(b'x')
    jd = tmp_path / 'jsons'
    jd.mkdir()
    assert find_pifpaf_json(str(img)) is None
    sibling = img.parent / 'scene.png.pifpaf.json'
    sibling.write_text('[]')
    assert find_pifpaf_json(str(img)) == str(sibling)
    assert find_pifpaf_json(str(img), json_dir=str(jd)) == str(sibling)
    in_dir = jd / 'scene.png.pifpaf.json'
    in_dir.write_text('[]')
    assert find_pifpaf_json(str(img), json_dir=str(jd)) == str(in_dir)
    stem = jd / 'scene.pifpaf.json'
    stem.write_text('[]')
    # full-basename candidate outranks the stem candidate within json_dir
    assert find_pifpaf_json(str(img), json_dir=str(jd)) == str(in_dir)
    in_dir.unlink()
    assert find_pifpaf_json(str(img), json_dir=str(jd)) == str(stem)


def test_bench_generate_full_scale_tool(tmp_path):
    """tools/bench_generate_full_scale.py at tiny scale: builds the dataset,
    serves it through GenerateKitti, and reports a complete txt set."""
    import json as _json
    import subprocess
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    root = str(tmp_path / 'fs')
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'bench_generate_full_scale.py'),
         root, '--n_val', '4'],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    rec = _json.loads(res.stdout.strip().splitlines()[-1])
    assert rec['txt_written'] == rec['n_images'] == 4
