"""End-to-end KITTI pipeline test on a synthetic mini dataset:
prep -> train -> generate txt detections -> ALE/ALP evaluation (+ C++ eval).

This exercises the full data path the reference supports (SURVEY.md sections
3.3/3.4): gt parsing with spherical labels, IoU matching, stereo-flip
augmentation, joints JSON schema, KITTI txt generation and the evaluator.
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))

from make_synthetic_kitti import make_dataset  # noqa: E402


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synthetic_kitti')
    make_dataset(str(root), n_train=14, n_val=6, seed=3)
    return str(root)


@pytest.fixture(scope='module')
def in_root(kitti_root):
    """Pipelines use relative paths; run them from the dataset root."""
    old = os.getcwd()
    os.chdir(kitti_root)
    yield kitti_root
    os.chdir(old)


class TestPrep:
    def test_prep_mono(self, in_root):
        from monoloco_tpu.prep import PreprocessKitti
        prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
        path_joints, path_names = prep.run()
        assert os.path.exists(path_joints) and os.path.exists(path_names)
        import json
        with open(path_joints) as f:
            dic = json.load(f)
        assert len(dic['train']['X']) > 10
        assert len(dic['val']['X']) > 3
        assert len(dic['train']['X'][0]) == 34
        assert len(dic['train']['Y'][0]) == 10
        # Spherical labels: r >= |z| and r in plausible range
        ys = np.array(dic['train']['Y'])
        assert (ys[:, 3] >= ys[:, 2] - 1e-4).all()
        assert (ys[:, 3] < 60).all()

    def test_prep_stereo(self, in_root):
        from monoloco_tpu.prep import PreprocessKitti
        prep = PreprocessKitti(dir_ann='annotations', mode='stereo', iou_min=0.3)
        path_joints, _ = prep.run()
        import json
        with open(path_joints) as f:
            dic = json.load(f)
        assert len(dic['train']['X']) > 10
        assert len(dic['train']['X'][0]) == 68
        assert len(dic['train']['Y'][0]) == 11
        # The synthetic disparities are exact: most training pairs should be
        # flagged as true stereo matches.
        flags = np.array(dic['train']['Y'])[:, 10]
        assert flags.mean() > 0.2


class TestTrainGenerateEval:
    @pytest.fixture(scope='class')
    def trained(self, in_root):
        import argparse
        from monoloco_tpu.train import Trainer
        joints = sorted(glob.glob('data/arrays/joints-kitti-mono-*.json'))[-1]
        args = argparse.Namespace(
            joints=joints, mode='mono', out='data/outputs/synth.pkl', epochs=60,
            bs=256, dropout=0.2, lr=0.003, sched_step=30, sched_gamma=0.98,
            hidden_size=128, n_stage=2, r_seed=1, auto_tune_mtl=False,
            no_save=False, print_loss=False)
        t = Trainer(args)
        t.train()
        t.evaluate()
        return 'data/outputs/synth.pkl'

    def test_generate_and_eval(self, in_root, trained):
        import argparse
        from monoloco_tpu.eval import GenerateKitti, EvalKitti
        args = argparse.Namespace(
            mode='mono', model=trained, dir_ann='annotations', n_dropout=0,
            dropout=0.2, hidden_size=128, n_stage=2, baselines=False,
            generate_official=False, verbose=True, save=False, show=False)
        gen = GenerateKitti(args)
        gen.run()
        txts = glob.glob('data/kitti/monoloco_pp/*.txt')
        assert len(txts) == 6  # all val scenes
        # txt format: 18 columns
        with open(txts[0]) as f:
            parts = f.readline().split()
        assert parts[0] == 'Pedestrian' and len(parts) == 18

        ev = EvalKitti(args)
        # The toy model's Laplace spread is wide, so its confidences sit below
        # the production threshold; include everything for the pipeline test.
        ev.dic_thresh_conf['monoloco_pp'] = -100
        ev.run()
        ale_all = ev.dic_stats['test']['monoloco_pp']['all']['mean']
        assert 0 < ale_all < 15  # 60-epoch toy model: sane but loose bound
        assert ev.errors['monoloco_pp']['all'], "no matched detections"
        assert os.path.exists(ev.path_results)

    def test_generate_stereo(self, in_root):
        """MonStereo generate path: train a tiny stereo model and emit txts."""
        import argparse
        from monoloco_tpu.train import Trainer
        from monoloco_tpu.eval import GenerateKitti
        joints = sorted(glob.glob('data/arrays/joints-kitti-stereo-*.json'))[-1]
        targs = argparse.Namespace(
            joints=joints, mode='stereo', out='data/outputs/synth_stereo.pkl',
            epochs=5, bs=256, dropout=0.2, lr=0.003, sched_step=30,
            sched_gamma=0.98, hidden_size=128, n_stage=2, r_seed=1,
            auto_tune_mtl=False, no_save=False, print_loss=False)
        t = Trainer(targs)
        t.train()
        t.evaluate()
        gargs = argparse.Namespace(
            mode='stereo', model='data/outputs/synth_stereo.pkl',
            dir_ann='annotations', n_dropout=0, dropout=0.2, hidden_size=128,
            n_stage=2, baselines=False, generate_official=False)
        GenerateKitti(gargs).run()
        txts = glob.glob('data/kitti/monstereo/*.txt')
        assert len(txts) == 6
        with open(txts[0]) as f:
            assert len(f.readline().split()) == 18

    def test_activity_prep_and_eval(self, in_root, trained):
        """Social-distance gt augmentation + ActivityEvaluator on KITTI."""
        import argparse
        from monoloco_tpu.prep import PreprocessKitti
        prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
        prep.process_activity()
        files = glob.glob('data/kitti/gt_activity/*.txt')
        assert len(files) == 6
        with open(files[0]) as f:
            line = f.readline().split()
        assert line[-1] in ('0', '1') and len(line) == 16

        from monoloco_tpu.eval.eval_activity import ActivityEvaluator
        args = argparse.Namespace(dir_ann='annotations', dataset='kitti',
                                  mode='mono', model=trained, n_dropout=0,
                                  dropout=0.2)
        ev = ActivityEvaluator(args)
        ev.eval_kitti()
        assert len(ev.all_pred['all']) > 0

    @staticmethod
    def _make_collective_fixture(pif_dir):
        """Synthesize a mini dataset in the REAL Collective Activity layout
        (reference eval/eval_activity.py:39-47: data/activity/dataset/
        {images,annotations} + per-image pifpaf predictions in dir_ann),
        covering all six default sequences so the unmodified CLI path runs.

        Every frame holds exactly ONE person, so social_interactions is
        deterministically False regardless of the net's outputs (no second
        person within threshold_dist -> no F-formation candidates), and the
        expected accuracy/recall are hand-computable:

          seq02: 3 frames, talking labels [0, 0, 1]  -> accuracy 2/3
          seq14: 2 frames, labels [0, 0]             -> accuracy 1
          seq12: 2 frames, labels [0, 0], frame 2 has EMPTY predictions
                 (pifpaf found nobody)               -> 1/2 matched
          seq13, seq11, seq36: 1 frame each, label 0 -> accuracy 1

        Totals: 10 gt persons, 9 matched -> recall 90.00%; one mismatch
        (seq02 frame 3: gt talking, predicted False) -> accuracy 8/9 = 88.89%.
        """
        import json as jsonlib
        import numpy as np
        from PIL import Image
        from make_synthetic_kitti import make_person

        im_dir = os.path.join('data', 'activity', 'dataset', 'images')
        ann_gt_dir = os.path.join('data', 'activity', 'dataset', 'annotations')
        for d in (im_dir, ann_gt_dir, pif_dir):
            os.makedirs(d, exist_ok=True)

        plan = {          # seq -> [(talking_label, has_detection), ...]
            'seq02': [(0, True), (0, True), (1, True)],
            'seq14': [(0, True), (0, True)],
            'seq12': [(0, True), (0, False)],
            'seq13': [(0, True)],
            'seq11': [(0, True)],
            'seq36': [(0, True)],
        }
        rng = np.random.RandomState(5)
        for seq, frames in plan.items():
            gt_lines = []
            for frame_i, (label, has_det) in enumerate(frames, start=1):
                im_name = f'{seq}_frame{frame_i:04d}.jpg'
                Image.new('RGB', (1242, 375), (80, 80, 80)).save(
                    os.path.join(im_dir, im_name))
                frame_key = f'{frame_i:03d}'   # _frame_key convention
                x, z = float(rng.uniform(-2, 2)), float(rng.uniform(6, 12))
                flat, bbox, gt = make_person(x, z, rng)
                b = gt['box']
                cat = '6' if label else '1'    # category 6 == talking
                gt_lines.append(f"{frame_key}\t{b[0]:.0f}\t{b[1]:.0f}"
                                f"\t{b[2]-b[0]:.0f}\t{b[3]-b[1]:.0f}\t{cat}")
                anns = ([{'keypoints': flat, 'bbox': bbox, 'score': 0.9,
                          'category_id': 1}] if has_det else [])
                with open(os.path.join(pif_dir,
                                       im_name + '.predictions.json'), 'w') as f:
                    jsonlib.dump(anns, f)
            with open(os.path.join(ann_gt_dir,
                                   f'{seq}_annotations.txt'), 'w') as f:
                f.write('\n'.join(gt_lines) + '\n')

    def test_activity_eval_collective(self, in_root, trained):
        """Talking evaluation end-to-end on files in the real Collective
        Activity layout, asserting hand-computed accuracy/recall."""
        import argparse
        from monoloco_tpu.eval.eval_activity import ActivityEvaluator

        pif_dir = 'collective_ann'
        self._make_collective_fixture(pif_dir)
        args = argparse.Namespace(dir_ann=pif_dir, dataset='collective',
                                  mode='mono', model=trained, n_dropout=0,
                                  dropout=0.2)
        ev = ActivityEvaluator(args)
        ev.eval_collective()

        # Hand-computed tallies (see _make_collective_fixture docstring).
        assert ev.cnt['gt']['all'] == 10
        assert ev.cnt['pred']['all'] == 9          # seq12 frame 2 unmatched
        assert ev.all_pred['all'] == [False] * 9   # single-person frames
        assert sum(ev.all_gt['all']) == 1          # the talking gt in seq02
        from monoloco_tpu.eval.eval_activity import accuracy_score
        assert accuracy_score(ev.all_gt['all'], ev.all_pred['all']) == \
            pytest.approx(8 / 9)
        assert accuracy_score(ev.all_gt['seq02'], ev.all_pred['seq02']) == \
            pytest.approx(2 / 3)
        for seq in ('seq14', 'seq12', 'seq13', 'seq11', 'seq36'):
            assert accuracy_score(ev.all_gt[seq], ev.all_pred[seq]) == 1.0

    def test_activity_eval_collective_cli(self, in_root, trained, capsys,
                                          monkeypatch):
        """The same eval driven through the CLI surface
        (`monoloco_tpu.run eval --activity --dataset collective`), asserting
        the printed final accuracy/recall against the hand-computed values."""
        pif_dir = 'collective_ann'
        self._make_collective_fixture(pif_dir)
        from monoloco_tpu import run as run_mod
        monkeypatch.setattr(sys, 'argv', [
            'monoloco_tpu.run', 'eval', '--activity', '--dataset',
            'collective', '--dir_ann', pif_dir, '--model', trained,
            '--mode', 'mono'])
        run_mod.main()
        out = capsys.readouterr().out
        assert 'Final Accuracy: 88.89' in out
        assert 'Final Recall:90.00' in out

    def test_predict_with_gt_matching(self, in_root, trained):
        """predict --path_gt: detections are matched against the names-json gt
        and dds_real/boxes_gt are emitted (reference predict.py:220-223)."""
        import json
        from monoloco_tpu.predict import predict
        import argparse
        names_json = sorted(glob.glob('data/arrays/names-kitti-mono-*.json'))[-1]
        with open('splits/kitti_val.txt') as f:
            val_name = f.readline().strip()
        image = os.path.join('data', 'kitti', 'images', val_name + '.png')
        # pifpaf json discoverable next to the image
        import shutil
        shutil.copy(os.path.join('annotations', val_name + '.png.predictions.json'),
                    image + '.pifpaf.json')
        out_dir = 'predout_gt'
        os.makedirs(out_dir, exist_ok=True)
        args = argparse.Namespace(
            images=[image], glob=None, checkpoint=None, json_dir=None,
            output_directory=out_dir, output_types=['json'], json_output=None,
            no_save=False, hide_distance=False, dpi=100, long_edge=None,
            activities=[], mode='mono', model=trained, net=None,
            path_gt=names_json, z_max=100, n_dropout=0, dropout=0.2,
            show_all=False, webcam=False, camera=0, calibration='kitti',
            focal_length=5.7, threshold_prob=0.25, threshold_dist=2.5,
            radii=(0.3, 0.5, 1))
        predict(args)
        out_json = os.path.join(out_dir, f'out_{val_name}.png.monoloco.json')
        with open(out_json) as f:
            dic = json.load(f)
        assert dic['dds_real'], "gt matching produced no matches"
        assert len(dic['boxes_gt']) == len(dic['dds_real'])
        assert any(dic['gt'])

    def test_predict_epistemic_cli(self, in_root, trained):
        """--n_dropout > 0: stds_epi are nonzero in the output json."""
        import json
        from monoloco_tpu.predict import predict
        import argparse
        with open('splits/kitti_val.txt') as f:
            val_name = f.readlines()[1].strip()
        image = os.path.join('data', 'kitti', 'images', val_name + '.png')
        import shutil
        shutil.copy(os.path.join('annotations', val_name + '.png.predictions.json'),
                    image + '.pifpaf.json')
        out_dir = 'predout_epi'
        os.makedirs(out_dir, exist_ok=True)
        args = argparse.Namespace(
            images=[image], glob=None, checkpoint=None, json_dir=None,
            output_directory=out_dir, output_types=['json'], json_output=None,
            no_save=False, hide_distance=False, dpi=100, long_edge=None,
            activities=[], mode='mono', model=trained, net=None,
            path_gt=None, z_max=100, n_dropout=3, dropout=0.2,
            show_all=False, webcam=False, camera=0, calibration='kitti',
            focal_length=5.7, threshold_prob=0.25, threshold_dist=2.5,
            radii=(0.3, 0.5, 1))
        predict(args)
        with open(os.path.join(out_dir, f'out_{val_name}.png.monoloco.json')) as f:
            dic = json.load(f)
        assert all(e > 0 for e in dic['stds_epi'])

    def test_predict_keypoints_mode(self, in_root):
        """--mode keypoints: skeleton rendering only, no localization model."""
        from monoloco_tpu.predict import predict
        import argparse
        with open('splits/kitti_val.txt') as f:
            val_name = f.readlines()[2].strip()
        image = os.path.join('data', 'kitti', 'images', val_name + '.png')
        import shutil
        shutil.copy(os.path.join('annotations', val_name + '.png.predictions.json'),
                    image + '.pifpaf.json')
        out_dir = 'predout_kp'
        os.makedirs(out_dir, exist_ok=True)
        args = argparse.Namespace(
            images=[image], glob=None, checkpoint=None, json_dir=None,
            output_directory=out_dir, output_types=[], json_output=None,
            no_save=False, hide_distance=False, dpi=100, long_edge=None,
            activities=[], mode='keypoints', model=None, net=None,
            path_gt=None, z_max=100, n_dropout=0, dropout=0.2,
            show_all=False, webcam=False, camera=0, calibration='kitti',
            focal_length=5.7, threshold_prob=0.25, threshold_dist=2.5,
            radii=(0.3, 0.5, 1))
        predict(args)
        assert os.path.exists(os.path.join(out_dir, f'out_{val_name}.png.keypoints.png'))

    def test_cpp_benchmark_on_generated(self, in_root, trained):
        binary = os.path.join(REPO, 'kitti-eval', 'build', 'evaluate_object')
        if not os.path.exists(binary):
            pytest.skip('evaluate_object not built')
        # Arrange the layout the C++ binary expects.
        os.makedirs('lists', exist_ok=True)
        os.makedirs('data/object', exist_ok=True)
        if not os.path.exists('data/object/label_2'):
            os.symlink(os.path.abspath('data/kitti/gt'), 'data/object/label_2')
        os.makedirs('results/synth/data', exist_ok=True)
        # Stage stripped to the devkit's 16 columns (shared helper — the
        # binary fscanf's exactly 16 fields per row).
        from monoloco_tpu.utils import strip_to_devkit_columns
        for txt in glob.glob('data/kitti/monoloco_pp/*.txt'):
            strip_to_devkit_columns(
                txt, os.path.join('results/synth/data', os.path.basename(txt)))
        with open('splits/kitti_val.txt') as f:
            names = [l.strip() for l in f if l.strip()]
        with open('lists/val.txt', 'w') as f:
            f.write('\n'.join(names) + '\n')
        res = subprocess.run([binary, 'synth', 'val'], capture_output=True,
                             text=True, timeout=300)
        assert res.returncode == 0, res.stdout + res.stderr
        stats = np.atleast_2d(np.loadtxt('results/synth/stats_pedestrian_detection.txt'))
        assert stats.shape[1] == 41


class TestGenerateWithBaselines:
    def test_mono_baselines_txts(self, tmp_path, monkeypatch):
        """--baselines generation: monoloco_pp + legacy monoloco + geometric
        txts per image (reference generate_kitti.py:62-85)."""
        import argparse
        import jax
        from make_synthetic_kitti import make_dataset
        from monoloco_tpu.train import Trainer
        from monoloco_tpu.eval import GenerateKitti
        from monoloco_tpu.models import init_monoloco_params
        from monoloco_tpu.models.checkpoint import save_checkpoint
        from monoloco_tpu.prep import PreprocessKitti

        make_dataset(str(tmp_path), n_train=6, n_val=4, seed=31)
        monkeypatch.chdir(tmp_path)
        prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
        path_joints, _ = prep.run()
        targs = argparse.Namespace(
            joints=path_joints, mode='mono', out='data/outputs/b.pkl', epochs=2,
            bs=64, dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
            hidden_size=64, n_stage=2, r_seed=1, auto_tune_mtl=False,
            no_save=False, print_loss=False)
        t = Trainer(targs)
        t.train()
        t.evaluate()

        # random-init legacy monoloco checkpoint at the expected path
        os.makedirs('data/models', exist_ok=True)
        p, bn = init_monoloco_params(jax.random.PRNGKey(0), 34, 2, 256, 3)
        save_checkpoint(GenerateKitti.monoloco_checkpoint, p, bn,
                        meta={'net': 'monoloco'})

        gargs = argparse.Namespace(
            mode='mono', model='data/outputs/b.pkl', dir_ann='annotations',
            n_dropout=0, dropout=0.2, hidden_size=64, n_stage=2,
            baselines=True, generate_official=False, verbose=False,
            save=False, show=False)
        GenerateKitti(gargs).run()
        for method in ('monoloco_pp', 'monoloco', 'geometric'):
            txts = glob.glob(f'data/kitti/{method}/*.txt')
            assert len(txts) == 4, method
        # geometric txts carry geometric depths, not the net's
        line_net = open(glob.glob('data/kitti/monoloco_pp/*.txt')[0]).readline()
        line_geo = open(glob.glob('data/kitti/geometric/*.txt')[0]).readline()
        assert len(line_net.split()) == 18 and len(line_geo.split()) == 18

    def test_stereo_baselines_txts(self, tmp_path, monkeypatch):
        """--baselines stereo generation: pose/reid association txts
        (reference generate_kitti.py:168-199), random-init ReID."""
        import argparse
        import shutil
        import jax
        from make_synthetic_kitti import make_dataset
        from monoloco_tpu.train import Trainer
        from monoloco_tpu.eval import GenerateKitti
        from monoloco_tpu.models import init_monoloco_params
        from monoloco_tpu.models.checkpoint import save_checkpoint
        from monoloco_tpu.prep import PreprocessKitti

        make_dataset(str(tmp_path), n_train=6, n_val=3, seed=33)
        monkeypatch.chdir(tmp_path)
        # The generator now writes identity-textured right-camera images
        # itself; fall back to duplicating the left images only for datasets
        # predating that.
        if not os.path.isdir('data/kitti/images_r'):
            shutil.copytree('data/kitti/images', 'data/kitti/images_r')
        prep = PreprocessKitti(dir_ann='annotations', mode='stereo', iou_min=0.3)
        path_joints, _ = prep.run()
        targs = argparse.Namespace(
            joints=path_joints, mode='stereo', out='data/outputs/s.pkl',
            epochs=2, bs=64, dropout=0.2, lr=0.002, sched_step=30,
            sched_gamma=0.98, hidden_size=64, n_stage=2, r_seed=1,
            auto_tune_mtl=False, no_save=False, print_loss=False)
        t = Trainer(targs)
        t.train()
        t.evaluate()
        os.makedirs('data/models', exist_ok=True)
        p, bn = init_monoloco_params(jax.random.PRNGKey(0), 34, 2, 256, 3)
        save_checkpoint(GenerateKitti.monoloco_checkpoint, p, bn,
                        meta={'net': 'monoloco'})

        gargs = argparse.Namespace(
            mode='stereo', model='data/outputs/s.pkl', dir_ann='annotations',
            n_dropout=0, dropout=0.2, hidden_size=64, n_stage=2,
            baselines=True, generate_official=True, verbose=False,
            save=False, show=False)
        gen = GenerateKitti(gargs)
        # small ReID input keeps the CPU compile fast
        from monoloco_tpu.eval.reid_baseline import ReID
        gen.reid_net = ReID(height=32, width=16)
        gen.run()
        for method in ('monstereo', 'monoloco', 'geometric', 'pose', 'reid'):
            txts = glob.glob(f'data/kitti/{method}/*.txt')
            non_empty = [t for t in txts if os.path.getsize(t) > 0]
            assert len(non_empty) == 3, method
        # --generate_official pads the full 7481-image KITTI layout
        assert len(glob.glob('data/kitti/monstereo/*.txt')) == 7481
        # stereo association actually corrected some depths
        assert sum(gen.cnt_disparity.values()) > 0

    def test_generate_with_mc_dropout_epi_column(self, tmp_path, monkeypatch):
        """n_dropout > 0 takes the per-image path and writes nonzero epistemic
        spreads into column 17 of the txts."""
        import argparse
        from make_synthetic_kitti import make_dataset
        from monoloco_tpu.train import Trainer
        from monoloco_tpu.eval import GenerateKitti

        make_dataset(str(tmp_path), n_train=6, n_val=3, seed=41)
        monkeypatch.chdir(tmp_path)
        from monoloco_tpu.prep import PreprocessKitti
        prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
        path_joints, _ = prep.run()
        targs = argparse.Namespace(
            joints=path_joints, mode='mono', out='data/outputs/mc.pkl', epochs=2,
            bs=64, dropout=0.2, lr=0.002, sched_step=30, sched_gamma=0.98,
            hidden_size=64, n_stage=2, r_seed=1, auto_tune_mtl=False,
            no_save=False, print_loss=False)
        t = Trainer(targs)
        t.train()
        t.evaluate()

        gargs = argparse.Namespace(
            mode='mono', model='data/outputs/mc.pkl', dir_ann='annotations',
            n_dropout=2, dropout=0.2, hidden_size=64, n_stage=2,
            baselines=False, generate_official=False, verbose=False,
            save=False, show=False)
        GenerateKitti(gargs).run()
        epis = []
        for txt in glob.glob('data/kitti/monoloco_pp/*.txt'):
            for line in open(txt):
                parts = line.split()
                assert len(parts) == 18
                epis.append(float(parts[17]))
        assert epis and any(e > 0 for e in epis)
