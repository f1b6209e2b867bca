"""Adversarial (hard-mode) synthetic KITTI: generator properties and an
end-to-end pipeline smoke over occlusion/truncation/crowd/noise data."""

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


def _load_gt(root):
    rows = []
    for f in sorted(glob.glob(os.path.join(root, 'data/kitti/gt/*.txt'))):
        for line in open(f):
            t = line.split()
            rows.append(dict(trunc=float(t[1]), occ=int(t[2]),
                             box=[float(v) for v in t[4:8]],
                             h=float(t[8]), z=float(t[13])))
    return rows


class TestHardGenerator:

    def test_difficulty_bins_and_misses(self, tmp_path):
        """Hard mode populates easy/moderate/hard difficulty bins
        (reference utils/kitti.py:94-105), produces missed detections,
        crowds, and truncated gt clipped to the image."""
        from make_synthetic_kitti import make_dataset, IM_W, IM_H
        from monoloco_tpu.utils.kitti import get_difficulty
        make_dataset(str(tmp_path), n_train=30, n_val=15, seed=7, hard=True)
        gt = _load_gt(str(tmp_path))
        bins = {'easy': 0, 'moderate': 0, 'hard': 0, 'excluded': 0}
        for g in gt:
            bins[get_difficulty(g['box'], g['trunc'], g['occ'])] += 1
        assert bins['easy'] > 10 and bins['moderate'] > 10 and bins['hard'] > 10

        n_ann = sum(len(json.load(open(f))) for f in
                    glob.glob(str(tmp_path / 'annotations' / '*.json')))
        assert n_ann < len(gt), "hard mode should miss some detections"

        # crowd scenes exist
        per_scene = [len(open(f).readlines()) for f in
                     glob.glob(str(tmp_path / 'data/kitti/gt/*.txt'))]
        assert max(per_scene) >= 8

        # gt boxes are clipped to the image; some people are truncated
        assert all(0 <= g['box'][0] and g['box'][2] <= IM_W
                   and 0 <= g['box'][1] and g['box'][3] <= IM_H for g in gt)
        assert any(g['trunc'] > 0.15 for g in gt)
        # person heights vary (±15%)
        hs = [g['h'] for g in gt]
        assert max(hs) - min(hs) > 0.2

    def test_confidence_correlates_with_occlusion(self, tmp_path):
        """Occluded/truncated joints carry pifpaf-like low confidence; the
        noise model is confidence-correlated, so low-conf joints deviate more
        from the reprojected gt on average."""
        from make_synthetic_kitti import make_dataset
        make_dataset(str(tmp_path), n_train=24, n_val=8, seed=11, hard=True)
        confs = []
        for f in glob.glob(str(tmp_path / 'annotations' / '*.json')):
            for ann in json.load(open(f)):
                confs.extend(ann['keypoints'][2::3])
        confs = np.asarray(confs)
        assert (confs < 0.35).mean() > 0.02, "some low-confidence joints"
        assert (confs > 0.6).mean() > 0.5, "most joints confidently visible"

    def test_legacy_mode_untouched(self, tmp_path):
        """hard=False writes the original friendly scenes (fixed-height
        people, complete annotations, no truncation columns)."""
        from make_synthetic_kitti import make_dataset
        make_dataset(str(tmp_path), n_train=4, n_val=2, seed=5)
        gt = _load_gt(str(tmp_path))
        assert all(g['trunc'] == 0.0 and g['occ'] == 0 for g in gt)
        assert all(abs(g['h'] - 1.77) < 1e-6 for g in gt)
        n_ann = sum(len(json.load(open(f))) for f in
                    glob.glob(str(tmp_path / 'annotations' / '*.json')))
        assert n_ann == len(gt)


class TestHardPipeline:

    def test_prep_train_generate_eval(self, tmp_path, monkeypatch):
        """Full mono pipeline over the adversarial data: prep tolerates
        missed/false detections, training runs, generation and EvalKitti
        produce difficulty-stratified statistics."""
        import argparse
        from make_synthetic_kitti import make_dataset
        from monoloco_tpu.prep import PreprocessKitti
        from monoloco_tpu.train import Trainer
        from monoloco_tpu.eval import GenerateKitti, EvalKitti

        make_dataset(str(tmp_path), n_train=12, n_val=6, seed=13, hard=True)
        monkeypatch.chdir(tmp_path)
        for sub in (('data', 'arrays'), ('data', 'outputs'), ('data', 'logs'),
                    ('figures', 'results')):
            os.makedirs(os.path.join(str(tmp_path), *sub), exist_ok=True)
        prep = PreprocessKitti(dir_ann='annotations', mode='mono', iou_min=0.3)
        path_joints, _ = prep.run()
        targs = argparse.Namespace(
            joints=path_joints, mode='mono', out='data/outputs/h.pkl',
            epochs=2, bs=64, dropout=0.2, lr=0.002, sched_step=30,
            sched_gamma=0.98, hidden_size=64, n_stage=2, r_seed=1,
            auto_tune_mtl=False, no_save=False, print_loss=False)
        t = Trainer(targs)
        t.train()
        t.evaluate()
        gargs = argparse.Namespace(
            mode='mono', model='data/outputs/h.pkl', dir_ann='annotations',
            n_dropout=0, dropout=0.2, hidden_size=64, n_stage=2,
            baselines=False, generate_official=False, verbose=False,
            save=False, show=False)
        GenerateKitti(gargs).run()
        ev = EvalKitti(gargs)
        ev.dic_thresh_conf['monoloco_pp'] = -100
        ev.run()
        assert len(ev.errors['monoloco_pp']['all']) > 0
        # stratified stats exist for at least easy+moderate on this tiny set
        stats = ev.dic_stats['test']['monoloco_pp']
        assert 'easy' in stats and 'all' in stats
