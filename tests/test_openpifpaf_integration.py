"""Live OpenPifPaf integration: executes the real pose-backbone branch of
predict (reference predict.py:130-187) when openpifpaf is installed.

Zero-egress containers cannot install openpifpaf or fetch its checkpoints, so
every test here is availability-gated; the dedicated CI job (test-pifpaf in
.github/workflows/tests.yml) installs openpifpaf and runs this file so the
branch executes somewhere real.
"""

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
openpifpaf = pytest.importorskip('openpifpaf')

FIXTURE_IMAGE = os.path.join(REPO, 'tests', 'fixture_002282.png')


def test_run_pifpaf_annotation_contract(tmp_path):
    """run_pifpaf yields (path, annotations) where each annotation is a
    pifpaf json_data dict: 51-float COCO-17 keypoints, xywh bbox, score —
    the exact schema the precomputed-json path consumes."""
    from monoloco_tpu.predict import run_pifpaf
    results = list(run_pifpaf([FIXTURE_IMAGE]))
    assert len(results) == 1
    path, anns = results[0]
    assert os.path.basename(path) == os.path.basename(FIXTURE_IMAGE)
    assert isinstance(anns, list) and anns, "pifpaf found nobody in the fixture"
    for ann in anns:
        assert len(ann['keypoints']) == 51
        assert len(ann['bbox']) == 4
        assert 0.0 <= ann['score'] <= 1.0


def test_predict_keypoints_mode_through_live_pifpaf(tmp_path):
    """predict --mode keypoints on an image WITHOUT a sidecar json: the live
    decoder supplies the poses and the skeleton png is rendered."""
    import argparse
    import shutil
    from monoloco_tpu.predict import predict

    image = str(tmp_path / 'im.png')
    shutil.copy(FIXTURE_IMAGE, image)  # deliberately no .pifpaf.json sidecar
    out_dir = str(tmp_path / 'out')
    args = argparse.Namespace(
        images=[image], glob=None, checkpoint=None, json_dir=None,
        output_directory=out_dir, output_types=[], json_output=True,
        no_save=False, hide_distance=False, dpi=100, long_edge=None,
        activities=[], mode='keypoints', model=None, net=None,
        path_gt=None, z_max=100, n_dropout=0, dropout=0.2,
        show_all=False, webcam=False, camera=0, calibration='kitti',
        focal_length=5.7, threshold_prob=0.25, threshold_dist=2.5,
        radii=(0.3, 0.5, 1))
    predict(args)
    assert os.path.exists(os.path.join(out_dir, 'out_im.png.keypoints.png'))
    # --json-output re-emitted the live predictions in pifpaf schema
    emitted = glob.glob(os.path.join(out_dir, '*.predictions.json'))
    assert emitted
    anns = json.load(open(emitted[0]))
    assert anns and len(anns[0]['keypoints']) == 51


def test_predict_mono_through_live_pifpaf(tmp_path):
    """Full localization through the live decoder: train a tiny model on the
    fixture joints, then predict --mode mono on the raw image (no sidecar)."""
    import argparse
    import shutil
    from monoloco_tpu.train import Trainer
    from monoloco_tpu.predict import predict

    os.makedirs(str(tmp_path / 'data' / 'outputs'), exist_ok=True)
    model = str(tmp_path / 'data' / 'outputs' / 'pifpaf_e2e.pkl')
    targs = argparse.Namespace(
        joints=os.path.join(REPO, 'tests', 'fixture_joints-kitti-mono.json'),
        mode='mono', out=model, epochs=2, bs=64, dropout=0.2, lr=0.002,
        sched_step=30, sched_gamma=0.98, hidden_size=64, n_stage=2, r_seed=1,
        auto_tune_mtl=False, no_save=False, print_loss=False)
    t = Trainer(targs)
    t.train()
    t.evaluate()                # the checkpoint is written here, not in train()

    image = str(tmp_path / 'im.png')
    shutil.copy(FIXTURE_IMAGE, image)
    out_dir = str(tmp_path / 'out')
    args = argparse.Namespace(
        images=[image], glob=None, checkpoint=None, json_dir=None,
        output_directory=out_dir, output_types=['json'], json_output=None,
        no_save=False, hide_distance=False, dpi=100, long_edge=None,
        activities=[], mode='mono', model=model, net=None,
        path_gt=None, z_max=100, n_dropout=0, dropout=0.2,
        show_all=False, webcam=False, camera=0, calibration='kitti',
        focal_length=5.7, threshold_prob=0.25, threshold_dist=2.5,
        radii=(0.3, 0.5, 1))
    predict(args)
    out_json = os.path.join(out_dir, 'out_im.png.monoloco.json')
    with open(out_json) as f:
        dic = json.load(f)
    assert dic['xyz_pred'], "live-pifpaf mono predict produced no detections"
    assert len(dic['xyz_pred']) == len(dic['dds_pred'])
