"""Generate REFERENCE-produced goldens for byte-compatibility tests.

Runs the reference implementation (/root/reference, torch CPU, torchvision
stubbed) to produce:
  tests/goldens/byte_compat/joints-kitti-{mono,stereo}.json   (prep output)
  tests/goldens/byte_compat/names-kitti-{mono,stereo}.json
  tests/goldens/byte_compat/out.monoloco.json                 (predict output)
  tests/goldens/byte_compat/model_torch.pkl                   (shared weights)
  tests/goldens/byte_compat/model_tpu.pkl
  tests/goldens/byte_compat/manifest.json

The prep goldens come from the reference PreprocessKitti on a fixed synthetic
dataset (tools/make_synthetic_kitti.py, seed below) — byte-identical output
is achievable there because prep is host numpy/python on both sides.
The predict golden is the reference Loco.forward + post_process on the
fixture pifpaf detections with weights trained here and exported to torch
(tools/export_torch.py), dumped with the reference's exact json.dump call
(reference predict.py:267-268). tests/test_byte_compat.py consumes these.

Usage: python tools/make_reference_goldens.py
"""

import argparse
import glob
import json
import os
import pickle
import shutil
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, 'tests', 'goldens', 'byte_compat')
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

DATASET_SEED = 11
N_TRAIN, N_VAL = 6, 4
HIDDEN, N_STAGE = 128, 3
TRAIN_SEED, EPOCHS = 5, 30
IM_SIZE = (1238, 374)


def _stub_torchvision():
    tv = types.ModuleType('torchvision')
    transforms = types.ModuleType('torchvision.transforms')
    for name in ('Normalize', 'ToTensor', 'Compose', 'Resize'):
        setattr(transforms, name, lambda *a, **k: None)
    models = types.ModuleType('torchvision.models')
    models.resnet50 = lambda *a, **k: None
    tv.transforms, tv.models = transforms, models
    sys.modules.setdefault('torchvision', tv)
    sys.modules.setdefault('torchvision.transforms', transforms)
    sys.modules.setdefault('torchvision.models', models)


def build_dataset(root):
    from make_synthetic_kitti import make_dataset
    shutil.rmtree(root, ignore_errors=True)
    make_dataset(root, n_train=N_TRAIN, n_val=N_VAL, seed=DATASET_SEED)
    os.makedirs(os.path.join(root, 'data', 'arrays'), exist_ok=True)
    # The reference's split_training removes three hardcoded KITTI ids and
    # KeyErrors if absent (reference utils/kitti.py:122-124).
    bad = ('000518', '005692', '003009')
    with open(os.path.join(root, 'splits', 'kitti_train.txt'), 'a') as f:
        f.write('\n'.join(bad) + '\n')
    for b in bad:
        open(os.path.join(root, 'data', 'kitti', 'gt', b + '.txt'), 'w').close()


def prep_goldens(root):
    sys.path.insert(0, '/root/reference')
    from monoloco.prep.preprocess_kitti import PreprocessKitti
    # The reference iterates `tuple(os.listdir(dir_gt))` — FILESYSTEM order,
    # not even stable across copies of the same dataset, and its stereo
    # augmentation RNG is seeded by running counters, so row content depends
    # on that order. Pin it to sorted so the golden is deterministic and
    # comparable with our (sorted) iteration.
    _listdir = os.listdir
    os.listdir = lambda p: sorted(_listdir(p))
    cwd = os.getcwd()
    os.chdir(root)
    try:
        for mode in ('mono', 'stereo'):
            # dic_jo/dic_names are CLASS attributes in the reference —
            # reset between modes (upstream latent bug).
            from collections import defaultdict
            import monoloco.prep.preprocess_kitti as pk
            PreprocessKitti.dic_jo = {
                ph: dict(X=[], Y=[], names=[], kps=[], K=[],
                         clst=defaultdict(lambda: defaultdict(list)))
                for ph in ('train', 'val', 'test')}
            PreprocessKitti.dic_jo['version'] = pk.__version__
            PreprocessKitti.dic_names = defaultdict(lambda: defaultdict(list))
            prep = PreprocessKitti(dir_ann='annotations', mode=mode,
                                   iou_min=0.3)
            prep.run()
            shutil.copy(prep.path_joints,
                        os.path.join(GOLD, f'joints-kitti-{mode}.json'))
            shutil.copy(prep.path_names,
                        os.path.join(GOLD, f'names-kitti-{mode}.json'))
            print(f'prep golden ({mode}): {prep.path_joints}')
    finally:
        os.chdir(cwd)
        os.listdir = _listdir


def train_and_export():
    """Tiny mono checkpoint trained here, exported to the reference layout."""
    from monoloco_tpu.train import Trainer
    ckpt_tpu = os.path.join(GOLD, 'model_tpu.pkl')
    args = argparse.Namespace(
        joints=os.path.join(REPO, 'tests', 'fixture_joints-kitti-mono.json'),
        mode='mono', out=ckpt_tpu, epochs=EPOCHS, bs=64, dropout=0.2,
        lr=0.002, sched_step=30, sched_gamma=0.98, hidden_size=HIDDEN,
        n_stage=N_STAGE, r_seed=TRAIN_SEED, auto_tune_mtl=False,
        no_save=False, print_loss=False)
    t = Trainer(args)
    t.train()
    t.evaluate()

    from monoloco_tpu.models.checkpoint import (load_checkpoint,
                                                export_torch_state_dict)
    import collections
    import torch
    params, bn_state, _ = load_checkpoint(ckpt_tpu, arch='loco')
    sd = export_torch_state_dict(params, bn_state, arch='loco')
    tensors = collections.OrderedDict(
        (k, torch.tensor(v)) for k, v in sd.items())
    ckpt_torch = os.path.join(GOLD, 'model_torch.pkl')
    torch.save(tensors, ckpt_torch)
    return ckpt_torch


def predict_golden(ckpt_torch):
    """Reference forward + post_process on the fixture detections, dumped
    with the reference's exact json.dump(dic_out) call
    (reference predict.py:262-268)."""
    sys.path.insert(0, '/root/reference')
    from monoloco.network import Loco
    from monoloco.network.process import preprocess_pifpaf

    with open(os.path.join(REPO, 'tests', 'fixture_002282.pifpaf.json')) as f:
        pifpaf_out = json.load(f)
    # K from our calibration loader — both sides consume the same matrix.
    from monoloco_tpu.network.preprocess import load_calibration
    kk = [list(row) for row in load_calibration('kitti', IM_SIZE)]

    # net=None -> monoloco_pp for mode='mono' (passing net explicitly trips a
    # reference bug: Loco.__init__ reads self.net before assigning it,
    # reference net.py:41-44).
    net = Loco(model=ckpt_torch, mode='mono', linear_size=HIDDEN, n_dropout=0)
    boxes, keypoints = preprocess_pifpaf(pifpaf_out, im_size=IM_SIZE)
    dic_in = net.forward(keypoints, kk)
    dic_out = net.post_process(dic_in, boxes, keypoints, kk, dic_gt=None)
    out_path = os.path.join(GOLD, 'out.monoloco.json')
    with open(out_path, 'w') as ff:
        json.dump(dic_out, ff)
    print(f'predict golden: {out_path} ({len(dic_out["boxes"])} detections)')


def main():
    os.makedirs(GOLD, exist_ok=True)
    _stub_torchvision()
    root = '/tmp/byte_compat_ds'
    build_dataset(root)
    prep_goldens(root)
    ckpt_torch = train_and_export()
    predict_golden(ckpt_torch)
    with open(os.path.join(GOLD, 'manifest.json'), 'w') as f:
        json.dump({'dataset_seed': DATASET_SEED, 'n_train': N_TRAIN,
                   'n_val': N_VAL, 'hidden': HIDDEN, 'n_stage': N_STAGE,
                   'train_seed': TRAIN_SEED, 'epochs': EPOCHS,
                   'im_size': IM_SIZE}, f, indent=1)
    print('goldens written to', GOLD)


if __name__ == '__main__':
    main()
