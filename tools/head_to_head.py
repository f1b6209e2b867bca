"""Head-to-head ALE/ALP: reference PyTorch pipeline vs monoloco_tpu.

Runs ONE leg per process (the reference holds cwd-relative class attributes,
and torch/jax are kept in separate interpreters):

    python tools/head_to_head.py ref  mono  /tmp/h2h/ref_mono
    python tools/head_to_head.py tpu  mono  /tmp/h2h/tpu_mono
    python tools/head_to_head.py ref  stereo /tmp/h2h/ref_stereo
    python tools/head_to_head.py tpu  stereo /tmp/h2h/tpu_stereo

Each leg: generate the synthetic KITTI dataset (fixed per-mode seed, so both
frameworks see byte-identical data), run prep once, then train -> generate ->
EvalKitti at r_seed 1 and 2 (a seed-noise band), with the reference README's
production config (epochs 500, bs 512, hidden 1024, n_stage 3, dropout 0.2,
lr 0.002 mono / 0.003 stereo; reference trainer.py:36, run.py:91-109).
Appends one JSON line per (leg, seed) to /tmp/h2h/results.jsonl.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASET_SEED = {'mono': 7, 'stereo': 8}
N_TRAIN, N_VAL = 160, 40
EPOCHS = 500
# Training seeds per leg (override: H2H_SEEDS="1,2,3").
SEEDS = tuple(int(s) for s in os.environ.get('H2H_SEEDS', '1,2').split(','))


def make_root(root, mode):
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    from make_synthetic_kitti import make_dataset
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    make_dataset(root, n_train=N_TRAIN, n_val=N_VAL, seed=DATASET_SEED[mode])
    for sub in (('data', 'arrays'), ('data', 'outputs'), ('data', 'logs'),
                ('data', 'models'), ('figures', 'results')):
        os.makedirs(os.path.join(root, *sub), exist_ok=True)
    # The reference's split_training unconditionally removes three bad KITTI
    # ids from the train split (reference utils/kitti.py:122-124) and KeyErrors
    # if absent. Give them empty gt files + split entries; both pipelines then
    # drop them from the split identically (no annotations are ever read).
    bad = ('000518', '005692', '003009')
    with open(os.path.join(root, 'splits', 'kitti_train.txt'), 'a') as f:
        f.write('\n'.join(bad) + '\n')
    for b in bad:
        open(os.path.join(root, 'data', 'kitti', 'gt', b + '.txt'), 'w').close()


def train_args(mode, seed, path_joints, out):
    return argparse.Namespace(
        joints=path_joints, mode=mode, out=out, epochs=EPOCHS, bs=512,
        dropout=0.2, lr=0.002 if mode == 'mono' else 0.003, sched_step=30,
        sched_gamma=0.98, hidden_size=1024, n_stage=3, r_seed=seed,
        auto_tune_mtl=False, no_save=False, print_loss=False)


def eval_args(mode, model):
    return argparse.Namespace(
        mode=mode, model=model, dir_ann='annotations', n_dropout=0,
        dropout=0.2, hidden_size=1024, n_stage=3, baselines=False,
        generate_official=False, verbose=False, save=False, show=False)


def extract_metrics(ev, net):
    ale = {clst: float(ev.dic_stats['test'][net][clst]['mean'])
           for clst in ('easy', 'moderate', 'all')}
    alp = {thr: 100.0 * sum(ev.errors[net][thr]) / max(len(ev.errors[net][thr]), 1)
           for thr in ('<0.5m', '<1m', '<2m')}
    n_matched = len(ev.errors[net]['all'])
    return {'ale': ale, 'alp': alp, 'matched': n_matched}


def run_ref(mode, root):
    sys.path.insert(0, '/root/reference')
    _stub_torchvision()
    from monoloco.prep.preprocess_kitti import PreprocessKitti
    from monoloco.train.trainer import Trainer
    from monoloco.eval.generate_kitti import GenerateKitti
    from monoloco.eval.eval_kitti import EvalKitti

    # Latent reference bug: get_statistics catches ValueError (max of an
    # empty cluster -> -1 sentinel) but average([]) raises ZeroDivisionError
    # first. The synthetic set has no 'hard' gt; make average return the
    # intended -1 sentinel on empty lists (non-empty clusters unaffected).
    import monoloco.eval.eval_kitti as ek
    _avg = ek.average
    ek.average = lambda lst: _avg(lst) if len(lst) else -1.0

    prep = PreprocessKitti(dir_ann='annotations', mode=mode, iou_min=0.3)
    prep.run()
    path_joints = prep.path_joints
    net = 'monstereo' if mode == 'stereo' else 'monoloco_pp'

    for seed in SEEDS:
        if already_done('reference', mode, seed):
            print(f'skip reference/{mode}/seed{seed} (already recorded)',
                  flush=True)
            continue
        out = f'data/outputs/ref-{mode}-s{seed}.pkl'
        t0 = time.time()
        trainer = Trainer(train_args(mode, seed, path_joints, out))
        trainer.train()
        trainer.evaluate()
        wall = time.time() - t0
        GenerateKitti(eval_args(mode, out)).run()
        # Latent reference bug #2: filter_directories mutates the CLASS-level
        # methods list in place, so a second EvalKitti in one process
        # KeyErrors at dic_thresh_conf['monopsr']. Restore it.
        ek.EvalKitti.methods = (ek.EvalKitti.OUR_METHODS
                                + ek.EvalKitti.METHODS_MONO
                                + ek.EvalKitti.METHODS_STEREO)
        ev = EvalKitti(eval_args(mode, out))
        ev.dic_thresh_conf[net] = -100
        # show_statistics is pure printing, runs after all stats are computed,
        # and divides by cnt_gt['hard'] == 0 on this dataset — skip it.
        ev.show_statistics = lambda: None
        ev.run()
        emit('reference', mode, seed, extract_metrics(ev, net), wall)


def run_tpu(mode, root):
    sys.path.insert(0, REPO)
    import jax
    if os.environ.get('H2H_FORCE_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    print('jax backend:', jax.default_backend(), flush=True)
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from monoloco_tpu.prep import PreprocessKitti
    from monoloco_tpu.train import Trainer
    from monoloco_tpu.eval import GenerateKitti, EvalKitti

    prep = PreprocessKitti(dir_ann='annotations', mode=mode, iou_min=0.3)
    path_joints, _ = prep.run()
    net = 'monstereo' if mode == 'stereo' else 'monoloco_pp'

    for seed in SEEDS:
        if already_done('monoloco_tpu', mode, seed):
            print(f'skip monoloco_tpu/{mode}/seed{seed} (already recorded)',
                  flush=True)
            continue
        out = f'data/outputs/tpu-{mode}-s{seed}.pkl'
        t0 = time.time()
        trainer = Trainer(train_args(mode, seed, path_joints, out))
        trainer.train()
        trainer.evaluate()
        wall = time.time() - t0
        GenerateKitti(eval_args(mode, out)).run()
        ev = EvalKitti(eval_args(mode, out))
        ev.dic_thresh_conf[net] = -100
        ev.run()
        emit('monoloco_tpu', mode, seed, extract_metrics(ev, net), wall)


def _stub_torchvision():
    """torchvision isn't installed; the reference imports it at module level
    in network/process.py but only uses transforms in the predict/webcam
    image path, which this pipeline never touches."""
    import types
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


def already_done(framework, mode, seed):
    try:
        with open('/tmp/h2h/results.jsonl') as f:
            for line in f:
                r = json.loads(line)
                if (r['framework'], r['mode'], r['r_seed']) == (framework, mode, seed):
                    return True
    except FileNotFoundError:
        pass
    return False


def emit(framework, mode, seed, metrics, wall):
    rec = {'framework': framework, 'mode': mode, 'r_seed': seed,
           'train_wall_s': round(wall, 1), **metrics}
    line = json.dumps(rec)
    print('H2H ' + line, flush=True)
    with open('/tmp/h2h/results.jsonl', 'a') as f:
        f.write(line + '\n')


def main():
    framework, mode, root = sys.argv[1], sys.argv[2], sys.argv[3]
    assert framework in ('ref', 'tpu') and mode in ('mono', 'stereo')
    os.makedirs('/tmp/h2h', exist_ok=True)
    make_root(root, mode)
    os.chdir(root)
    (run_ref if framework == 'ref' else run_tpu)(mode, root)
    print('LEG DONE', flush=True)


if __name__ == '__main__':
    main()
