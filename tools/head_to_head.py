"""Head-to-head ALE/ALP/RALP: reference PyTorch pipeline vs monoloco_tpu.

Runs ONE leg per process (the reference holds cwd-relative class attributes,
and torch/jax are kept in separate interpreters):

    python tools/head_to_head.py ref  mono  /tmp/h2h/ref_mono
    python tools/head_to_head.py tpu  mono  /tmp/h2h/tpu_mono
    python tools/head_to_head.py ref  stereo /tmp/h2h/ref_stereo
    python tools/head_to_head.py tpu  stereo /tmp/h2h/tpu_stereo

Each leg: generate the synthetic KITTI dataset (fixed per-mode seed, so both
frameworks see byte-identical data), run prep once, then train -> generate ->
EvalKitti at each seed, with the reference README's production config
(epochs 500, bs 512, hidden 1024, n_stage 3, dropout 0.2, lr 0.002 mono /
0.003 stereo; reference trainer.py:36, run.py:91-109). After EvalKitti each
leg also runs the in-repo C++ KITTI benchmark (kitti-eval/evaluate_object)
on the generated txts and records the 41-point AP for detection and
RALP-{5,10}% — the reference's headline published metric
(reference kitti-eval/evaluate_object.cpp:62-63,318-321).
Appends one JSON line per (leg, seed) to /tmp/h2h/results.jsonl.

Env knobs:
  H2H_SEEDS="1,2,3"   training seeds per leg (default "1,2")
  H2H_NTRAIN / H2H_NVAL   dataset scale (default 160 / 40)
  H2H_HARD=1          adversarial dataset (occlusion/truncation/crowds/noise,
                      tools/make_synthetic_kitti.py write_scene_hard)
  H2H_RESULTS         results jsonl path (default /tmp/h2h/results.jsonl)
  H2H_FORCE_CPU=1     run the tpu leg on local CPU
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASET_SEED = {'mono': 7, 'stereo': 8}
N_TRAIN = int(os.environ.get('H2H_NTRAIN', '160'))
N_VAL = int(os.environ.get('H2H_NVAL', '40'))
HARD = os.environ.get('H2H_HARD', '') == '1'
RESULTS = os.environ.get('H2H_RESULTS', '/tmp/h2h/results.jsonl')
EPOCHS = 500
# Training seeds per leg (override: H2H_SEEDS="1,2,3").
SEEDS = tuple(int(s) for s in os.environ.get('H2H_SEEDS', '1,2').split(','))
# Matmul precision of the tpu leg (MONOLOCO_TPU_PRECISION=float32 pins every
# training/inference matmul to f32 — the bf16-sensitivity ablation for the
# RALP-5% study). Recorded per leg so mixed-precision results files stay
# separable; reference legs are always torch f32.
PRECISION = os.environ.get('MONOLOCO_TPU_PRECISION', 'default')


def make_root(root, mode):
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    from make_synthetic_kitti import make_dataset
    shutil.rmtree(root, ignore_errors=True)
    make_dataset(root, n_train=N_TRAIN, n_val=N_VAL, seed=DATASET_SEED[mode],
                 hard=HARD)
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
    ale = {}
    for clst in ('easy', 'moderate', 'hard', 'all'):
        try:
            ale[clst] = float(ev.dic_stats['test'][net][clst]['mean'])
        except (KeyError, TypeError):
            ale[clst] = None
    alp = {thr: 100.0 * sum(ev.errors[net][thr]) / max(len(ev.errors[net][thr]), 1)
           for thr in ('<0.5m', '<1m', '<2m')}
    n_matched = len(ev.errors[net]['all'])
    return {'ale': ale, 'alp': alp, 'matched': n_matched}


# ---------------------------------------------------------------------------
# RALP via the in-repo C++ KITTI benchmark
# ---------------------------------------------------------------------------

def _eval_binary():
    # Build into the leg root (cwd) so concurrent legs never race on it.
    binary = os.path.abspath('evaluate_object_h2h')
    if not os.path.exists(binary):
        subprocess.run(
            ['g++', '-O2', '-std=c++17', '-o', binary,
             os.path.join(REPO, 'kitti-eval', 'evaluate_object.cpp')],
            check=True)
    return binary


def gt_bin_counts(val_names, gt_dir):
    """Pedestrian gt count per difficulty bin [easy, moderate, hard, all],
    mirroring the evaluator's clean_data exactly
    (kitti-eval/evaluate_object.cpp:311-323): cat = the easiest bin whose
    occlusion/truncation/height thresholds the gt meets; bin d counts gts
    with cat == d; ALL counts every pedestrian."""
    min_h, max_occ, max_tr = (40, 25, 25), (0, 1, 2), (0.15, 0.3, 0.5)
    counts = [0, 0, 0, 0]
    for name in val_names:
        gt_path = os.path.join(gt_dir, name + '.txt')
        if not os.path.exists(gt_path):
            continue
        for line in open(gt_path):
            t = line.split()
            if not t or t[0].lower() != 'pedestrian':
                continue
            trunc, occ = float(t[1]), int(float(t[2]))
            height = float(t[7]) - float(t[5])
            counts[3] += 1
            for d in range(3):
                if occ <= max_occ[d] and trunc <= max_tr[d] and height > min_h[d]:
                    counts[d] += 1
                    break
    return counts


def compute_ralp(net):
    """Run kitti-eval on the just-generated data/kitti/<net>/ txts (cwd is the
    leg root). Returns {param: {difficulty: AP%}} for detection and
    RALP-{5,10}%. Detection txts are staged stripped to the devkit's 16
    columns (the trailing bi/epi uncertainty columns are monoloco extensions;
    the reference binary also fscanf's exactly 16 fields,
    reference evaluate_object.cpp:166-169)."""
    work = os.path.abspath('ralp_work')
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.join(work, 'lists'))
    os.makedirs(os.path.join(work, 'data', 'object'))
    os.makedirs(os.path.join(work, 'results', net, 'data'))
    os.makedirs(os.path.join(work, 'results', net, 'plot'))

    val_names = [l.strip() for l in open(os.path.join('splits', 'kitti_val.txt'))
                 if l.strip()]
    with open(os.path.join(work, 'lists', 'val.txt'), 'w') as f:
        f.write('\n'.join(val_names) + '\n')
    os.symlink(os.path.abspath(os.path.join('data', 'kitti', 'gt')),
               os.path.join(work, 'data', 'object', 'label_2'))
    # Strip to the devkit's 16 columns (the binary fscanf's exactly 16
    # fields; trailing bi/epi columns would desync the parse).
    sys.path.insert(0, REPO)
    from monoloco_tpu.utils import strip_to_devkit_columns
    for name in val_names:
        strip_to_devkit_columns(
            os.path.join('data', 'kitti', net, name + '.txt'),
            os.path.join(work, 'results', net, 'data', name + '.txt'))

    proc = subprocess.run([_eval_binary(), net, 'val', '1'], cwd=work,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        print(f'RALP eval failed rc={proc.returncode}\n{proc.stdout[-1500:]}'
              f'\n{proc.stderr[-1500:]}', flush=True)
        return None
    # A bin with zero gt gets AP None (undefined) — but a bin WITH gt and an
    # all-zeros precision row is a genuine 0.0 AP and must be averaged, not
    # dropped (a weak seed matching nothing is data, not a sentinel).
    gt_counts = gt_bin_counts(val_names, os.path.join('data', 'kitti', 'gt'))

    out = {}
    difficulties = ('easy', 'moderate', 'hard', 'all')
    for param in ('detection', 'detection_5%', 'detection_10%'):
        path = os.path.join(work, 'results', net,
                            f'stats_pedestrian_{param}.txt')
        if not os.path.exists(path):
            continue
        rows = [[float(t) for t in line.split()]
                for line in open(path) if line.strip()]
        out[param] = {
            difficulties[i]: (round(100.0 * sum(rows[i][1:41]) / 40.0, 2)
                              if gt_counts[i] else None)
            for i in range(min(len(rows), 4))}
    return out


def safe_ralp(net):
    """compute_ralp runs AFTER a (possibly multi-hour) training leg; never let
    a build/filesystem/parse failure there discard the leg's metrics record —
    emit() must still run."""
    try:
        return compute_ralp(net)
    except Exception:  # noqa: BLE001 — deliberate catch-all, see docstring
        import traceback
        traceback.print_exc()
        return None


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
        # and divides by cnt_gt['hard'] == 0 on the friendly dataset — skip it.
        ev.show_statistics = lambda: None
        ev.run()
        emit('reference', mode, seed, extract_metrics(ev, net), wall,
             ralp=safe_ralp(net))


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
        emit('monoloco_tpu', mode, seed, extract_metrics(ev, net), wall,
             ralp=safe_ralp(net))


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
    """A record only counts if it was measured on the SAME dataset config —
    otherwise changing H2H_NTRAIN/H2H_NVAL/H2H_HARD against an old results
    file would silently skip every leg and keep stale incompatible records."""
    try:
        with open(RESULTS) as f:
            for line in f:
                r = json.loads(line)
                if ((r['framework'], r['mode'], r['r_seed'])
                        == (framework, mode, seed)
                        and r.get('n_train') == N_TRAIN
                        and r.get('n_val') == N_VAL
                        and r.get('hard') == HARD
                        and (framework != 'monoloco_tpu'
                             or r.get('precision', 'default') == PRECISION)):
                    return True
    except FileNotFoundError:
        pass
    return False


def emit(framework, mode, seed, metrics, wall, ralp=None):
    rec = {'framework': framework, 'mode': mode, 'r_seed': seed,
           'n_train': N_TRAIN, 'n_val': N_VAL, 'hard': HARD,
           'train_wall_s': round(wall, 1), **metrics}
    if framework == 'monoloco_tpu' and PRECISION != 'default':
        rec['precision'] = PRECISION
    if ralp is not None:
        rec['ralp'] = ralp
    line = json.dumps(rec)
    print('H2H ' + line, flush=True)
    with open(RESULTS, 'a') as f:
        f.write(line + '\n')


def main():
    framework, mode, root = sys.argv[1], sys.argv[2], sys.argv[3]
    assert framework in ('ref', 'tpu') and mode in ('mono', 'stereo')
    os.makedirs('/tmp/h2h', exist_ok=True)
    os.makedirs(os.path.dirname(os.path.abspath(RESULTS)), exist_ok=True)
    make_root(root, mode)
    os.chdir(root)
    (run_ref if framework == 'ref' else run_tpu)(mode, root)
    print('LEG DONE', flush=True)


if __name__ == '__main__':
    main()
