"""Cross-validate kitti-eval/evaluate_object.cpp against the reference binary.

Builds the UNMODIFIED reference devkit evaluator (reference
kitti-eval/evaluate_object.cpp, compiled with the minimal boost shim in
tools/boost_compat) and the from-scratch rewrite, runs both on an identical
synthetic gt/detections tree, and compares every stats_pedestrian_* output
file numerically. The AP/threshold/statistics semantics in the reference
binary (getThresholds, eval_class, computeStatistics, the RALP driver loop —
reference evaluate_object.cpp:318-321,1279-1328) are pure untouched reference
code; only the convex-polygon overlap primitives come from the shim.

Usage: python tools/crossval_kitti_eval.py [workdir]
Exit 0 and "CROSSVAL OK" when all files agree (rtol 1e-6).
Also writes the reference stats to tests/goldens/kitti_eval_crossval/ so CI
(which has no reference checkout) can regression-pin the rewrite.
"""

import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CPP = '/root/reference/kitti-eval/evaluate_object.cpp'
N_IMAGES = 40


def gen_tree(root, seed=123):
    """Synthetic KITTI gt + detections exercising every metric branch:
    easy/moderate/hard/ALL difficulty bins, DontCare regions, ignored
    classes, distance-proportional 3D errors (so RALP-{1,5,10}% separate),
    orientation errors (AOS/MPPE), false positives and missed gt."""
    rng = np.random.RandomState(seed)
    gt_dir = os.path.join(root, 'data', 'object', 'label_2')
    det_dir = os.path.join(root, 'detections')
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(det_dir, exist_ok=True)
    os.makedirs(os.path.join(root, 'lists'), exist_ok=True)

    with open(os.path.join(root, 'lists', 'val.txt'), 'w') as f:
        f.write('\n'.join(f'{i:06d}' for i in range(1, N_IMAGES + 1)) + '\n')

    fku = 721.5377
    for idx in range(1, N_IMAGES + 1):
        gt_rows, det_rows = [], []
        for _ in range(rng.randint(2, 7)):
            z = rng.uniform(4.0, 45.0)
            x = rng.uniform(-0.04, 0.04) * z
            y = 1.65
            h, w, l = 1.77 + rng.randn() * 0.08, 0.7, 0.65
            ry = rng.uniform(-np.pi, np.pi)
            alpha = ry - np.arctan2(x, z)
            hp = fku * h / z                       # pixel height
            u = 621.0 + fku * x / z
            v = 187.0 + fku * (y - h / 2) / z
            box = [u - hp * 0.22, v - hp / 2, u + hp * 0.22, v + hp / 2]
            trunc = float(rng.choice([0.0, 0.0, 0.1, 0.2, 0.4]))
            occ = int(rng.choice([0, 0, 0, 1, 1, 2]))
            gt_rows.append(
                f'Pedestrian {trunc:.2f} {occ} {alpha:.6f} '
                f'{box[0]:.2f} {box[1]:.2f} {box[2]:.2f} {box[3]:.2f} '
                f'{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.6f}')

            if rng.rand() < 0.85:                  # matched detection
                err_scale = rng.choice([0.005, 0.03, 0.08, 0.15])
                dz = z * (1 + rng.randn() * err_scale)
                dx = x + rng.randn() * err_scale * z * 0.3
                jit = hp * 0.05
                dbox = [box[0] + rng.randn() * jit, box[1] + rng.randn() * jit,
                        box[2] + rng.randn() * jit, box[3] + rng.randn() * jit]
                dry = ry + rng.randn() * rng.choice([0.05, 0.4, 1.5])
                dalpha = dry - np.arctan2(dx, dz)
                score = rng.uniform(0.05, 1.0)
                det_rows.append(
                    f'Pedestrian {trunc:.2f} {float(occ):.2f} {dalpha:.6f} '
                    f'{dbox[0]:.2f} {dbox[1]:.2f} {dbox[2]:.2f} {dbox[3]:.2f} '
                    f'{h:.2f} {w:.2f} {l:.2f} {dx:.2f} {y:.2f} {dz:.2f} '
                    f'{dry:.6f} {score:.6f}')

        for _ in range(rng.randint(0, 2)):          # DontCare region
            u0, v0 = rng.uniform(0, 1100), rng.uniform(100, 300)
            gt_rows.append(
                f'DontCare -1 -1 -10 {u0:.2f} {v0:.2f} {u0 + 60:.2f} '
                f'{v0 + 40:.2f} -1 -1 -1 -1000 -1000 -1000 -10')
        if rng.rand() < 0.3:                        # ignored class
            gt_rows.append(
                'Cyclist 0.00 0 0.5 300.00 180.00 340.00 260.00 '
                '1.70 0.60 1.80 -2.00 1.65 15.00 0.40')
        for _ in range(rng.randint(0, 3)):          # false positives
            u0, v0 = rng.uniform(0, 1100), rng.uniform(100, 280)
            hh = rng.uniform(30, 120)
            score = rng.uniform(0.05, 0.8)
            det_rows.append(
                f'Pedestrian 0.00 0.00 0.10 {u0:.2f} {v0:.2f} '
                f'{u0 + hh * 0.4:.2f} {v0 + hh:.2f} 1.75 0.70 0.65 '
                f'{rng.uniform(-8, 8):.2f} 1.65 {rng.uniform(5, 40):.2f} '
                f'0.200000 {score:.6f}')

        with open(os.path.join(gt_dir, f'{idx:06d}.txt'), 'w') as f:
            f.write('\n'.join(gt_rows) + '\n')
        with open(os.path.join(det_dir, f'{idx:06d}.txt'), 'w') as f:
            f.write('\n'.join(det_rows) + ('\n' if det_rows else ''))


def build_binaries(workdir):
    ref_bin = os.path.join(workdir, 'evaluate_object_ref')
    our_bin = os.path.join(workdir, 'evaluate_object_ours')
    subprocess.run(
        ['g++', '-O2', '-std=c++11', '-I', os.path.join(REPO, 'tools', 'boost_compat'),
         '-o', ref_bin, REF_CPP], check=True)
    subprocess.run(
        ['g++', '-O2', '-std=c++17', '-o', our_bin,
         os.path.join(REPO, 'kitti-eval', 'evaluate_object.cpp')], check=True)
    return ref_bin, our_bin


def run_eval(binary, root, sha):
    res = os.path.join(root, 'results', sha)
    shutil.rmtree(res, ignore_errors=True)
    os.makedirs(os.path.join(res, 'plot'), exist_ok=True)
    shutil.copytree(os.path.join(root, 'detections'),
                    os.path.join(res, 'data'))
    proc = subprocess.run([binary, sha, 'val', '1'], cwd=root,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f'{binary} rc={proc.returncode}\n{proc.stdout[-2000:]}'
                           f'\n{proc.stderr[-2000:]}')
    return res


def read_stats(path):
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append([float(t) for t in line.split()])
    return rows


def compare(ref_res, our_res):
    ref_files = sorted(f for f in os.listdir(ref_res) if f.startswith('stats_'))
    our_files = sorted(f for f in os.listdir(our_res) if f.startswith('stats_'))
    failures = []
    if set(ref_files) != set(our_files):
        failures.append(f'file sets differ: ref-only '
                        f'{sorted(set(ref_files) - set(our_files))}, ours-only '
                        f'{sorted(set(our_files) - set(ref_files))}')
    for name in sorted(set(ref_files) & set(our_files)):
        r = read_stats(os.path.join(ref_res, name))
        o = read_stats(os.path.join(our_res, name))
        if len(r) != len(o) or any(len(a) != len(b) for a, b in zip(r, o)):
            failures.append(f'{name}: shape mismatch '
                            f'{[len(x) for x in r]} vs {[len(x) for x in o]}')
            continue
        for i, (a, b) in enumerate(zip(r, o)):
            if not np.allclose(a, b, rtol=1e-6, atol=1e-9):
                d = np.max(np.abs(np.array(a) - np.array(b)))
                failures.append(f'{name}: row {i} differs (max abs {d:.3e})')
                break
    return ref_files, failures


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/crossval_kitti_eval'
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    gen_tree(workdir)
    ref_bin, our_bin = build_binaries(workdir)
    ref_res = run_eval(ref_bin, workdir, 'ref')
    our_res = run_eval(our_bin, workdir, 'ours')
    ref_files, failures = compare(ref_res, our_res)

    golden_dir = os.path.join(REPO, 'tests', 'goldens', 'kitti_eval_crossval')
    shutil.rmtree(golden_dir, ignore_errors=True)
    os.makedirs(golden_dir)
    for name in ref_files:
        shutil.copy(os.path.join(ref_res, name), os.path.join(golden_dir, name))

    print(f'compared {len(ref_files)} stats files')
    if failures:
        print('CROSSVAL FAILED')
        for f in failures:
            print('  ' + f)
        sys.exit(1)
    print('CROSSVAL OK')


if __name__ == '__main__':
    main()
