"""Does bf16 serving WEIGHT STORAGE stay parity-grade on the END metric?

The round-5 storage study (tools/bench_serve_storage.py) measured bf16-stored
folded weights at +7.3-7.6% over the engine's f32-stored fold at 512/2048-row
dispatches on TPU. Before MONOLOCO_TPU_SERVE_STORAGE=auto may resolve to
bf16, the same gate the int8 kernel passed applies: ALE/ALP after the FULL
eval pipeline on a trained checkpoint at real annotation volume — the
static-int8 kernel looked fine on decode-level budgets and measured ALE +69%
here (tools/int8_eval_parity.py docstring).

Reuses int8_eval_parity's stages (setup -> train -> geneval, each a fresh
subprocess so import-time env knobs take effect): ONE trained checkpoint,
GenerateKitti + EvalKitti twice — once MONOLOCO_TPU_SERVE_STORAGE=f32 (the
certified path), once =bf16 — plus the row-wise txt-tree diff. TPU only: the
policy refuses to cast on CPU backends by design, so a CPU run would compare
f32 against itself; the driver asserts the trees actually differ.

Usage: python tools/serve_storage_eval_parity.py [root=/tmp/storage_parity]
Env: IP_NTRAIN/IP_NVAL/IP_SEED/IP_EPOCHS/IP_MODE as int8_eval_parity.
Appends one JSON record to tools/serve_storage_parity_r5.jsonl.
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))
sys.path.insert(0, REPO)

from int8_eval_parity import (  # noqa: E402
    MODE, NTRAIN, NVAL, SEED, EPOCHS, NET, _txt_tree_diff,
)

STAGE_TOOL = os.path.join(REPO, 'tools', 'int8_eval_parity.py')
RESULTS = os.path.join(REPO, 'tools', 'serve_storage_parity_r5.jsonl')


def _run_stage(stage, *argv, env_extra=None):
    env = dict(os.environ)
    env.update(env_extra or {})
    cmd = [sys.executable, STAGE_TOOL, '--stage', stage] + \
        [str(a) for a in argv]
    res = subprocess.run(cmd, env=env, capture_output=True, text=True)
    sys.stdout.write(res.stdout[-2000:])
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-4000:])
        raise SystemExit(f'stage {stage} failed (rc={res.returncode})')
    return res.stdout


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/storage_parity'
    t0 = time.time()
    out = _run_stage('setup', root)
    joints = [l for l in out.splitlines() if l.startswith('JOINTS=')][0][7:]
    _run_stage('train', root, joints)

    metrics, txt_dirs = {}, {}
    for leg in ('f32', 'bf16'):
        out_json = os.path.join(root, f'metrics_storage_{leg}.json')
        _run_stage('geneval', root, out_json,
                   env_extra={'MONOLOCO_TPU_SERVE_STORAGE': leg})
        with open(out_json) as f:
            metrics[leg] = json.load(f)
        metrics[leg].pop('int8', None)
        src = os.path.join(root, 'data', 'kitti', NET)
        dst = os.path.join(root, f'txt_storage_{leg}')
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)
        txt_dirs[leg] = dst

    diff = _txt_tree_diff(txt_dirs['f32'], txt_dirs['bf16'])
    # On a CPU backend the policy refuses the cast and both legs serve the
    # identical f32 fold — a vacuous 0-delta that must not read as parity.
    assert diff['rows'] > 0 and diff['mean_rel_dd'] > 0, (
        'bf16 storage never engaged (txt trees identical) — run on TPU; the '
        'policy refuses to cast on non-TPU backends')
    ale_f, ale_b = metrics['f32']['ale']['all'], metrics['bf16']['ale']['all']
    rec = {
        'mode': MODE, 'n_train': NTRAIN, 'n_val': NVAL, 'seed': SEED,
        'epochs': EPOCHS, 'hard': True,
        'f32_storage': metrics['f32'], 'bf16_storage': metrics['bf16'],
        'ale_all_delta_pct': 100.0 * (ale_b - ale_f) / ale_f,
        'txt_row_diff': diff, 'wall_s': round(time.time() - t0, 1),
    }
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
