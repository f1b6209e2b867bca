"""Per-phase wall-clock of the train CLI path on the active backend.

Reproduces the PARITY.md "End-to-end CLI wall" numbers:

    python tools/bench_cli_phases.py            # run twice for cold vs warm
    MONOLOCO_TPU_COMPILE_CACHE=/tmp/xc python tools/bench_cli_phases.py

Phases: imports -> Trainer construction (jitted model+optimizer init) ->
train (chunked multi-epoch scan) -> evaluate (single-dispatch masked stats).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t0 = time.time()
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from monoloco_tpu.train import Trainer
    print(f"imports: {time.time() - t0:.1f} s")

    os.makedirs('data/outputs', exist_ok=True)
    args = argparse.Namespace(
        joints='tests/fixture_joints-kitti-mono.json', mode='mono',
        out='data/outputs/bench_cli_phases.pkl', epochs=5, bs=512, dropout=0.2,
        lr=0.002, sched_step=30, sched_gamma=0.98, hidden_size=256, n_stage=3,
        r_seed=1, auto_tune_mtl=False, no_save=False, print_loss=False)

    t = time.time()
    trainer = Trainer(args)
    print(f"Trainer init: {time.time() - t:.1f} s")
    t = time.time()
    trainer.train()
    print(f"train: {time.time() - t:.1f} s")
    t = time.time()
    trainer.evaluate()
    print(f"evaluate: {time.time() - t:.1f} s")


if __name__ == '__main__':
    main()
