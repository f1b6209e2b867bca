"""Hyperparameter-search executor benchmarks (PARITY.md "Hyperparameter
search" numbers).

    python tools/bench_hyp_search.py e2e serial    # default 6-trial space
    python tools/bench_hyp_search.py e2e parallel  # vmapped executor
    python tools/bench_hyp_search.py core          # training-loop only,
                                                   # 24 fixed-shape trials

`e2e` runs the full HypTuning search (150 epochs/trial) under the chosen
executor. `core` isolates the training loop: the same 24 (lr-only) trials
once as a vmapped 24-model stack and once as sequential runs of the shared
compiled program — the apples-to-apples measurement that showed the vmapped
stack LOSING (0.7x) at this model/batch size, which is why the serial loop
is the default executor.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 150


def _args():
    return argparse.Namespace(
        joints='tests/fixture_joints-kitti-mono.json', mode='mono', out=None,
        epochs=EPOCHS, bs=512, dropout=0.2, lr=0.002, sched_step=30,
        sched_gamma=0.98, hidden_size=1024, n_stage=3, r_seed=1,
        auto_tune_mtl=False, no_save=True, print_loss=False)


def run_e2e(executor):
    os.environ['MONOLOCO_TPU_HYP_PARALLEL'] = '1' if executor == 'parallel' else '0'
    from monoloco_tpu.train import HypTuning
    for d in ('data/models', 'data/logs', 'data/outputs'):
        os.makedirs(d, exist_ok=True)
    hyp = HypTuning(joints=_args().joints, epochs=EPOCHS, monocular=True,
                    dropout=0.2, multiplier=1, r_seed=1)
    t0 = time.time()
    best = hyp.train(_args())
    print(f"HYP e2e {executor}: wall={time.time() - t0:.1f}s "
          f"best_lr={best.get('lr')} acc={best.get('acc_val')}")


def run_core():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.train.trainer import Trainer

    t = Trainer(_args())
    T = 24
    rng = np.random.RandomState(0)
    lrs = 10 ** rng.uniform(np.log10(5e-4), np.log10(1e-2), T)
    ch = Trainer.CHUNK_EPOCHS
    stack = lambda tree: jax.tree_util.tree_map(lambda x: jnp.stack([x] * T), tree)

    def fresh_best(stacked):
        if stacked:
            return (jnp.full((T,), 1e6, jnp.float32),
                    jnp.full((T,), 1e6, jnp.float32),
                    jnp.zeros((T,), jnp.int32), stack(t.params), stack(t.bn_state))
        return (jnp.float32(1e6), jnp.float32(1e6), jnp.int32(0),
                jax.tree_util.tree_map(jnp.copy, t.params),
                jax.tree_util.tree_map(jnp.copy, t.bn_state))

    def run_vmapped():
        params, bn, opt = stack(t.params), stack(t.bn_state), stack(t.opt_state)
        hyp = (jnp.asarray(lrs, jnp.float32), jnp.full((T,), 0.98, jnp.float32),
               jnp.full((T,), 30.0, jnp.float32))
        best = fresh_best(True)
        vm = jax.jit(jax.vmap(
            t._programs.train_chunk_fn,
            in_axes=(0, None, 0, 0, 0, None, None, None, None, None, None, 0)),
            donate_argnums=(3, 4))
        for cs in range(0, EPOCHS, ch):
            epochs = jnp.arange(cs, min(cs + ch, EPOCHS), dtype=jnp.int32)
            (params, _, bn, opt, best), _ = vm(
                params, None, bn, opt, best, epochs, t.x_tr, t.y_tr,
                t.x_va, t.y_va, t.train_key, hyp)
        return np.asarray(best[0])

    def run_serial():
        accs = []
        for k in range(T):
            hyp = (jnp.float32(lrs[k]), jnp.float32(0.98), jnp.float32(30.0))
            params, bn = t.params, t.bn_state
            opt = t._programs.opt_init({'model': params})
            best = fresh_best(False)
            for cs in range(0, EPOCHS, ch):
                epochs = jnp.arange(cs, min(cs + ch, EPOCHS), dtype=jnp.int32)
                (params, _, bn, opt, best), _ = t._programs.train_chunk(
                    params, None, bn, opt, best, epochs, t.x_tr, t.y_tr,
                    t.x_va, t.y_va, t.train_key, hyp)
            accs.append(float(best[0]))
        return np.asarray(accs)

    av = run_vmapped()          # warm the compiles
    asr = run_serial()
    t0 = time.time()
    av = run_vmapped()
    tv = time.time() - t0
    t0 = time.time()
    asr = run_serial()
    ts = time.time() - t0
    print(f"HYP core: vmapped_24trials={tv:.1f}s serial_24trials={ts:.1f}s "
          f"ratio_serial_over_vmapped={ts / tv:.2f} "
          f"winner_same={bool(np.argmin(av) == np.argmin(asr))}")


def main():
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    if sys.argv[1] == 'core':
        run_core()
    else:
        run_e2e(sys.argv[2])


if __name__ == '__main__':
    main()
