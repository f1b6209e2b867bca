"""Virtual-mesh scaling shape: dp1/2/4/8 step walls on the 8-device CPU mesh.

Real multi-chip hardware is unavailable in this container, so absolute
speedups are unmeasurable (all virtual devices share one physical core). What
IS measurable is sharding overhead: with a FIXED total batch, the same FLOPs
run at every dp width, so any step-wall growth from dp1 to dp8 is the cost of
partitioning + collectives — a pathological serialization shows up as a large
ratio. Passes when dp8 <= dp1 x 1.5 (steady-state median of `reps` steps).

Each dp width runs in a fresh subprocess (the device count is a process-level
XLA flag). Also times the mesh-sharded GenerateKitti-style batched forward at
dp1 vs dp8 for the serving path. Usage:

    python tools/bench_mesh_scaling.py [--batch 512] [--hidden 1024] [--reps 5]

Prints one JSON line per measurement plus a summary verdict.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import json, statistics, sys, time
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
import optax

dp, batch, hidden, reps, what = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), int(sys.argv[4]),
                                 sys.argv[5])
sys.path.insert(0, %(repo)r)
from monoloco_tpu.models import init_loco_params, loco_forward, fold_eval_params, folded_forward
from monoloco_tpu.parallel import make_mesh, data_sharding, replicated_sharding
from monoloco_tpu.train.losses import multitask_loss, LOSS_TASKS_STEREO

devices = jax.devices()[:dp]
mesh = make_mesh(devices)
params, bn_state = init_loco_params(jax.random.PRNGKey(0), 68, 10, hidden, 3)
rng = np.random.RandomState(0)

if what == 'train':
    optimizer = optax.adam(1e-3)
    x = jnp.asarray(rng.randn(batch, 68), jnp.float32)
    y = jnp.asarray(np.concatenate([
        rng.randn(batch, 3).astype(np.float32),
        (np.abs(rng.randn(batch, 1)) + 5).astype(np.float32),
        rng.randn(batch, 6).astype(np.float32),
        (rng.rand(batch, 1) > 0.5).astype(np.float32)], axis=1))
    x = jax.device_put(x, data_sharding(mesh, ndim=2))
    y = jax.device_put(y, data_sharding(mesh, ndim=2))
    params = jax.device_put(params, replicated_sharding(mesh))
    bn_state = jax.device_put(bn_state, replicated_sharding(mesh))
    opt_state = jax.device_put(optimizer.init(params), replicated_sharding(mesh))

    def loss_fn(params, bn_state, x, y, r):
        out, new_bn = loco_forward(params, bn_state, x, train=True, rng=r,
                                   p_dropout=0.2)
        total, _ = multitask_loss(out, y, LOSS_TASKS_STEREO, (1.0,) * 8,
                                  phase='train')
        return total, new_bn

    @jax.jit
    def step(params, bn_state, opt_state, x, y, r):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn_state, x, y, r)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bn, opt_state, loss

    with mesh:
        params, bn_state, opt_state, loss = step(
            params, bn_state, opt_state, x, y, jax.random.PRNGKey(1))
        loss.block_until_ready()
        walls = []
        for i in range(reps):
            t0 = time.perf_counter()
            params, bn_state, opt_state, loss = step(
                params, bn_state, opt_state, x, y, jax.random.PRNGKey(2 + i))
            loss.block_until_ready()
            walls.append(time.perf_counter() - t0)
else:  # serve
    folded = fold_eval_params(params, bn_state, arch='loco')
    x = jnp.asarray(rng.randn(batch, 68), jnp.float32)
    x = jax.device_put(x, data_sharding(mesh, ndim=2))
    folded = jax.device_put(folded, replicated_sharding(mesh))

    @jax.jit
    def fwd(folded, x):
        return folded_forward(folded, x, arch='loco').sum()

    with mesh:
        float(fwd(folded, x))
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fwd(folded, x))
            walls.append(time.perf_counter() - t0)

print('RESULT ' + json.dumps({'dp': dp, 'what': what,
                              'median_ms': round(statistics.median(walls) * 1e3, 2)}))
'''


def run_child(dp, batch, hidden, reps, what):
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if not f.startswith('--xla_force_host_platform_device_count')]
    flags.append('--xla_force_host_platform_device_count=8')
    env['XLA_FLAGS'] = ' '.join(flags)
    proc = subprocess.run(
        [sys.executable, '-c', CHILD % {'repo': REPO},
         str(dp), str(batch), str(hidden), str(reps), what],
        capture_output=True, text=True, env=env, cwd=REPO)
    for line in proc.stdout.splitlines():
        if line.startswith('RESULT '):
            return json.loads(line[len('RESULT '):])
    raise RuntimeError(f'dp{dp}/{what} failed rc={proc.returncode}\n'
                       f'{proc.stdout[-1000:]}\n{proc.stderr[-1000:]}')


def main():
    ap = argparse.ArgumentParser()
    # Defaults sized for a 1-core container: the serialization check is about
    # partitioning/collective overhead ratios, which do not need the flagship
    # trunk (and dp1..dp8 all run the same total FLOPs on one physical CPU).
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--hidden', type=int, default=256)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    results = {}
    for what in ('train', 'serve'):
        for dp in (1, 2, 4, 8):
            rec = run_child(dp, args.batch, args.hidden, args.reps, what)
            results[(what, dp)] = rec['median_ms']
            print(json.dumps({'what': what, 'dp': dp, 'batch': args.batch,
                              'hidden': args.hidden,
                              'median_step_ms': rec['median_ms']}), flush=True)

    ok = True
    for what in ('train', 'serve'):
        ratio = results[(what, 8)] / results[(what, 1)]
        verdict = 'OK' if ratio <= 1.5 else 'PATHOLOGICAL'
        ok &= ratio <= 1.5
        print(f'{what}: dp8/dp1 step-wall ratio {ratio:.2f} (fixed total '
              f'batch {args.batch}) -> {verdict}')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
