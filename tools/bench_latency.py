"""Serving latency: per-dispatch round-trip of the full serving program.

Complements bench.py (throughput at saturation batch): production serving
also cares about the tail latency of a SINGLE dispatch at realistic request
sizes. Measures, for each batch in --batches:

    host dispatch -> preprocess (K^-1 normalize) -> bf16 folded MLP
    (hidden 1024, 3 stages) -> physical decode -> 4-byte checksum readback

steady-state (after warmup), and reports p50/p90/p99 over --reps calls.
Also measures the tunnel/runtime floor — the same round-trip for a trivial
scalar add — so compute latency is separable from transport RTT (under the
axon tunnel the floor dominates small batches; on a local TPU it is ~50 us).

Writes one JSON line per batch size. Run serialized with other TPU work
(concurrent remote compiles can wedge each other — see .claude/skills/verify).

Usage: python tools/bench_latency.py [--batches 1,16,256,4096] [--reps 200]
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def percentiles(xs):
    xs = sorted(xs)

    def pct(p):
        i = min(len(xs) - 1, max(0, int(round(p / 100.0 * (len(xs) - 1)))))
        return xs[i]

    return {'p50': statistics.median(xs), 'p90': pct(90), 'p99': pct(99),
            'min': xs[0], 'max': xs[-1]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', default='1,16,256,4096')
    ap.add_argument('--reps', type=int, default=200)
    ap.add_argument('--warmup', type=int, default=20)
    args = ap.parse_args()

    from monoloco_tpu.utils.backend import require_live_backend
    require_live_backend(context='bench_latency')
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from monoloco_tpu.models import (init_loco_params, fold_eval_params,
                                     folded_forward)
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, 1024, 3)
    folded = fold_eval_params(params, bn_state, arch='loco')
    folded = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), folded)

    @jax.jit
    def serve(folded, keypoints, kk):
        inputs = preprocess_monoloco(keypoints, kk).astype(jnp.bfloat16)
        raw = folded_forward(folded, inputs, arch='loco').astype(jnp.float32)
        out = extract_outputs(raw)
        return (out['xyzd'].sum() + out['bi'].sum() + out['yaw'][0].sum()
                + out['h'].sum() + out['w'].sum() + out['l'].sum())

    @jax.jit
    def floor_rt(x):
        return x + 1.0

    kk = jnp.asarray([[718.3351, 0., 600.3891], [0., 718.3351, 181.5122],
                      [0., 0., 1.]], jnp.float32)

    # Transport/runtime floor: trivial scalar program, same sync discipline.
    x0 = jnp.float32(0.0)
    float(floor_rt(x0))
    floor = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(floor_rt(x0))
        floor.append(time.perf_counter() - t0)
    fstats = percentiles(floor)
    print(json.dumps({'metric': 'dispatch_floor_ms',
                      **{k: round(v * 1e3, 3) for k, v in fstats.items()}}),
          flush=True)

    rng = np.random.RandomState(0)
    for batch in (int(b) for b in args.batches.split(',')):
        keypoints = jnp.asarray(rng.rand(batch, 3, 17) * 300, jnp.float32)
        for _ in range(args.warmup):
            float(serve(folded, keypoints, kk))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(serve(folded, keypoints, kk))
            times.append(time.perf_counter() - t0)
        st = percentiles(times)
        rec = {'metric': 'serving_latency_ms', 'batch': batch,
               **{k: round(v * 1e3, 3) for k, v in st.items()},
               'p50_minus_floor_ms': round((st['p50'] - fstats['p50']) * 1e3, 3),
               'inferences_per_sec_at_p50': round(batch / st['p50'], 1)}
        print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    sys.exit(main())
