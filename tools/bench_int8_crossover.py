"""Measure the dyn8-vs-bf16-XLA crossover as a function of serving batch rows.

VERDICT r4 weak item 1: the engine routed batches to the fused dynamic-int8
Pallas kernel only at >= 1024 rows — a numerics-conservatism floor, not a
measured speed crossover — so the HTTP serving surface (max-batch 64 images
x 4-detection buckets = <= 256 rows per dispatch) always measured bf16 even
under MONOLOCO_TPU_PRECISION=int8. This tool produces the measurement that
replaces that guess: for each row count it times the FULL serving program
(K^-1 keypoint normalization -> BN-folded MLP -> physical decode, exactly
bench.py's shape) with the MLP on each path, same-session, and reports the
per-path throughput plus the dyn8/bf16 ratio.

Methodology (same anti-self-deception rules as bench.py):
 - both paths measured in ONE process, interleaved per row count, weights as
   runtime jit arguments;
 - each timed call is a lax.scan chaining SCAN_ITERS iterations through the
   data (XLA cannot batch or overlap iterations) reduced to a scalar
   checksum the host fetches;
 - per row count the reported value is the median of 5 calls.

Also validates numerics per row count: max |decoded distance dyn8 - bf16|
relative deviation on the same inputs — per-ROW dynamic quantization has no
batch-size-dependent failure mode (each row quantizes against its own max),
and this records the evidence.

Appends one JSON line per row count to tools/int8_crossover_r5.jsonl and
prints a summary with the measured crossover row count.

Usage:  python tools/bench_int8_crossover.py [--rows 128,256,...]
        (TPU; ~16 remote compiles on a cold cache — run nohup)
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_ITERS = 16
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'int8_crossover_r5.jsonl')
KK = [[718.3351, 0., 600.3891], [0., 718.3351, 181.5122], [0., 0., 1.]]


def build_serve_scan(mlp):
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs

    def serve_once(w, keypoints, kk):
        inputs = preprocess_monoloco(keypoints, kk)
        out = extract_outputs(mlp(w, inputs))
        return out['xyzd'], out['bi'], out['yaw'][0], out['h'], out['w'], out['l']

    @jax.jit
    def serve_scan(w, keypoints, kk):
        def body(carry, _):
            kps = keypoints + carry * 1e-9
            xyzd, bi, yaw, h, w_, l = serve_once(w, kps, kk)
            total = (xyzd.sum() + bi.sum() + yaw.sum() + h.sum() + w_.sum()
                     + l.sum())
            return jnp.float32(xyzd[0, 3]), total

        carry, sums = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=SCAN_ITERS)
        return carry + sums.sum()

    return serve_scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', default='128,256,512,1024,2048,8192,32768,131072')
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    from monoloco_tpu.utils import enable_compilation_cache
    from monoloco_tpu.utils.backend import require_live_backend
    require_live_backend(context='bench_int8_crossover')
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.models import (init_loco_params, fold_eval_params,
                                     folded_forward)
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs
    from monoloco_tpu.ops import pack_folded_weights_w8, fused_loco_forward_dyn8

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, 1024, 3)
    folded_f32 = fold_eval_params(params, bn_state, arch='loco')
    w_bf16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                    folded_f32)
    w_dyn8 = pack_folded_weights_w8(folded_f32)

    def mlp_bf16(w, inputs):
        return folded_forward(w, inputs.astype(jnp.bfloat16),
                              arch='loco').astype(jnp.float32)

    def mlp_dyn8(w, inputs):
        return fused_loco_forward_dyn8(w, inputs, tile=512)

    scan_bf16 = build_serve_scan(mlp_bf16)
    scan_dyn8 = build_serve_scan(mlp_dyn8)

    # One jitted numerics probe per row count: decoded distance both paths.
    @jax.jit
    def decoded_d(wb, wq, keypoints, kk):
        inputs = preprocess_monoloco(keypoints, kk)
        db = extract_outputs(mlp_bf16(wb, inputs))['xyzd'][:, 3]
        dq = extract_outputs(mlp_dyn8(wq, inputs))['xyzd'][:, 3]
        return db, dq

    kk = jnp.asarray(KK, jnp.float32)
    rng = np.random.RandomState(0)
    rows = [int(r) for r in args.rows.split(',')]
    records = []
    for n in rows:
        keypoints = jnp.asarray(rng.rand(n, 3, 17) * 300, jnp.float32)

        per_path = {}
        # Interleave warmups first (both compiled before either is timed),
        # then interleave timed reps so tunnel drift hits both equally.
        float(scan_bf16(w_bf16, keypoints, kk))
        float(scan_dyn8(w_dyn8, keypoints, kk))
        times = {'bf16': [], 'dyn8': []}
        for _ in range(args.reps):
            for name, fn, w in (('bf16', scan_bf16, w_bf16),
                                ('dyn8', scan_dyn8, w_dyn8)):
                t0 = time.perf_counter()
                checksum = float(fn(w, keypoints, kk))
                times[name].append(time.perf_counter() - t0)
                assert checksum == checksum, 'nan checksum'
        for name in ('bf16', 'dyn8'):
            per_path[name] = n * SCAN_ITERS / statistics.median(times[name])

        db, dq = decoded_d(w_bf16, w_dyn8, keypoints, kk)
        db, dq = np.asarray(db), np.asarray(dq)
        rel = np.abs(dq - db) / np.maximum(np.abs(db), 1e-6)

        rec = {
            'rows': n,
            'bf16_inf_per_s': round(per_path['bf16'], 1),
            'dyn8_inf_per_s': round(per_path['dyn8'], 1),
            'dyn8_over_bf16': round(per_path['dyn8'] / per_path['bf16'], 3),
            'per_call_ms': {
                'bf16': round(1e3 * statistics.median(times['bf16'])
                              / SCAN_ITERS, 3),
                'dyn8': round(1e3 * statistics.median(times['dyn8'])
                              / SCAN_ITERS, 3)},
            'rel_dd_vs_bf16': {'mean': float(rel.mean()),
                               'p99': float(np.percentile(rel, 99)),
                               'max': float(rel.max())},
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
        with open(RESULTS, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    # Crossover: smallest measured row count where dyn8 wins and keeps
    # winning at every larger measured count.
    crossover = None
    for i, rec in enumerate(records):
        if all(r['dyn8_over_bf16'] > 1.0 for r in records[i:]):
            crossover = rec['rows']
            break
    print(json.dumps({'summary': 'int8_crossover',
                      'crossover_rows': crossover,
                      'rows_measured': rows}), flush=True)


if __name__ == '__main__':
    main()
