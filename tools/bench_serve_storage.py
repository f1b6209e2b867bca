"""Measure bf16 WEIGHT STORAGE for the engine's default serving path.

Round-5 self-review finding: `bench.py`'s bf16 headline (and the int8
crossover study's bf16 arm) serve bf16-STORED folded weights, but the engine
(`network/engine.py`) serves the f32-stored fold under
`jax.default_matmul_precision` — the MXU multiplies see the same bf16-rounded
operands either way (TPU default precision rounds both operands to bf16), but
f32 storage streams 2x the weight bytes from HBM per dispatch (16 MB vs 8 MB
at hidden 1024) and 2x the activation bytes when the activations are cast
too. PARITY.md already recorded the gap at offline scale: f32-weight
default-precision path 8.05 M vs 9.36 M inf/s.

This tool measures the three candidate storage policies for the engine's
default TPU path, same-session, interleaved, at serve-scale and
offline-scale row counts (bench.py's exact serving program: K^-1 keypoint
normalization -> BN-folded MLP -> physical decode):

  f32store    f32 weights, f32 activations — the engine before round 5
  w-bf16      bf16 weights, f32 activations — weights-only storage cast
  mlp-bf16    bf16 weights AND activations (decode stays f32) — what
              bench.py's bf16 headline measures

and validates numerics per row count: max relative |decoded distance - f32|
for both bf16 arms on the same inputs.

Methodology (anti-self-deception rules shared with bench_int8_crossover.py):
both/all arms in ONE process, interleaved warmups then interleaved timed
reps, each timed call a lax.scan chaining SCAN_ITERS iterations reduced to a
fetched scalar checksum, median of --reps.

Appends one JSON line per row count to tools/serve_storage_r5.jsonl.

Usage: python tools/bench_serve_storage.py [--rows 128,512,...] (TPU; many
remote compiles on a cold cache — run nohup)
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
                       'serve_storage_r5.jsonl')
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
    ap.add_argument('--rows', default='128,512,2048,32768,131072')
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    from monoloco_tpu.utils import enable_compilation_cache
    from monoloco_tpu.utils.backend import require_live_backend
    require_live_backend(context='bench_serve_storage')
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.models import (init_loco_params, fold_eval_params,
                                     folded_forward)
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, 1024, 3)
    folded_f32 = fold_eval_params(params, bn_state, arch='loco')
    w_bf16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                    folded_f32)

    def mlp_f32store(w, inputs):
        # Matmul precision is left at the TPU default (bf16 multiplies),
        # exactly the engine's _MATMUL_PRECISION under an unset env.
        return folded_forward(w, inputs, arch='loco')

    def mlp_wbf16(w, inputs):
        # bf16 weights, f32 activations: jnp promotion runs the matmuls in
        # f32 result dtype; the MXU still sees bf16-rounded operands.
        return folded_forward(w, inputs, arch='loco')

    def mlp_mlpbf16(w, inputs):
        return folded_forward(w, inputs.astype(jnp.bfloat16),
                              arch='loco').astype(jnp.float32)

    arms = (('f32store', mlp_f32store, folded_f32),
            ('w-bf16', mlp_wbf16, w_bf16),
            ('mlp-bf16', mlp_mlpbf16, w_bf16))
    scans = {name: build_serve_scan(mlp) for name, mlp, _ in arms}

    @jax.jit
    def decoded_d(wf, wb, keypoints, kk):
        inputs = preprocess_monoloco(keypoints, kk)
        d_f32 = extract_outputs(mlp_f32store(wf, inputs))['xyzd'][:, 3]
        d_w = extract_outputs(mlp_wbf16(wb, inputs))['xyzd'][:, 3]
        d_m = extract_outputs(mlp_mlpbf16(wb, inputs))['xyzd'][:, 3]
        return d_f32, d_w, d_m

    kk = jnp.asarray(KK, jnp.float32)
    rng = np.random.RandomState(0)
    for n in (int(r) for r in args.rows.split(',')):
        keypoints = jnp.asarray(rng.rand(n, 3, 17) * 300, jnp.float32)
        for name, _, w in arms:                       # interleaved warmup
            float(scans[name](w, keypoints, kk))
        times = {name: [] for name, _, _ in arms}
        for _ in range(args.reps):
            for name, _, w in arms:                   # interleaved reps
                t0 = time.perf_counter()
                checksum = float(scans[name](w, keypoints, kk))
                times[name].append(time.perf_counter() - t0)
                assert checksum == checksum, 'nan checksum'
        d_f32, d_w, d_m = (np.asarray(x) for x in
                           decoded_d(folded_f32, w_bf16, keypoints, kk))
        rel_w = np.abs(d_w - d_f32) / np.maximum(np.abs(d_f32), 1e-6)
        rel_m = np.abs(d_m - d_f32) / np.maximum(np.abs(d_f32), 1e-6)
        rec = {'rows': n}
        for name, _, _ in arms:
            rec[name + '_inf_per_s'] = round(
                n * SCAN_ITERS / statistics.median(times[name]), 1)
        rec['w_bf16_over_f32store'] = round(
            rec['w-bf16_inf_per_s'] / rec['f32store_inf_per_s'], 3)
        rec['mlp_bf16_over_f32store'] = round(
            rec['mlp-bf16_inf_per_s'] / rec['f32store_inf_per_s'], 3)
        rec['rel_dd_vs_f32'] = {
            'w-bf16': {'mean': float(rel_w.mean()), 'max': float(rel_w.max())},
            'mlp-bf16': {'mean': float(rel_m.mean()), 'max': float(rel_m.max())}}
        with open(RESULTS, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
