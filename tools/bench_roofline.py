"""Empirical speed-of-light analysis for the serving MLP on the real chip.

Answers "how far is bench.py from this chip's actual ceiling?" with four
measurements (all scan-chained through the data and synchronized by fetching
a checksum, exactly like bench.py):

  peak        8192^3 bf16 matmul — the chip's achievable wide-shape peak
  chain-xla   8 dependent (131072,1024)@(1024,1024) matmuls via XLA — the
              shape-specific ceiling of the production trunk (hidden 1024)
  chain-res   the same chain as ONE Pallas kernel with all eight weight
              matrices resident in VMEM (zero weight re-streaming, activations
              never leave VMEM) — proves the ceiling is MXU-issue-bound for
              K=N=1024 contractions, not HBM-traffic-bound
  serve       the full bench.py program (K^-1 preprocess -> folded MLP ->
              physical decode) for reference

Round-3 measurements on the tunneled v5e-1 (see docs/DESIGN.md):
peak 275 TFLOP/s, chain-xla ~116-136, chain-res ~136, serve ~126 equivalent
-> the serving path runs at ~93% of the measured shape ceiling; the 2x
headroom suggested by the wide-shape peak is not reachable at hidden 1024
(tested: weight residency, tile sizes 512-4096, unstacked weight refs; Mosaic
rejects bf16 accumulation).

Usage: python tools/bench_roofline.py [out.jsonl]
"""

import functools
import json
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, L = 131072, 1024, 8


def timed(fn, reps=5):
    float(fn())
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def bench_peak():
    n = 8192
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, n) * 0.01, jnp.bfloat16)

    @jax.jit
    def run(a, b):
        def body(c, _):
            out = jnp.dot(a + c.astype(a.dtype) * 1e-9, b,
                          preferred_element_type=jnp.float32)
            return out[0, 0], ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return c

    dt = timed(lambda: run(a, b)) / 8
    return 2 * n ** 3 / dt / 1e12


def _chain_flops():
    return 2 * B * H * H * L


def bench_chain_xla():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H), jnp.bfloat16)
    ws = [jnp.asarray(rng.randn(H, H) * 0.01, jnp.bfloat16) for _ in range(L)]

    @jax.jit
    def run(x, ws):
        def body(c, _):
            y = x + c.astype(x.dtype) * 1e-9
            for w in ws:
                y = jnp.maximum(
                    jnp.dot(y, w, preferred_element_type=jnp.float32),
                    0).astype(jnp.bfloat16)
            return y[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
        return c

    dt = timed(lambda: run(x, ws)) / 4
    return _chain_flops() / dt / 1e12


def bench_chain_resident(tile=512):
    def kernel(x_ref, *refs):
        w_refs, out_ref = refs[:L], refs[L]
        y = x_ref[:]
        for i in range(L):
            y = jnp.dot(y, w_refs[i][:], preferred_element_type=jnp.float32)
            y = jnp.maximum(y, 0).astype(jnp.bfloat16)
        out_ref[:] = y

    @functools.partial(jax.jit, static_argnames=('tile',))
    def run_tile(x, ws, tile):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)] * L,
            out_specs=pl.BlockSpec((tile, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, *ws)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H), jnp.bfloat16)
    ws = tuple(jnp.asarray(rng.randn(H, H) * 0.01, jnp.bfloat16)
               for _ in range(L))

    @jax.jit
    def run(x, ws):
        def body(c, _):
            y = run_tile(x + c.astype(x.dtype) * 1e-9, ws, tile)
            return y[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
        return c

    dt = timed(lambda: run(x, ws)) / 4
    return _chain_flops() / dt / 1e12


def bench_serve():
    from monoloco_tpu.models import (init_loco_params, fold_eval_params,
                                     folded_forward)
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, H, 3)
    folded = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        fold_eval_params(params, bn_state, arch='loco'))
    rng = np.random.RandomState(0)
    kps = jnp.asarray(rng.rand(B, 3, 17) * 300, jnp.float32)
    kk = jnp.asarray([[718.3351, 0., 600.3891], [0., 718.3351, 181.5122],
                      [0., 0., 1.]], jnp.float32)

    @jax.jit
    def run(kps, kk):
        def body(c, _):
            inputs = preprocess_monoloco(kps + c * 1e-9, kk).astype(jnp.bfloat16)
            raw = folded_forward(folded, inputs, arch='loco').astype(jnp.float32)
            out = extract_outputs(raw)
            total = out['xyzd'].sum() + out['bi'].sum()
            return jnp.float32(out['xyzd'][0, 3]), total
        c, s = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return c + s.sum()

    dt = timed(lambda: run(kps, kk)) / 8
    # flops of the trunk only (the in/out projections and decode are noise)
    return B / dt, _chain_flops() / dt / 1e12


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/roofline.jsonl'
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    rows = []
    peak = bench_peak()
    rows.append({'which': 'peak_8192cubed_tflops', 'value': round(peak, 1)})
    print(f'peak (8192^3 bf16):        {peak:6.1f} TFLOP/s')
    cx = bench_chain_xla()
    rows.append({'which': 'chain_xla_tflops', 'value': round(cx, 1)})
    print(f'chain XLA (H=1024 x8):     {cx:6.1f} TFLOP/s')
    cr = bench_chain_resident()
    rows.append({'which': 'chain_pallas_resident_tflops', 'value': round(cr, 1)})
    print(f'chain Pallas resident:     {cr:6.1f} TFLOP/s')
    inf_s, st = bench_serve()
    rows.append({'which': 'serve_inf_per_sec', 'value': round(inf_s, 1),
                 'trunk_equiv_tflops': round(st, 1)})
    print(f'full serving program:      {inf_s/1e6:6.2f} M inf/s '
          f'({st:.1f} TFLOP/s trunk-equivalent)')
    ceiling = max(cx, cr)
    print(f'serving vs shape ceiling:  {100 * st / ceiling:5.1f}%  '
          f'(wide-shape peak {100 * ceiling / peak:4.1f}% reachable at H=1024)')
    with open(out_path, 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')


if __name__ == '__main__':
    main()
