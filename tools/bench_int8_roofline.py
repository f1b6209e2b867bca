"""Empirical speed-of-light analysis for the INT8 serving path (VERDICT r4 #6).

The bf16 study (tools/bench_roofline.py, DESIGN.md "Speed-of-light analysis")
pinned the bf16 serving program at ~93% of its shape-specific MXU ceiling.
This is the int8 twin: what fraction of the int8-MXU ceiling does the served
dyn8 kernel reach, and where is the remaining headroom? Measurements (all
scan-chained through the data and synchronized by fetching a checksum,
exactly like bench.py):

  peak-int8      8192^3 int8 matmul (int32 accumulation) — the chip's
                 achievable wide-shape int8 peak (v5e datasheet: 2x bf16)
  chain-int8     8 dependent (131072,1024)@(1024,1024) int8 matmuls via XLA
                 with NO requantization between layers (int32 out clipped to
                 int8 by a cheap shift) — the optimistic shape ceiling
  chain-dyn8     the same chain with PER-ROW DYNAMIC requantization between
                 layers (row-max reduction + scale + round, what the serving
                 kernel semantically does) — the best XLA-EXPRESSIBLE chain
                 at dyn8 semantics. NOT an upper bound for the fused kernel:
                 XLA pays each requant as an HBM round trip between matmuls,
                 which the kernel overlaps with MXU/DMA work on VMEM-resident
                 tiles — so the served kernel legitimately lands ABOVE this
                 number (summary key pct_of_dyn_requant_ceiling > 100 means
                 'beats anything XLA can express', not 'exceeds physics').
                 The physical bounds are chain-int8 (the no-requant chain)
                 and peak-int8.
  serve-dyn8     the full bench.py program with the served fused dyn8 kernel
                 (K^-1 preprocess -> kernel -> physical decode), at tiles
                 256/512/1024 — where the headline 11.7 M comes from

Residual-headroom candidates the summary quantifies analytically:
  - quantizing the l0/head matmuls: they are (34->H) and (H->9/10) — their
    FLOP share at H=1024, n_stage=3 is (34+10)/(8*1024) ~ 0.5% of the trunk;
    at best a 0.25% end-to-end win. Not worth the numerics risk.
  - fusing decode into the kernel: decode is elementwise on (B,9) f32 —
    9/1024 of one layer's activation bytes; XLA already fuses it with the
    kernel's consumer copy.

Appends one JSON line per measurement to tools/int8_roofline_r5.jsonl.
Usage: python tools/bench_int8_roofline.py   (TPU; ~8 remote compiles cold —
run nohup, serialize with other TPU work)
"""

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'int8_roofline_r5.jsonl')
B, H, L = 131072, 1024, 8


def timed(fn, reps=5):
    float(fn())
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def bench_peak_int8():
    import jax
    import jax.numpy as jnp
    n = 8192
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)
    b = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)

    @jax.jit
    def run(a, b):
        def body(c, _):
            # Data dependence via a cheap elementwise xor (wraps, harmless —
            # only the dependence matters for timing).
            aa = a ^ (c & 1).astype(jnp.int8)
            out = jax.lax.dot(aa, b, preferred_element_type=jnp.int32)
            return out[0, 0], ()
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=8)
        return c

    dt = timed(lambda: float(run(a, b))) / 8
    return 2 * n ** 3 / dt / 1e12


def _chain_ops():
    return 2 * B * H * H * L


def bench_chain_int8(requant):
    """8 dependent int8 H x H matmuls; between layers either a cheap static
    shift back to int8 (requant=False: optimistic ceiling) or the full
    per-row dynamic requantization the dyn8 kernel performs (requant=True:
    row |max| reduction -> scale -> round -> int8)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (B, H)), jnp.int8)
    ws = [jnp.asarray(rng.randint(-127, 128, (H, H)), jnp.int8)
          for _ in range(L)]

    @jax.jit
    def run(x, ws):
        def body(c, _):
            y = x ^ (c & 1).astype(jnp.int8)
            for w in ws:
                acc = jax.lax.dot(y, w, preferred_element_type=jnp.int32)
                if requant:
                    f = acc.astype(jnp.float32)
                    m = jnp.max(jnp.abs(f), axis=1, keepdims=True)
                    y = jnp.round(f * (127.0 / jnp.maximum(m, 1e-6))
                                  ).astype(jnp.int8)
                else:
                    y = (acc >> 8).astype(jnp.int8)
            return y[0, 0].astype(jnp.int32), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=4)
        return c

    dt = timed(lambda: float(run(x, ws))) / 4
    return _chain_ops() / dt / 1e12


def bench_serve_dyn8(tile, resident=False):
    """The full serving program exactly as bench.py measures it, with the
    fused dyn8 kernel at the given tile — streaming (the served flavor) or
    VMEM-resident weights (round-5 candidate: the int8 stack is 8 MB at
    hidden 1024, so it FITS resident where the 16 MB bf16 stack did not,
    eliminating n_tiles x 8 MB of weight re-streaming per call)."""
    import jax
    import jax.numpy as jnp
    from monoloco_tpu.models import init_loco_params, fold_eval_params
    from monoloco_tpu.ops import (pack_folded_weights_w8,
                                  fused_loco_forward_dyn8,
                                  fused_loco_forward_dyn8_resident)
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs
    fwd = fused_loco_forward_dyn8_resident if resident else fused_loco_forward_dyn8

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, H, 3)
    packed = pack_folded_weights_w8(fold_eval_params(params, bn_state,
                                                     arch='loco'))
    rng = np.random.RandomState(0)
    kps = jnp.asarray(rng.rand(B, 3, 17) * 300, jnp.float32)
    kk = jnp.asarray([[718.3351, 0., 600.3891], [0., 718.3351, 181.5122],
                      [0., 0., 1.]], jnp.float32)

    @jax.jit
    def run(w, kps, kk):
        def body(c, _):
            inputs = preprocess_monoloco(kps + c * 1e-9, kk)
            raw = fwd(w, inputs, tile=tile)
            out = extract_outputs(raw)
            total = out['xyzd'].sum() + out['bi'].sum()
            return jnp.float32(out['xyzd'][0, 3]), total
        c, s = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return c + s.sum()

    dt = timed(lambda: float(run(packed, kps, kk))) / 8
    return B / dt, _chain_ops() / dt / 1e12


def main():
    from monoloco_tpu.utils import enable_compilation_cache
    from monoloco_tpu.utils.backend import require_live_backend
    require_live_backend(context='bench_int8_roofline')
    enable_compilation_cache()

    rows = []

    def emit(rec):
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        with open(RESULTS, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    peak = bench_peak_int8()
    emit({'which': 'peak_int8_8192cubed_tops', 'value': round(peak, 1)})
    cn = bench_chain_int8(requant=False)
    emit({'which': 'chain_int8_noquant_tops', 'value': round(cn, 1)})
    cq = bench_chain_int8(requant=True)
    emit({'which': 'chain_int8_dyn_requant_tops', 'value': round(cq, 1)})
    serve = {}
    for resident in (False, True):
        for tile in (256, 512, 1024):
            inf_s, tops = bench_serve_dyn8(tile, resident=resident)
            key = f"tile{tile}{'-resident' if resident else ''}"
            serve[key] = (inf_s, tops)
            emit({'which': f'serve_dyn8_{key}', 'inf_per_sec': round(inf_s, 1),
                  'trunk_equiv_tops': round(tops, 1)})

    best_tile = max(serve, key=lambda t: serve[t][0])
    inf_s, st = serve[best_tile]
    summary = {
        'which': 'summary',
        'best_tile': best_tile,
        'serve_minf_s': round(inf_s / 1e6, 2),
        'pct_of_dyn_requant_ceiling': round(100 * st / cq, 1),
        'pct_of_noquant_ceiling': round(100 * st / cn, 1),
        'requant_tax_pct': round(100 * (1 - cq / cn), 1),
        'l0_head_flop_share_pct': round(100 * (34 + 10) / (L * H), 2),
    }
    emit(summary)
    print(f"\nserve dyn8 (tile {best_tile}): {inf_s/1e6:.2f} M inf/s "
          f"= {st:.1f} TOPS trunk-equivalent")
    print(f"vs dyn-requant shape ceiling {cq:.1f}: "
          f"{100*st/cq:.1f}%   vs no-requant ceiling {cn:.1f}: "
          f"{100*st/cn:.1f}%   (wide-shape int8 peak {peak:.1f} TOPS)")


if __name__ == '__main__':
    main()
