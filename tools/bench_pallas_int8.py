"""End-to-end serving throughput: XLA vs Pallas kernels, bf16 vs int8.

VERDICT r3 item 4: the XLA int8 path lost to bf16 (9.22M vs 9.33M) because
per-layer activation quantize/dequantize ops cost HBM round trips between
matmuls. The fused int8 Pallas kernel (ops/fused_mlp.py _kernel_int8) keeps
activations in VMEM, halves the streamed-weight DMA bytes, and runs the
H x H matmuls on the int8 MXU (2x bf16 peak on v5e). This bench measures the
FULL serving program (K^-1 normalize -> MLP -> physical decode) with the
same anti-self-deception methodology as bench.py (scan-chained iterations,
scalar-checksum fetch, median of 5).

Usage: python tools/bench_pallas_int8.py [variants ...]
  variants: xla-bf16 xla-int8 pallas-bf16 pallas-w8 pallas-dyn8 pallas-int8
  (default: all; pallas-dyn8 = per-row dynamic int8, what
   MONOLOCO_TPU_PRECISION=int8 serves; pallas-w8 = weight-only int8;
   pallas-int8 = static-calibrated a8w8 — NOT parity-grade, see
   ops/fused_mlp.py)
Emits one JSON line per variant.
"""

import json
import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 131072
SCAN_ITERS = 16
# VMEM budget: 2 double-buffered HxH weight slots + ~3 tile x H activation
# buffers; tile 512 fits the 16 MB scoped-vmem limit at H=1024 (tile 2048
# measured OOM: 24.9 MB requested).
TILE = int(os.environ.get('BENCH_PALLAS_TILE', '512'))


def build_serve(variant, folded, q, packed_bf16, packed_w8, packed_int8):
    from monoloco_tpu.models import folded_forward
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs
    from monoloco_tpu.ops import (fused_loco_forward, fused_loco_forward_int8,
                                  fused_loco_forward_w8, fused_loco_forward_dyn8)
    from monoloco_tpu.ops.quant import quantized_forward

    # Fair baseline: the production bf16 path (bench.py) casts the WEIGHTS to
    # bfloat16 too — bf16 activations against f32 weights promote to f32 and
    # stream 4 bytes/weight, which would handicap the baseline and inflate the
    # kernel's apparent win.
    folded_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), folded)

    def mlp(inputs):
        if variant == 'xla-bf16':
            return folded_forward(folded_bf16, inputs.astype(jnp.bfloat16),
                                  arch='loco').astype(jnp.float32)
        if variant == 'xla-int8':
            return quantized_forward(q, inputs)
        if variant == 'pallas-bf16':
            return fused_loco_forward(None, inputs, packed=packed_bf16,
                                      tile=TILE)
        if variant == 'pallas-w8':
            return fused_loco_forward_w8(packed_w8, inputs, tile=TILE)
        if variant == 'pallas-dyn8':
            return fused_loco_forward_dyn8(packed_w8, inputs, tile=TILE)
        if variant == 'pallas-int8':
            return fused_loco_forward_int8(packed_int8, inputs, tile=TILE)
        raise ValueError(variant)

    def serve_once(keypoints, kk):
        inputs = preprocess_monoloco(keypoints, kk)
        out = extract_outputs(mlp(inputs))
        return (out['xyzd'], out['bi'], out['yaw'][0], out['h'], out['w'],
                out['l'])

    @jax.jit
    def serve_scan(keypoints, kk):
        def body(carry, _):
            kps = keypoints + carry * 1e-9
            xyzd, bi, yaw, h, w, l = serve_once(kps, kk)
            total = (xyzd.sum() + bi.sum() + yaw.sum() + h.sum() + w.sum()
                     + l.sum())
            return jnp.float32(xyzd[0, 3]), total

        carry, sums = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=SCAN_ITERS)
        return carry + sums.sum()

    return serve_scan


def main():
    variants = sys.argv[1:] or ['xla-bf16', 'xla-int8', 'pallas-bf16',
                                'pallas-w8', 'pallas-dyn8', 'pallas-int8']
    from monoloco_tpu.utils.backend import require_live_backend
    require_live_backend(context='bench_pallas_int8')
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from monoloco_tpu.models import init_loco_params, fold_eval_params
    from monoloco_tpu.ops import (pack_folded_weights, pack_folded_weights_int8,
                                  pack_folded_weights_w8)
    from monoloco_tpu.ops.quant import quantize_folded, synthetic_calibration_inputs

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, 1024, 3)
    folded = fold_eval_params(params, bn_state, arch='loco')
    kk = jnp.asarray([[718.3351, 0., 600.3891], [0., 718.3351, 181.5122],
                      [0., 0., 1.]], jnp.float32)
    calib = synthetic_calibration_inputs(34, n=4096)
    q = quantize_folded(folded, calib)
    packed_bf16 = pack_folded_weights(folded, dtype=jnp.bfloat16)
    packed_w8 = pack_folded_weights_w8(folded)
    packed_int8 = pack_folded_weights_int8(folded, calib)

    rng = np.random.RandomState(0)
    keypoints = jnp.asarray(rng.rand(BATCH, 3, 17) * 300, jnp.float32)

    for variant in variants:
        serve_scan = build_serve(variant, folded, q, packed_bf16, packed_w8, packed_int8)
        t_compile = time.perf_counter()
        checksum = float(serve_scan(keypoints, kk))        # warm-up/compile
        compile_s = time.perf_counter() - t_compile
        assert checksum == checksum, f'nan checksum ({variant})'
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(serve_scan(keypoints, kk))
            times.append(time.perf_counter() - t0)
        dt = statistics.median(times)
        print(json.dumps({
            'variant': variant,
            'inferences_per_sec': round(BATCH * SCAN_ITERS / dt, 1),
            'median_s': round(dt, 4),
            'compile_s': round(compile_s, 1),
            'batch': BATCH, 'scan_iters': SCAN_ITERS, 'tile': TILE,
        }), flush=True)


if __name__ == '__main__':
    main()
