"""Benchmark: pedestrian inference throughput on one chip.

Measures the full serving compute path — K^-1 keypoint normalization ->
BN-folded residual MLP (MonoLoco++, hidden 1024, 3 stages) -> physical decode
(spherical->cartesian, Laplace spread, yaw) — steady-state, device-resident.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the driver north-star target of 50,000
inferences/sec/chip (BASELINE.md: the reference publishes no machine-readable
throughput numbers).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BATCH = 32768
TARGET = 50_000.0


def main():
    from monoloco_tpu.models import init_loco_params, fold_eval_params, folded_forward
    from monoloco_tpu.network.preprocess import preprocess_monoloco
    from monoloco_tpu.network.decode import extract_outputs

    params, bn_state = init_loco_params(jax.random.PRNGKey(0), 34, 9, 1024, 3)
    folded = fold_eval_params(params, bn_state, arch='loco')

    @jax.jit
    def serve(folded, keypoints, kk):
        inputs = preprocess_monoloco(keypoints, kk)
        raw = folded_forward(folded, inputs, arch='loco')
        out = extract_outputs(raw)
        return out['xyzd'], out['bi'], out['yaw'][0], out['h'], out['w'], out['l']

    rng = np.random.RandomState(0)
    keypoints = jnp.asarray(rng.rand(BATCH, 3, 17) * 300, jnp.float32)
    kk = jnp.asarray([[718.3351, 0., 600.3891], [0., 718.3351, 181.5122], [0., 0., 1.]],
                     jnp.float32)

    # Warm up / compile.
    out = serve(folded, keypoints, kk)
    jax.block_until_ready(out)

    # Steady state.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = serve(folded, keypoints, kk)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    throughput = BATCH * iters / dt
    print(json.dumps({
        "metric": "pedestrian_inferences_per_sec",
        "value": round(throughput, 1),
        "unit": "inferences/sec/chip",
        "vs_baseline": round(throughput / TARGET, 3),
    }))


if __name__ == '__main__':
    main()
