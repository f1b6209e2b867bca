"""Int8 post-training quantization for the folded serving path (XLA route).

TPU v5e's int8 MXU peak is 2x the bfloat16 peak. THIS XLA route does not
win end-to-end (round-3: 9.22M inferences/sec vs 9.33M bf16; round-4
fair-control same-session: 9.20M vs 9.36M — a slight loss): the per-layer
activation quantize/dequantize ops cost HBM round trips between matmuls.
The FUSED a8w8 Pallas kernel built on this module's calibration
(ops/fused_mlp.py pack_folded_weights_int8 / _kernel_int8) removes exactly
those costs and measured 12.47M vs 9.36M bf16-XLA same-session (1.33x) —
but round-4's full-volume end-metric study (tools/int8_eval_parity.py)
showed STATIC activation calibration is not parity-grade on trained
checkpoints: synthetic calibration overestimates real activation ranges
~13x (≈3.3 effective bits, 6.5% mean per-row distance deviation, ALE +69%),
and even real-data per-tensor calibration measures 2.8% mean. What
`MONOLOCO_TPU_PRECISION=int8` actually serves is therefore the DYNAMIC
per-row a8w8 kernel (ops/fused_mlp.py pack_folded_weights_w8 +
fused_loco_forward_dyn8 — activations quantized in-kernel with per-ROW
scales, no calibration; end-metric parity verified, PARITY.md round-4).
This module survives as the STATIC a8w8 quantization scheme for the
`int8-a8` / `int8-xla` bench ablations and their accuracy tests. The
reference has no counterpart (torch f32 only).

Scheme (standard symmetric PTQ):
 - weights: per-output-channel int8, scale = max|w| / 127 over each column;
 - activations: per-tensor static int8 scales calibrated by running the f32
   forward on a representative batch (`quantize_folded` records the max|x|
   entering every matmul);
 - accumulation in int32 via lax.dot_general(preferred_element_type=int32),
   rescale to f32, bias add and ReLU in f32, residual stream kept f32.

Accuracy: on checkpoints whose activation distribution matches the
calibration batch, decoded distances track f32 within ~1% relative
(tests/test_quant.py); on trained checkpoints under distribution shift the
error grows to several percent (see above) — which is why no serving path
uses static activation scales.
"""

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_calibration_inputs(in_dim, n=2048, seed=1):
    """The shared synthetic calibration batch for the a8 ablations.

    One definition (KITTI-like intrinsics, uniform keypoints over a
    1242x375-ish image) used by bench.py, tools/bench_pallas_int8.py, and the
    tests, so 'what the a8 ablation measures' cannot silently de-sync across
    sites. NOTE: round-4 measured this distribution to overestimate trained-
    checkpoint activation ranges ~13x — which is exactly why no serving path
    calibrates on it (module docstring)."""
    from ..network.preprocess import preprocess_monoloco, preprocess_monstereo
    rng = np.random.RandomState(seed)
    kk = jnp.asarray([[718.3351, 0., 600.3891],
                      [0., 718.3351, 181.5122], [0., 0., 1.]], jnp.float32)
    if in_dim == 68:
        side = max(2, int(round(n ** 0.5)))
        kps_l = jnp.asarray(rng.rand(side, 3, 17) * 300, jnp.float32)
        kps_r = jnp.asarray(rng.rand(side, 3, 17) * 300, jnp.float32)
        inputs, _ = preprocess_monstereo(kps_l, kps_r, kk)   # (side^2, 68)
        return inputs
    kps = jnp.asarray(rng.rand(n, 3, 17) * 300, jnp.float32)
    return preprocess_monoloco(kps, kk)


def _quant_weight(w):
    """(in, out) f32 -> (int8 weight, per-column f32 scale)."""
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quant_act(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _int8_dense(x, x_scale, layer):
    """f32 x -> int8 matmul -> f32 (+bias)."""
    xq = _quant_act(x, x_scale)
    acc = jax.lax.dot_general(
        xq, layer['wq'], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * layer['scale'])[None, :] + layer['b']


def quantize_folded(folded, calib_x):
    """Folded f32 eval params + calibration batch -> int8 serving params.

    Calibration replays `folded_forward` ('loco' arch) recording the max
    absolute activation entering each matmul.
    """
    calib_x = jnp.asarray(calib_x, jnp.float32)

    def amax(v):
        return jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-8)

    def qlayer(layer):
        wq, scale = _quant_weight(layer['w'])
        return {'wq': wq, 'scale': scale, 'b': layer['b']}

    q = {'l0': qlayer(folded['l0']), 'a_in': amax(calib_x)}

    # Replay the forward on the calibration batch, collecting stage scales.
    y = jax.nn.relu(calib_x @ folded['l0']['w'] + folded['l0']['b'])
    n_stages = folded['stages']['a']['w'].shape[0]
    sa, sh = [], []
    for i in range(n_stages):
        st_a = jax.tree_util.tree_map(lambda v: v[i], folded['stages']['a'])
        st_b = jax.tree_util.tree_map(lambda v: v[i], folded['stages']['b'])
        sa.append(amax(y))
        h = jax.nn.relu(y @ st_a['w'] + st_a['b'])
        sh.append(amax(h))
        h = jax.nn.relu(h @ st_b['w'] + st_b['b'])
        y = y + h

    def qstacked(stacked):
        wq, scale = jax.vmap(_quant_weight)(stacked['w'])
        return {'wq': wq, 'scale': scale, 'b': stacked['b']}

    q['stages'] = {
        'a': qstacked(folded['stages']['a']),
        'b': qstacked(folded['stages']['b']),
        'a_in': jnp.stack(sa),
        'b_in': jnp.stack(sh),
    }
    q['y_out'] = amax(y)
    for name in ('w2', 'w_aux', 'w3f', 'w_fin'):
        q[name] = qlayer(folded[name])
    y2 = y @ folded['w2']['w'] + folded['w2']['b']
    q['y2_in'] = amax(y2)
    y3 = jax.nn.relu(y2 @ folded['w3f']['w'] + folded['w3f']['b'])
    q['y3_in'] = amax(y3)
    return q


def quantized_forward(q, x):
    """Int8 serving forward ('loco' arch); returns raw (m, out) f32 outputs."""
    y = jax.nn.relu(_int8_dense(x, q['a_in'], q['l0']))

    def body(carry, st):
        h = jax.nn.relu(_int8_dense(carry, st['a_in'],
                                    {'wq': st['wq_a'], 'scale': st['sc_a'], 'b': st['b_a']}))
        h = jax.nn.relu(_int8_dense(h, st['b_in'],
                                    {'wq': st['wq_b'], 'scale': st['sc_b'], 'b': st['b_b']}))
        return carry + h, None

    stages = {
        'wq_a': q['stages']['a']['wq'], 'sc_a': q['stages']['a']['scale'],
        'b_a': q['stages']['a']['b'], 'a_in': q['stages']['a_in'],
        'wq_b': q['stages']['b']['wq'], 'sc_b': q['stages']['b']['scale'],
        'b_b': q['stages']['b']['b'], 'b_in': q['stages']['b_in'],
    }
    y, _ = jax.lax.scan(body, y, stages)

    y2 = _int8_dense(y, q['y_out'], q['w2'])
    aux = _int8_dense(y2, q['y2_in'], q['w_aux'])
    y3 = jax.nn.relu(_int8_dense(y2, q['y2_in'], q['w3f']))
    fin = _int8_dense(y3, q['y3_in'], q['w_fin'])
    return jnp.concatenate([fin, aux], axis=1)
