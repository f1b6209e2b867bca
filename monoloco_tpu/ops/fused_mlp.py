"""Pallas TPU kernel: the entire BN-folded Loco eval MLP in one fused kernel.

Capability parity target: the LocoModel forward of the reference
(/root/reference/monoloco/network/architectures.py:6-102), served as a single
kernel over the inference-folded affine form (see models/loco.py).

One grid step processes one batch tile end-to-end:
  y  = relu(x @ W0 + b0)                      # 34 -> H input projection
  3x: h = relu(y @ Wa + ba); h = relu(h @ Wb + bb); y = y + h
  y2 = y @ W2 + b2;  aux = y2 @ Waux + baux
  fin = relu(y2 @ W3f + b3f) @ Wfin + bfin
  out = [fin, aux]                            # (tile, out)

The eight H x H weight matrices stay in HBM (stacked (8, H, H)); the kernel
streams them through a two-slot VMEM scratch with async DMA double-buffering,
so each layer's weight transfer overlaps the previous layer's MXU work. The
input projection and head weights are tiny and live in VMEM for the whole
kernel. Matmuls run on the MXU with f32 accumulation (weights optionally
bfloat16). VMEM budget at H=1024, tile=512, bf16 weights:
2 x 2 MB weight slots + ~3 x 2 MB activations ~= 10 MB < 16 MB.

This replaces the XLA path models/loco.py:folded_forward for serving; the
surrounding decode stays in XLA (it fuses into the same program).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_folded_weights(folded, dtype=jnp.bfloat16):
    """Stack the folded Loco parameters for the kernel.

    Returns (w0, b0, w_stack (2S+2, H, H), b_stack (2S+2, H), w_aux, b_aux,
    w_fin, b_fin). Weight order: [s0a, s0b, s1a, s1b, ..., w2, w3f].
    """
    stages_a_w = folded['stages']['a']['w']   # (S, H, H)
    stages_a_b = folded['stages']['a']['b']
    stages_b_w = folded['stages']['b']['w']
    stages_b_b = folded['stages']['b']['b']
    n_stage = stages_a_w.shape[0]
    ws, bs = [], []
    for i in range(n_stage):
        ws += [stages_a_w[i], stages_b_w[i]]
        bs += [stages_a_b[i], stages_b_b[i]]
    ws += [folded['w2']['w'], folded['w3f']['w']]
    bs += [folded['w2']['b'], folded['w3f']['b']]
    return (
        folded['l0']['w'].astype(dtype),
        folded['l0']['b'].astype(jnp.float32),
        jnp.stack(ws).astype(dtype),
        jnp.stack(bs).astype(jnp.float32),
        folded['w_aux']['w'].astype(dtype),
        folded['w_aux']['b'].astype(jnp.float32),
        folded['w_fin']['w'].astype(dtype),
        folded['w_fin']['b'].astype(jnp.float32),
    )


def _kernel(x_ref, w0_ref, b0_ref, bstack_ref, waux_ref, baux_ref,
            wfin_ref, bfin_ref, wstack_hbm, out_ref, wbuf, sems, *, n_mm, acc_dtype):
    """n_mm = 2*num_stage + 2 streamed H x H matmuls."""
    cdtype = w0_ref.dtype

    def start_load(idx, slot):
        pltpu.make_async_copy(wstack_hbm.at[idx], wbuf.at[slot], sems.at[slot]).start()

    def wait(idx, slot):
        pltpu.make_async_copy(wstack_hbm.at[idx], wbuf.at[slot], sems.at[slot]).wait()

    # Prime the pipeline: both slots in flight.
    start_load(0, 0)
    if n_mm > 1:
        start_load(1, 1)

    def mm(act, slot, bias_idx):
        w = wbuf[slot]
        out = jax.lax.dot_general(
            act.astype(cdtype), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        return out + bstack_ref[bias_idx][None, :]

    # Input projection (weights resident in VMEM).
    x = x_ref[:]
    y = jax.lax.dot_general(
        x.astype(cdtype), w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)
    y = jnp.maximum(y + b0_ref[:][None, :], 0.0)

    # Residual stages over the streamed weights.
    n_stage = (n_mm - 2) // 2
    idx = 0
    for _ in range(n_stage):
        wait(idx, idx % 2)
        h = jnp.maximum(mm(y, idx % 2, idx), 0.0)
        if idx + 2 < n_mm:
            start_load(idx + 2, idx % 2)
        idx += 1
        wait(idx, idx % 2)
        h = jnp.maximum(mm(h, idx % 2, idx), 0.0)
        if idx + 2 < n_mm:
            start_load(idx + 2, idx % 2)
        y = y + h
        idx += 1

    # Split head: w2 (no activation) -> aux and w3f+relu -> fin.
    wait(idx, idx % 2)
    y2 = mm(y, idx % 2, idx)
    if idx + 2 < n_mm:
        start_load(idx + 2, idx % 2)
    idx += 1
    aux = jax.lax.dot_general(
        y2.astype(cdtype), waux_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype) + baux_ref[:][None, :]
    wait(idx, idx % 2)
    y3 = jnp.maximum(mm(y2, idx % 2, idx), 0.0)
    fin = jax.lax.dot_general(
        y3.astype(cdtype), wfin_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype) + bfin_ref[:][None, :]

    out_ref[:] = jnp.concatenate([fin, aux], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def _fused_call(packed, x, tile, interpret=False):
    w0, b0, wstack, bstack, waux, baux, wfin, bfin = packed
    batch, in_dim = x.shape
    hidden = w0.shape[1]
    n_mm = wstack.shape[0]
    out_dim = wfin.shape[1] + 1
    n_tiles = batch // tile
    dtype = wstack.dtype

    kernel = functools.partial(_kernel, n_mm=n_mm, acc_dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, in_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bstack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # waux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # baux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wfin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bfin
            pl.BlockSpec(memory_space=pl.ANY),       # wstack stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, hidden), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * hidden * (in_dim + n_mm * hidden + out_dim),
            bytes_accessed=n_mm * hidden * hidden * wstack.dtype.itemsize
                           + batch * (in_dim + out_dim) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w0, b0, bstack, waux, baux, wfin, bfin, wstack)


def fused_loco_forward(folded, x, dtype=jnp.bfloat16, tile=512, packed=None,
                       interpret=False):
    """Run the fused kernel on (m, in) inputs. Requires hidden % 128 == 0.

    Pads the batch to a tile multiple; returns (m, out) f32. Pass a pre-packed
    weight tuple (pack_folded_weights) to avoid re-packing per call.
    """
    hidden = packed[0].shape[1] if packed is not None else folded['l0']['w'].shape[1]
    if hidden % 128 != 0:
        raise ValueError(f"fused kernel requires hidden % 128 == 0, got {hidden}")
    if packed is None:
        packed = pack_folded_weights(folded, dtype=dtype)
    m = x.shape[0]
    tile = min(tile, max(8, 1 << (m - 1).bit_length()))
    padded = -(-m // tile) * tile
    if padded != m:
        x = jnp.concatenate([x, jnp.zeros((padded - m, x.shape[1]), x.dtype)])
    out = _fused_call(packed, x, tile, interpret=interpret)
    return out[:m]


# ---------------------------------------------------------------------------
# Int8 variants: the streamed H x H weights stored int8 (half the HBM DMA
# bytes of bf16 — the dominant cost at serving batch sizes), in THREE
# activation flavors sharing one kernel (_kernel_int8 act_mode):
#
#  - 'dynamic' (fused_loco_forward_dyn8, pack_folded_weights_w8): a8w8 with
#    per-ROW activation scales computed in-kernel (a VPU row-max overlapped
#    with the MXU), int8 x int8 MXU matmuls (2x the bf16 peak), NO
#    calibration. Measured 11.61M vs 9.30M bf16-XLA same-session (1.25x) at
#    end-metric parity (full-volume ALE delta −0.03% mono / +0.16% stereo,
#    tools/int8_eval_parity.py). THIS is what MONOLOCO_TPU_PRECISION=int8
#    serves (engine.py _mlp_forward).
#
#  - 'none' = w8a16 (fused_loco_forward_w8, pack_folded_weights_w8):
#    weight-only int8. Weight tiles convert int8 -> bf16 in VMEM, matmuls run
#    bf16 with f32 accumulation, and the per-output-channel weight scale is
#    applied to the matmul OUTPUT — exactly equivalent to dequantizing the
#    weights, but costs tile*H multiplies instead of H*H and avoids a second
#    rounding through bf16. Parity-grade (0.22% mean decoded-distance
#    deviation) but LOSES to bf16 XLA end-to-end (8.16M, 0.88x — the win is
#    the int8 MXU, not the DMA halving). Measured ablation only
#    (bench.py does not expose it; tools/bench_pallas_int8.py does).
#
#  - 'static' = a8w8 (fused_loco_forward_int8, pack_folded_weights_int8):
#    activations quantized with static per-tensor scales calibrated on a
#    representative batch. Fastest first cut (12.47M) but static calibration
#    is NOT parity-grade on trained checkpoints: synthetic calibration
#    overestimated real activation ranges ~13x (≈3.3 effective bits, 6.5%
#    mean per-row distance deviation, ALE +69% at full volume —
#    tools/int8_eval_parity.py round-4), and even real-data calibration
#    measures 2.8% mean. Kept as a measured ablation only
#    (bench.py MONOLOCO_TPU_PRECISION=int8-a8).
#
# Rationale (VERDICT r3 item 4): the XLA int8 path (ops/quant.py) measured
# SLOWER than bf16 end-to-end (9.22M vs 9.33M) because the per-layer
# activation quantize/dequantize ops cost HBM round trips between matmuls.
# Inside one Pallas kernel the activations never leave VMEM, the conversions
# are VPU work overlapped with MXU/DMA, and the streamed int8 weights HALVE
# the HBM DMA bytes vs bf16 — the two costs that made XLA-int8 lose are
# exactly what fusion removes.
# ---------------------------------------------------------------------------


def pack_folded_weights_w8(folded):
    """Weight-only int8 pack for the fused kernel (w8a16 — NO calibration).

    The streamed H x H matmuls are stored int8 with per-output-channel scales
    applied to the matmul output; activations stay bf16/f32. The tiny input
    projection and head matmuls stay bfloat16 (VMEM-resident, negligible
    FLOPs). Returns the same tuple layout as pack_folded_weights_int8 with
    inv_in unused (ones) so both flavors share one kernel and call path.
    Weight quantization numerics match ops/quant.py _quant_weight
    (round-half-even, zero-column guard).
    """
    from .quant import _quant_weight
    stages_a = folded['stages']['a']
    stages_b = folded['stages']['b']
    n_stage = stages_a['w'].shape[0]
    wqs, oscales, bs = [], [], []
    for i in range(n_stage):
        for st in (stages_a, stages_b):
            wq, scale = _quant_weight(st['w'][i])
            wqs.append(wq)
            oscales.append(scale)
            bs.append(st['b'][i])
    for name in ('w2', 'w3f'):
        wq, scale = _quant_weight(folded[name]['w'])
        wqs.append(wq)
        oscales.append(scale)
        bs.append(folded[name]['b'])
    n_mm = len(wqs)
    return (
        folded['l0']['w'].astype(jnp.bfloat16),
        folded['l0']['b'].astype(jnp.float32),
        jnp.stack(wqs),                                    # int8
        jnp.ones((n_mm,), jnp.float32),                    # inv_in: unused
        jnp.stack(oscales).astype(jnp.float32),
        jnp.stack(bs).astype(jnp.float32),
        folded['w_aux']['w'].astype(jnp.bfloat16),
        folded['w_aux']['b'].astype(jnp.float32),
        folded['w_fin']['w'].astype(jnp.bfloat16),
        folded['w_fin']['b'].astype(jnp.float32),
    )


def pack_folded_weights_int8(folded, calib_x):
    """Quantize the streamed H x H matmuls to int8 for the fused kernel.

    Reuses ops/quant.py's calibration (per-output-channel weight scales,
    per-tensor static activation scales from a representative batch). The
    tiny input projection and the two head matmuls stay bfloat16 — they are
    VMEM-resident and contribute negligible FLOPs.

    Returns (w0, b0, wq_stack (n_mm, H, H) int8, inv_in (n_mm,) f32,
    out_scale (n_mm, H) f32, b_stack (n_mm, H) f32, w_aux, b_aux, w_fin,
    b_fin) with the same [s0a, s0b, ..., w2, w3f] streaming order as
    pack_folded_weights.
    """
    from .quant import quantize_folded
    q = quantize_folded(folded, calib_x)
    n_stage = q['stages']['a']['wq'].shape[0]
    wqs, in_scales, out_scales, bs = [], [], [], []
    for i in range(n_stage):
        for half, s_in in (('a', q['stages']['a_in'][i]),
                           ('b', q['stages']['b_in'][i])):
            st = q['stages'][half]
            wqs.append(st['wq'][i])
            in_scales.append(s_in)
            out_scales.append(s_in * st['scale'][i])
            bs.append(st['b'][i])
    for name, s_in in (('w2', q['y_out']), ('w3f', q['y2_in'])):
        wqs.append(q[name]['wq'])
        in_scales.append(s_in)
        out_scales.append(s_in * q[name]['scale'])
        bs.append(q[name]['b'])
    return (
        folded['l0']['w'].astype(jnp.bfloat16),
        folded['l0']['b'].astype(jnp.float32),
        jnp.stack(wqs),                                    # int8
        1.0 / jnp.stack(in_scales).astype(jnp.float32),
        jnp.stack(out_scales).astype(jnp.float32),
        jnp.stack(bs).astype(jnp.float32),
        folded['w_aux']['w'].astype(jnp.bfloat16),
        folded['w_aux']['b'].astype(jnp.float32),
        folded['w_fin']['w'].astype(jnp.bfloat16),
        folded['w_fin']['b'].astype(jnp.float32),
    )


def _int8_mm(act, w_tile, inv_in_i, oscale_i, b_i, act_mode):
    """One quantized H x H matmul on an in-VMEM weight tile. act_mode:
      'static'  — quantize with the calibrated per-tensor scales, int8 MXU
                  (a8w8; ablation only — not parity-grade on trained nets);
      'dynamic' — quantize with per-ROW scales computed on the fly (row max
                  over the lane axis, a VPU reduction overlapped with the
                  MXU), int8 MXU; no calibration, inv_in unused;
      'none'    — convert the weight tile to bf16 and run bf16 matmuls
                  (w8a16; inv_in unused).
    Shared by the streaming kernel (weights double-buffered from HBM) and
    the resident kernel (whole int8 stack VMEM-resident), so the two paths
    are numerically identical by construction."""
    if act_mode == 'static':
        # Static per-tensor activation scale (calibrated), round-half-even
        # to match the XLA int8 path (ops/quant.py _quant_act).
        qx = jnp.clip(jnp.round(act * inv_in_i), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qx, w_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * oscale_i[None, :] + b_i[None, :]
    if act_mode == 'dynamic':
        # Per-row dynamic scale: each row uses its own full int8 range,
        # so no calibration and no distribution-shift failure mode.
        amax = jnp.max(jnp.abs(act), axis=1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        qx = jnp.clip(jnp.round(act * (127.0 / jnp.maximum(amax, 1e-8))),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qx, w_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s * oscale_i[None, :])
                + b_i[None, :])
    # 'none' — weight-only: int8 values are exact in bf16 (8-bit
    # mantissa), so the per-column scale moves to the f32 output
    # unchanged.
    acc = jax.lax.dot_general(
        act.astype(jnp.bfloat16), w_tile.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc.astype(jnp.float32) * oscale_i[None, :] + b_i[None, :]


def _kernel_int8(x_ref, w0_ref, b0_ref, inv_in_ref, oscale_ref, bstack_ref,
                 waux_ref, baux_ref, wfin_ref, bfin_ref, wstack_hbm, out_ref,
                 wbuf, sems, *, n_mm, act_mode):
    """Same streaming structure as _kernel, with the H x H weights streamed
    as int8 (see _int8_mm for the act_mode flavors)."""

    def start_load(idx, slot):
        pltpu.make_async_copy(wstack_hbm.at[idx], wbuf.at[slot], sems.at[slot]).start()

    def wait(idx, slot):
        pltpu.make_async_copy(wstack_hbm.at[idx], wbuf.at[slot], sems.at[slot]).wait()

    start_load(0, 0)
    if n_mm > 1:
        start_load(1, 1)

    def mm_int8(act, slot, idx):
        return _int8_mm(act, wbuf[slot], inv_in_ref[idx], oscale_ref[idx],
                        bstack_ref[idx], act_mode)

    # Input projection: bf16 weights resident in VMEM, f32 accumulation.
    x = x_ref[:]
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b0_ref[:][None, :], 0.0)

    n_stage = (n_mm - 2) // 2
    idx = 0
    for _ in range(n_stage):
        wait(idx, idx % 2)
        h = jnp.maximum(mm_int8(y, idx % 2, idx), 0.0)
        if idx + 2 < n_mm:
            start_load(idx + 2, idx % 2)
        idx += 1
        wait(idx, idx % 2)
        h = jnp.maximum(mm_int8(h, idx % 2, idx), 0.0)
        if idx + 2 < n_mm:
            start_load(idx + 2, idx % 2)
        y = y + h
        idx += 1

    # Split head: w2 (int8, no activation) -> aux (bf16) and w3f (int8) +
    # relu -> fin (bf16).
    wait(idx, idx % 2)
    y2 = mm_int8(y, idx % 2, idx)
    if idx + 2 < n_mm:
        start_load(idx + 2, idx % 2)
    idx += 1
    aux = jax.lax.dot_general(
        y2.astype(jnp.bfloat16), waux_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + baux_ref[:][None, :]
    wait(idx, idx % 2)
    y3 = jnp.maximum(mm_int8(y2, idx % 2, idx), 0.0)
    fin = jax.lax.dot_general(
        y3.astype(jnp.bfloat16), wfin_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bfin_ref[:][None, :]

    out_ref[:] = jnp.concatenate([fin, aux], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('tile', 'act_mode', 'interpret'))
def _fused_call_int8(packed, x, tile, act_mode='static', interpret=False):
    (w0, b0, wq, inv_in, oscale, bstack, waux, baux, wfin, bfin) = packed
    batch, in_dim = x.shape
    hidden = w0.shape[1]
    n_mm = wq.shape[0]
    out_dim = wfin.shape[1] + 1
    n_tiles = batch // tile

    kernel = functools.partial(_kernel_int8, n_mm=n_mm, act_mode=act_mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, in_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # inv_in
            pl.BlockSpec(memory_space=pltpu.VMEM),   # oscale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bstack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # waux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # baux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wfin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bfin
            pl.BlockSpec(memory_space=pl.ANY),       # int8 wstack stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, hidden, hidden), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * hidden * (in_dim + n_mm * hidden + out_dim),
            bytes_accessed=n_mm * hidden * hidden      # int8: 1 byte/weight
                           + batch * (in_dim + out_dim) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w0, b0, inv_in, oscale, bstack, waux, baux, wfin, bfin, wq)


def _kernel_int8_resident(x_ref, w0_ref, b0_ref, inv_in_ref, oscale_ref,
                          bstack_ref, waux_ref, baux_ref, wfin_ref, bfin_ref,
                          wstack_ref, out_ref, *, n_mm, act_mode):
    """Resident-weight variant: the WHOLE int8 H x H stack lives in VMEM
    (n_mm * H^2 bytes — 8 MB at hidden 1024, vs 16 MB bf16 which does NOT
    fit, the reason the bf16 kernel had to stream). Mosaic fetches
    constant-index blocks once, so weight HBM traffic drops from
    n_tiles * stack to one stack per call; the math is _int8_mm, identical
    to the streaming kernel by construction."""
    def mm_int8(act, idx):
        return _int8_mm(act, wstack_ref[idx], inv_in_ref[idx],
                        oscale_ref[idx], bstack_ref[idx], act_mode)

    x = x_ref[:]
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b0_ref[:][None, :], 0.0)

    n_stage = (n_mm - 2) // 2
    idx = 0
    for _ in range(n_stage):
        h = jnp.maximum(mm_int8(y, idx), 0.0)
        h = jnp.maximum(mm_int8(h, idx + 1), 0.0)
        y = y + h
        idx += 2

    y2 = mm_int8(y, idx)
    aux = jax.lax.dot_general(
        y2.astype(jnp.bfloat16), waux_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + baux_ref[:][None, :]
    y3 = jnp.maximum(mm_int8(y2, idx + 1), 0.0)
    fin = jax.lax.dot_general(
        y3.astype(jnp.bfloat16), wfin_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bfin_ref[:][None, :]

    out_ref[:] = jnp.concatenate([fin, aux], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('tile', 'act_mode', 'interpret'))
def _fused_call_int8_resident(packed, x, tile, act_mode='dynamic',
                              interpret=False):
    (w0, b0, wq, inv_in, oscale, bstack, waux, baux, wfin, bfin) = packed
    batch, in_dim = x.shape
    hidden = w0.shape[1]
    n_mm = wq.shape[0]
    out_dim = wfin.shape[1] + 1
    n_tiles = batch // tile

    kernel = functools.partial(_kernel_int8_resident, n_mm=n_mm,
                               act_mode=act_mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, in_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # inv_in
            pl.BlockSpec(memory_space=pltpu.VMEM),   # oscale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bstack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # waux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # baux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wfin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bfin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole int8 stack resident
        ],
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * hidden * (in_dim + n_mm * hidden + out_dim),
            bytes_accessed=n_mm * hidden * hidden      # loaded ONCE per call
                           + batch * (in_dim + out_dim) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w0, b0, inv_in, oscale, bstack, waux, baux, wfin, bfin, wq)


def fused_loco_forward_dyn8_resident(packed, x, tile=512, interpret=False):
    """Dynamic-int8 fused forward with the int8 weight stack VMEM-RESIDENT
    instead of double-buffer-streamed. Numerically identical to the streaming
    flavor (same _int8_mm math; tests/test_fused_mlp.py::
    test_dyn8_resident_matches_streaming). Measured +6.9% over streaming
    inside the full serving program at hidden 1024 (round 5,
    tools/bench_int8_roofline.py: 11.29M vs 10.57M same-session) — the
    n_tiles x 8 MB weight re-streaming the double-buffered kernel pays per
    call drops to one stack load. The SERVED flavor whenever the stack fits
    the VMEM budget; use fused_loco_forward_dyn8_auto for the routing."""
    return _fused_int8_family(packed, x, tile, act_mode='dynamic',
                              interpret=interpret, resident=True)


# Resident-flavor budget: the int8 H x H stack must share VMEM with the tile
# activations and head weights. 16 MB leaves >= 3/4 of the raised 96 MB scoped
# limit free at tile 512 and covers hidden <= ~1408 (8 MB at the flagship
# hidden 1024, n_mm 8). Beyond it, fall back to streaming — which the
# double-buffered kernel handles at any size. Only hidden 1024 is measured;
# the cap is deliberately conservative rather than tuned at sizes nobody
# trains.
_RESIDENT_MAX_STACK_BYTES = 16 * 1024 * 1024


def dyn8_resident_eligible(packed):
    """Whether the packed int8 weight stack fits the resident-flavor VMEM
    budget (int8: one byte per element)."""
    return packed[2].size <= _RESIDENT_MAX_STACK_BYTES


def fused_loco_forward_dyn8_auto(packed, x, tile=512, interpret=False):
    """THE served dyn8 entry point: VMEM-resident flavor when the int8 stack
    fits the budget (measured faster — see fused_loco_forward_dyn8_resident),
    double-buffer streaming otherwise. Both flavors share _int8_mm, so the
    choice never changes numerics."""
    return _fused_int8_family(packed, x, tile, act_mode='dynamic',
                              interpret=interpret,
                              resident=dyn8_resident_eligible(packed))


def fused_loco_forward_int8(packed, x, tile=512, interpret=False):
    """Full-int8 (a8w8, static calibrated scales) fused forward on (m, in)
    inputs; packed from pack_folded_weights_int8. Pads to a tile multiple;
    returns (m, out) f32. Measured ablation only — NOT parity-grade (see
    module note above)."""
    return _fused_int8_family(packed, x, tile, act_mode='static',
                              interpret=interpret)


def fused_loco_forward_dyn8(packed, x, tile=512, interpret=False):
    """Dynamic-int8 (a8w8, per-row scales computed in-kernel) fused forward;
    packed from pack_folded_weights_w8 (no calibration). Keeps the int8 MXU
    win without the static-calibration failure mode. Pads to a tile multiple;
    returns (m, out) f32."""
    return _fused_int8_family(packed, x, tile, act_mode='dynamic',
                              interpret=interpret)


def fused_loco_forward_w8(packed, x, tile=512, interpret=False):
    """Weight-only int8 (w8a16) fused forward; packed from
    pack_folded_weights_w8. Pads to a tile multiple; returns (m, out) f32."""
    return _fused_int8_family(packed, x, tile, act_mode='none',
                              interpret=interpret)


def _fused_int8_family(packed, x, tile, act_mode, interpret, resident=False):
    hidden = packed[0].shape[1]
    if hidden % 128 != 0:
        raise ValueError(f"fused kernel requires hidden % 128 == 0, got {hidden}")
    m = x.shape[0]
    tile = min(tile, max(8, 1 << (m - 1).bit_length()))
    padded = -(-m // tile) * tile
    if padded != m:
        x = jnp.concatenate([x, jnp.zeros((padded - m, x.shape[1]), x.dtype)])
    call = _fused_call_int8_resident if resident else _fused_call_int8
    out = call(packed, x, tile, act_mode=act_mode, interpret=interpret)
    return out[:m]
