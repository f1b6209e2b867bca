"""Matmul-precision knob shared by inference AND training.

MONOLOCO_TPU_PRECISION selects the precision XLA uses for matmuls on TPU:
  default    TPU-native (bfloat16 multiplications, f32 accumulate) — fastest.
  float32 / highest   full f32 multiplications — maximum numerical parity with
             the f32 PyTorch reference (e.g. when evaluating converted
             reference checkpoints, or for bf16-sensitivity ablations like the
             RALP-5% study in BASELINE.md).
  bfloat16 / tensorfloat32   explicit lower precisions.
Aliases f32/fp32/bf16 normalize to the jax.default_matmul_precision spellings;
int8 selects the fused DYNAMIC-int8 serving kernel (ops/fused_mlp.py) and
maps to 'default' for the float programs around it (int8-a8/int8-xla are
bench-only ablations).

The env var is read once at import: the whole process (trainer + engine) runs
at one precision, so lru-cached jitted programs never mix traces.
"""

import functools
import os

_RAW = os.environ.get('MONOLOCO_TPU_PRECISION', 'default')
MATMUL_PRECISION = {'f32': 'float32', 'fp32': 'float32', 'bf16': 'bfloat16',
                    'int8': 'default', 'int8-a8': 'default',
                    'int8-xla': 'default'}.get(_RAW, _RAW)
PIN_F32 = MATMUL_PRECISION in ('float32', 'highest')
# int8 selects the fused DYNAMIC-int8 Pallas serving kernel
# (ops/fused_mlp.py pack_folded_weights_w8 + fused_loco_forward_dyn8):
# streamed weights stored int8 (half the HBM DMA bytes), activations
# quantized in-kernel with per-ROW scales, int8 MXU matmuls, no calibration —
# parity-grade on the END metric (full-volume ALE delta -0.03%/+0.03%/+0.01% mono,
# +0.16% stereo; tools/int8_eval_parity.py, PARITY.md round-4) and 1.25x
# bf16-XLA same-session. 'int8-a8' (static activation calibration — NOT
# parity-grade, ALE +69% under distribution shift) and 'int8-xla' are
# bench-only ablations. Opt-in: bf16 XLA stays the default.
INT8 = _RAW == 'int8'

# ---------------------------------------------------------------------------
# Serving WEIGHT STORAGE (round 5). Orthogonal to the matmul-precision knob:
# under TPU default precision the MXU rounds both operands to bf16 anyway, but
# the engine's folded weights were STORED f32, streaming 2x the weight bytes
# from HBM per dispatch (16 MB vs 8 MB at hidden 1024). Measured same-session
# (tools/bench_serve_storage.py, tools/serve_storage_r5.jsonl): bf16-stored
# weights are +7.3%/+7.6% at 512/2048-row dispatches (noise-level at 128,
# where tunnel dispatch overhead dominates).
#
# MONOLOCO_TPU_SERVE_STORAGE:
#   f32   keep the f32-stored fold.
#   bf16  cast the served fold (weights + biases) to bfloat16 on TPU.
#   auto (default)  bf16 whenever the matmul precision is default/bfloat16
#         on TPU — CERTIFIED by the full-volume end-metric A/B
#         (tools/serve_storage_eval_parity.py → serve_storage_parity_r5.jsonl:
#         mono ALE delta −0.01%, stereo −0.05% at 2400 scenes / 500 epochs,
#         the same gate the int8 kernel passed and the static kernel failed;
#         decode-level budgets alone don't certify a serving path). Under
#         tensorfloat32 the multiplies carry more mantissa than bf16, so a
#         storage cast WOULD change results — auto keeps f32 there.
# Never applies when PIN_F32 (float32/highest) — those spellings promise
# full-precision multiplies — and never on non-TPU backends, where matmuls
# are genuine f32 and a storage cast would change results.
_RAW_STORAGE = os.environ.get('MONOLOCO_TPU_SERVE_STORAGE', 'auto')


def serve_storage_bf16(backend):
    """Resolve the serving-weight storage policy for `backend` (the
    jax.default_backend() string, known only once the backend is live)."""
    if _RAW_STORAGE not in ('auto', 'f32', 'bf16'):
        raise ValueError(
            f"MONOLOCO_TPU_SERVE_STORAGE={_RAW_STORAGE!r}: use auto|f32|bf16")
    if _RAW_STORAGE == 'f32':
        return False
    if PIN_F32 or backend != 'tpu':
        return False
    if _RAW_STORAGE == 'bf16':
        return True
    # auto: certified bf16 under default/bfloat16 matmul precision (round 5
    # full-volume A/B, both modes); tensorfloat32 multiplies carry more
    # mantissa than bf16 storage would preserve, so keep f32 there.
    return MATMUL_PRECISION in ('default', 'bfloat16')


def with_matmul_precision(fn):
    """Wrap `fn` so its body traces under the configured matmul precision.
    Apply INSIDE jit (i.e. jit(with_matmul_precision(f))) so the context is
    active during tracing. No-op wrapper when the precision is 'default'."""
    if MATMUL_PRECISION == 'default':
        return fn
    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(MATMUL_PRECISION):
            return fn(*args, **kwargs)

    return wrapped
