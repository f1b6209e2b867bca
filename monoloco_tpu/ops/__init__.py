from .fused_mlp import (
    fused_loco_forward,
    pack_folded_weights,
    fused_loco_forward_int8,
    pack_folded_weights_int8,
    fused_loco_forward_w8,
    fused_loco_forward_dyn8,
    fused_loco_forward_dyn8_resident,
    fused_loco_forward_dyn8_auto,
    dyn8_resident_eligible,
    pack_folded_weights_w8,
)
from .quant import quantize_folded, quantized_forward
