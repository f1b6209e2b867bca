from .fused_mlp import fused_loco_forward, pack_folded_weights
from .quant import quantize_folded, quantized_forward
