from .fused_mlp import fused_loco_forward, pack_folded_weights
