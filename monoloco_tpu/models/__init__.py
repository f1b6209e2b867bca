from .loco import (
    init_loco_params,
    init_monoloco_params,
    loco_forward,
    monoloco_forward,
    fold_eval_params,
    folded_forward,
    count_params,
)
from .checkpoint import save_checkpoint, load_checkpoint
