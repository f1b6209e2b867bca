"""Export a monoloco_tpu checkpoint as a reference-loadable torch state_dict.

Completes the two-way migration story (docs/MIGRATION.md): reference .pkl
checkpoints already load here transparently; this tool goes the other way so a
model trained on TPU can be dropped into the reference PyTorch stack
(reference network/net.py:74-81 loads it with load_state_dict).

Usage:
    python tools/export_torch.py <in: tpu ckpt (.pkl/.orbax)> <out: torch .pkl>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    from monoloco_tpu.models.checkpoint import (
        load_checkpoint, export_torch_state_dict)
    params, bn_state, meta = load_checkpoint(src)
    arch = 'monoloco' if meta.get('net') == 'monoloco' else 'loco'
    sd = export_torch_state_dict(params, bn_state, arch=arch)
    import collections
    import torch
    tensors = collections.OrderedDict(
        (k, torch.tensor(v)) for k, v in sd.items())
    torch.save(tensors, dst)
    print(f"exported {len(tensors)} tensors ({arch}) -> {dst}")


if __name__ == '__main__':
    main()
