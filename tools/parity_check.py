"""Numerical parity check against the reference PyTorch implementation.

1. Builds the reference LocoModel (torch), saves its random-init state_dict.
2. Loads it through monoloco_tpu's torch-checkpoint converter.
3. Compares eval-mode forward outputs element-wise (the serving path).
4. Compares train-mode forward + composite multi-task loss on one batch with
   dropout disabled (validates BatchNorm semantics and every loss formula).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/parity_check.py
"""

import os
import sys
import types

sys.modules.setdefault('torchvision', types.ModuleType('torchvision'))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, '/root/reference')

import numpy as np
import torch

import jax
import jax.numpy as jnp


def main():
    from monoloco.network.architectures import LocoModel as RefLocoModel
    from monoloco.network.process import extract_outputs as ref_extract_outputs, \
        extract_labels as ref_extract_labels
    from monoloco.train.losses import CompositeLoss as RefCompositeLoss, \
        MultiTaskLoss as RefMultiTaskLoss

    from monoloco_tpu.models.checkpoint import convert_torch_state_dict
    from monoloco_tpu.models import loco_forward, fold_eval_params, folded_forward
    from monoloco_tpu.train.losses import multitask_loss, LOSS_TASKS_STEREO

    torch.manual_seed(7)
    in_dim, out_dim, hidden, n_stage = 68, 10, 256, 3
    ref_model = RefLocoModel(input_size=in_dim, output_size=out_dim,
                             linear_size=hidden, p_dropout=0.0,
                             num_stage=n_stage, device='cpu')

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()
          if 'num_batches_tracked' not in k}
    params, bn_state = convert_torch_state_dict(sd, arch='loco')

    rng = np.random.RandomState(0)
    x = rng.randn(64, in_dim).astype(np.float32)
    labels = rng.randn(64, 11).astype(np.float32)
    labels[:, 3] = np.abs(labels[:, 3]) + 5
    labels[:, 10] = (rng.rand(64) > 0.5).astype(np.float32)

    # --- Eval-mode forward parity (serving path, incl. BN folding) ---
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(x)).numpy()
    my_out, _ = loco_forward(params, bn_state, jnp.asarray(x), train=False)
    my_out = np.asarray(my_out)
    folded = fold_eval_params(params, bn_state)
    my_folded = np.asarray(folded_forward(folded, jnp.asarray(x)))

    err_eval = np.abs(ref_out - my_out).max()
    err_fold = np.abs(ref_out - my_folded).max()
    rel = np.abs(ref_out - my_out).max() / (np.abs(ref_out).max() + 1e-9)
    print(f"eval forward   max abs err: {err_eval:.3e} (rel {rel:.3e})")
    print(f"folded forward max abs err: {err_fold:.3e}")

    # --- Train-mode forward + loss parity (dropout 0) ---
    ref_model.train()
    ref_out_tr = ref_model(torch.tensor(x))
    losses_tr, losses_val = RefCompositeLoss(LOSS_TASKS_STEREO)()
    ref_mtl = RefMultiTaskLoss(losses_tr, losses_val, (1,) * 8, LOSS_TASKS_STEREO)
    ref_loss, ref_vals = ref_mtl(ref_out_tr, torch.tensor(labels), phase='train')
    ref_loss_v, ref_vals_v = ref_mtl(ref_out_tr, torch.tensor(labels), phase='val')

    my_out_tr, _ = loco_forward(params, bn_state, jnp.asarray(x), train=True,
                                rng=jax.random.PRNGKey(0), p_dropout=0.0)
    err_train = np.abs(ref_out_tr.detach().numpy() - np.asarray(my_out_tr)).max()
    print(f"train forward  max abs err: {err_train:.3e}")

    my_loss, my_vals = multitask_loss(my_out_tr, jnp.asarray(labels),
                                      LOSS_TASKS_STEREO, (1.0,) * 8, phase='train')
    my_loss_v, my_vals_v = multitask_loss(my_out_tr, jnp.asarray(labels),
                                          LOSS_TASKS_STEREO, (1.0,) * 8, phase='val')
    print(f"train loss     ref {float(ref_loss):.6f}  mine {float(my_loss):.6f}  "
          f"diff {abs(float(ref_loss) - float(my_loss)):.2e}")
    for i, task in enumerate(LOSS_TASKS_STEREO):
        d_tr = abs(float(ref_vals[i]) - float(my_vals[i]))
        d_v = abs(float(ref_vals_v[i]) - float(my_vals_v[i]))
        print(f"  task {task:4s} train diff {d_tr:.2e}   val diff {d_v:.2e}")

    # --- Decoded outputs parity ---
    ref_dec = ref_extract_outputs(torch.tensor(ref_out))
    from monoloco_tpu.network.decode import extract_outputs as my_extract
    my_dec = my_extract(my_out)
    for key in ('xyzd', 'bi', 'aux'):
        d = np.abs(ref_dec[key].numpy() - np.asarray(my_dec[key])).max()
        print(f"decode {key:5s} max abs err: {d:.3e}")
    d_yaw = max(np.abs(ref_dec['yaw'][0].numpy() - np.asarray(my_dec['yaw'][0])).max(),
                np.abs(ref_dec['yaw'][1].numpy() - np.asarray(my_dec['yaw'][1])).max())
    print(f"decode yaw   max abs err: {d_yaw:.3e}")
    _ = ref_extract_labels

    # --- End-to-end engine parity on the real fixture keypoints ---
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, 'tests', 'fixture_002282.pifpaf.json')) as f:
        annotations = json.load(f)
    from monoloco_tpu.network import preprocess_pifpaf, load_calibration
    boxes, keypoints = preprocess_pifpaf(annotations, im_size=(1238, 374),
                                         enlarge_boxes=False)
    kk = load_calibration('kitti', (1238, 374))

    torch.manual_seed(3)
    ref_mono = RefLocoModel(input_size=34, output_size=9, linear_size=256,
                            p_dropout=0.0, num_stage=3, device='cpu')
    sd_m = {k: v.detach().numpy() for k, v in ref_mono.state_dict().items()
            if 'num_batches_tracked' not in k}
    params_m, bn_m = convert_torch_state_dict(sd_m, arch='loco')

    from monoloco.network.net import Loco as RefLoco
    # net left as None: mode='mono' defaults to monoloco_pp (the reference's
    # explicit-net branch reads self.net before assigning it).
    ref_engine = RefLoco(model=ref_mono, mode='mono')
    ref_dic = ref_engine.forward(keypoints, kk)
    ref_post = ref_engine.post_process(dict(ref_dic), boxes, keypoints, kk)

    from monoloco_tpu.network import Loco as MyLoco
    my_engine = MyLoco((params_m, bn_m), mode='mono')
    my_dic = my_engine.forward(keypoints, kk)
    my_post = my_engine.post_process(dict(my_dic), boxes, keypoints, kk)

    d_fixture = np.abs(np.asarray(ref_dic['d']) - np.asarray(my_dic['d'])).max()
    dds_diff = np.abs(np.asarray(ref_post['dds_pred'])
                      - np.asarray(my_post['dds_pred'])).max()
    conf_diff = np.abs(np.asarray(ref_post['confs'])
                       - np.asarray(my_post['confs'])).max()
    xyz_diff = np.abs(np.asarray(ref_post['xyz_pred'])
                      - np.asarray(my_post['xyz_pred'])).max()
    print(f"fixture engine d       max abs err: {d_fixture:.3e}")
    print(f"fixture post dds_pred  max abs err: {dds_diff:.3e}")
    print(f"fixture post confs     max abs err: {conf_diff:.3e}")
    print(f"fixture post xyz_pred  max abs err: {xyz_diff:.3e}")
    fixture_ok = (d_fixture < 1e-3 and dds_diff < 1e-3 and xyz_diff < 1e-2
                  and conf_diff < 1e-4)

    # --- Reverse export: TPU-trained params -> reference state_dict ---
    # Fresh random jax-side params (NOT torch-derived) exported and loaded
    # into the actual reference model with strict=True, then forward-compared.
    from monoloco_tpu.models import init_loco_params
    from monoloco_tpu.models.checkpoint import export_torch_state_dict
    params_x, bn_x = init_loco_params(jax.random.PRNGKey(11), in_dim, out_dim,
                                      hidden, n_stage)
    sd_x = export_torch_state_dict(params_x, bn_x, arch='loco')
    ref_import = RefLocoModel(input_size=in_dim, output_size=out_dim,
                              linear_size=hidden, p_dropout=0.0,
                              num_stage=n_stage, device='cpu')
    ref_import.load_state_dict({k: torch.tensor(v) for k, v in sd_x.items()},
                               strict=True)
    ref_import.eval()
    with torch.no_grad():
        ref_x = ref_import(torch.tensor(x)).numpy()
    my_x, _ = loco_forward(params_x, bn_x, jnp.asarray(x), train=False)
    err_export = np.abs(ref_x - np.asarray(my_x)).max()
    print(f"reverse export forward max abs err: {err_export:.3e}")

    ok = (err_eval < 1e-3 and err_train < 1e-3 and err_fold < 1e-3
          and abs(float(ref_loss) - float(my_loss)) < 1e-3 and fixture_ok
          and err_export < 1e-3)
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
