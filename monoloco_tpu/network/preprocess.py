"""Input preprocessing: keypoints -> normalized model inputs; calibration; pifpaf IO.

Behavioral parity targets in the reference:
/root/reference/monoloco/network/process.py:25-44 (stereo pairing), :47-67
(monocular normalization), :70-98 (calibration), :155-218 (pifpaf adaptation).

TPU-first notes:
 - `preprocess_monoloco` is one einsum-shaped op: K^-1 back-projection of all
   keypoints at z=10, flattened to (m, 34).
 - `preprocess_monstereo` replaces the reference's nested Python loops +
   torch.cat-in-a-loop (quadratic allocation) with a single broadcast producing
   the (m*r, 68) all-vs-all pairing in one XLA op.
 - pifpaf JSON adaptation is host-side data wrangling and stays in numpy.
"""

import json
import os
import logging

import numpy as np
import yaml
import jax.numpy as jnp

from ..geometry import pixel_to_camera, get_keypoints

logger = logging.getLogger(__name__)

# nuScenes-style sensor size (mm) for the 'custom' calibration preset
# (reference process.py:21-22).
SENSOR_SX = 7.2
SENSOR_SY = 5.4


def preprocess_monoloco(keypoints, kk, zero_center=False):
    """Keypoints (m, 3, 17) -> model inputs (m, 34).

    Back-projects pixel keypoints through K^-1 at z=10 and flattens the xy
    channels; `zero_center` subtracts the back-projected box center (used only
    by the legacy monoloco net).
    """
    kps = jnp.asarray(keypoints, dtype=jnp.float32)
    if kps.ndim == 2:
        kps = kps[None]
    xy1_all = pixel_to_camera(kps[:, 0:2, :], kk, 10)  # (m, 17, 3)
    if zero_center:
        uv_center = get_keypoints(kps, mode='center')
        xy1_center = pixel_to_camera(uv_center, kk, 10)  # (m, 3)
        xy1_all = xy1_all - xy1_center[:, None, :]
    return xy1_all[:, :, 0:2].reshape(xy1_all.shape[0], -1)


def preprocess_monstereo(keypoints, keypoints_r, kk):
    """All-vs-all stereo pairing: (m, 3, 17) x (r, 3, 17) -> ((m*r, 68), clusters).

    Row i*r+j is [inp_l_i, inp_l_i - inp_r_j]; `clusters` lists r per left pose
    (matching the reference's per-left counts, process.py:25-44).
    """
    inp_l = preprocess_monoloco(keypoints, kk)          # (m, 34)
    inp_r = preprocess_monoloco(keypoints_r, kk)        # (r, 34)
    m, r = inp_l.shape[0], inp_r.shape[0]
    left = jnp.broadcast_to(inp_l[:, None, :], (m, r, 34))
    diff = inp_l[:, None, :] - inp_r[None, :, :]
    inputs = jnp.concatenate([left, diff], axis=-1).reshape(m * r, 68)
    return inputs, [r] * m


def load_calibration(calibration, im_size, focal_length=5.7):
    """Build a 3x3 intrinsics matrix (reference process.py:70-86).

    'custom' derives K from focal length (mm) and the nuScenes sensor size;
    named presets come from intrinsics.yaml rescaled to the image size.
    """
    if calibration == 'custom':
        kk = [
            [im_size[0] * focal_length / SENSOR_SX, 0., im_size[0] / 2],
            [0., im_size[1] * focal_length / SENSOR_SY, im_size[1] / 2],
            [0., 0., 1.],
        ]
    else:
        path = os.path.join(os.path.dirname(os.path.realpath(__file__)), 'intrinsics.yaml')
        with open(path) as f:
            configs = yaml.safe_load(f)
        kk = configs[calibration]['intrinsics']
        orig_size = configs[calibration]['im_size']
        scale = [size / orig for size, orig in zip(im_size, orig_size)]
        kk[0] = [el * scale[0] for el in kk[0]]
        kk[1] = [el * scale[1] for el in kk[1]]
    logger.info("Using %s calibration matrix", calibration)
    return kk


def factory_for_gt(path_gt, name=None):
    """Load ground-truth dict + calibration for one image from a names-json
    (reference process.py:89-98)."""
    assert os.path.exists(path_gt), "Ground-truth file not found"
    with open(path_gt, 'r') as f:
        dic_names = json.load(f)
    dic_gt = dic_names[name]
    return dic_gt, dic_gt['K']


def prepare_pif_kps(kps_in):
    """Flat list of 51 (x, y, c triplets) -> [xs(17), ys(17), confs(17)]."""
    assert len(kps_in) % 3 == 0, "keypoints expected as a multiple of 3"
    return [kps_in[0::3], kps_in[1::3], kps_in[2::3]]


def preprocess_pifpaf(annotations, im_size=None, enlarge_boxes=True, min_conf=0.):
    """Adapt pifpaf annotation dicts: enlarge the bbox, clamp to the image,
    filter by confidence (reference process.py:155-207).

    Returns (boxes [x1, y1, x2, y2, conf], keypoints [3][17]) lists.
    """
    boxes, keypoints = [], []
    enlarge = 1 if enlarge_boxes else 2  # halve the margin for social distancing

    for dic in annotations:
        kps = prepare_pif_kps(dic['keypoints'])
        box = list(dic['bbox'])
        try:
            conf = dic['score']
            delta_h = box[3] / (10 * enlarge)
            delta_w = box[2] / (5 * enlarge)
            box[2] += box[0]
            box[3] += box[1]
        except KeyError:
            all_confs = np.array(kps[2])
            conf = float(np.mean(all_confs))
            delta_h = (box[3] - box[1]) / (7 * enlarge)
            delta_w = (box[2] - box[0]) / (3.5 * enlarge)
            assert delta_h > -5 and delta_w > -5, "Bounding box <=0"

        box[0] -= delta_w
        box[1] -= delta_h
        box[2] += delta_w
        box[3] += delta_h

        if im_size is not None:
            box[0] = max(0, box[0])
            box[1] = max(0, box[1])
            box[2] = min(box[2], im_size[0])
            box[3] = min(box[3], im_size[1])

        if conf >= min_conf:
            box.append(conf)
            boxes.append(box)
            keypoints.append(kps)

    return boxes, keypoints


def preprocess_mask(dir_ann, basename, mode='left'):
    """Load Mask-R-CNN-style keypoint annotations from the sibling 'mask'
    directory (reference process.py:136-152). Returns (boxes, keypoints)."""
    from ..geometry import open_annotations
    dir_mask = os.path.join(os.path.split(dir_ann)[0], 'mask')
    if mode == 'left':
        path_ann = os.path.join(dir_mask, basename + '.json')
    else:
        assert mode == 'right'
        path_ann = os.path.join(dir_mask + '_right', basename + '.json')
    dic = open_annotations(path_ann)
    if isinstance(dic, list):
        return [], []
    keypoints = [prepare_pif_kps(np.asarray(kps).reshape(51).tolist())
                 for kps in dic['keypoints']]
    return dic['boxes'], keypoints


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def image_transform(image):
    """PIL image -> CHW float array with ImageNet normalization
    (torchvision-free equivalent of reference process.py:221-228)."""
    arr = np.asarray(image, dtype=np.float32) / 255.0
    arr = (arr - _IMAGENET_MEAN) / _IMAGENET_STD
    return np.transpose(arr, (2, 0, 1))
