"""Generate a synthetic mini-KITTI dataset for end-to-end pipeline tests.

Creates, under a root directory, the exact layout the KITTI pipelines expect:
  data/kitti/gt/<id>.txt         ground-truth (Pedestrian rows)
  data/kitti/calib/<id>.txt      P0..P3 projection matrices (stereo rig)
  data/kitti/images/<id>.png     tiny gray images (1242 x 375)
  annotations/<id>.png.predictions.json        left pifpaf predictions
  annotations_right/<id>.png.predictions.json  right pifpaf predictions
  splits/kitti_train.txt, splits/kitti_val.txt

Pedestrians are placed at known (x, z); COCO-17 keypoints are produced by
projecting a canonical skeleton through K, and right-camera keypoints are the
left ones shifted by the stereo disparity B*f/z — so prep's IoU matching,
stereo matching and flip augmentation all operate on geometrically coherent
data and a trained model has real signal to fit.
"""

import json
import math
import os

import numpy as np
from PIL import Image

FX = FY = 721.5377
CX, CY = 609.5593, 172.854
BASELINE = 0.54
IM_W, IM_H = 1242, 375

# Canonical skeleton: per-joint (dy from top of head [m], dx from center [m])
# in a 1.77m-tall person's body frame. COCO order.
_SKELETON = [
    (0.07, 0.00),   # nose
    (0.05, -0.03), (0.05, 0.03),     # eyes
    (0.08, -0.07), (0.08, 0.07),     # ears
    (0.25, -0.18), (0.25, 0.18),     # shoulders
    (0.50, -0.22), (0.50, 0.22),     # elbows
    (0.72, -0.24), (0.72, 0.24),     # wrists
    (0.80, -0.10), (0.80, 0.10),     # hips
    (1.20, -0.11), (1.20, 0.11),     # knees
    (1.65, -0.12), (1.65, 0.12),     # ankles
]
PERSON_H = 1.77


def _project(x, y, z):
    return FX * x / z + CX, FY * y / z + CY


def make_person(x, z, rng, cam_shift=0.0):
    """COCO keypoints + box for a person whose head top is at y=-0.8 (camera
    1m above ground-ish). Returns (kps_flat_51, bbox_xywh, gt_fields)."""
    y_top = -0.65
    xs, ys = [], []
    for dy, dx in _SKELETON:
        u, v = _project(x - cam_shift + dx, y_top + dy, z)
        xs.append(u + rng.randn() * 0.3)
        ys.append(v + rng.randn() * 0.3)
    confs = [0.85 + 0.1 * rng.rand() for _ in range(17)]
    flat = []
    for u, v, c in zip(xs, ys, confs):
        flat += [round(u, 2), round(v, 2), round(c, 3)]
    x1, y1 = min(xs) - 3, min(ys) - 5
    x2, y2 = max(xs) + 3, max(ys) + 5
    bbox = [x1, y1, x2 - x1, y2 - y1]
    # gt box slightly tighter
    gt_box = [min(xs) - 1, min(ys) - 3, max(xs) + 1, max(ys) + 3]
    y_center = y_top + PERSON_H / 2
    return flat, bbox, dict(box=gt_box, xyz=(x, y_center + 0.85, z))


def write_scene(root, idx, people, rng):
    """people: list of (x, z, ry)."""
    name = str(idx).zfill(6)
    gt_dir = os.path.join(root, 'data', 'kitti', 'gt')
    calib_dir = os.path.join(root, 'data', 'kitti', 'calib')
    im_dir = os.path.join(root, 'data', 'kitti', 'images')
    ann_dir = os.path.join(root, 'annotations')
    ann_dir_r = os.path.join(root, 'annotations_right')
    for d in (gt_dir, calib_dir, im_dir, ann_dir, ann_dir_r):
        os.makedirs(d, exist_ok=True)

    gt_lines, anns_l, anns_r = [], [], []
    for (x, z, ry) in people:
        flat_l, bbox_l, gt = make_person(x, z, rng, cam_shift=0.0)
        flat_r, bbox_r, _ = make_person(x, z, rng, cam_shift=BASELINE)
        gx, gy, gz = gt['xyz']
        alpha = ry - math.atan2(gx, gz)
        if alpha > math.pi:
            alpha -= 2 * math.pi
        elif alpha < -math.pi:
            alpha += 2 * math.pi
        b = gt['box']
        gt_lines.append(
            f"Pedestrian 0.00 0 {alpha:.2f} "
            f"{b[0]:.2f} {b[1]:.2f} {b[2]:.2f} {b[3]:.2f} "
            f"1.77 0.65 0.80 {gx:.2f} {gy:.2f} {gz:.2f} {ry:.2f}\n")
        anns_l.append({'keypoints': flat_l, 'bbox': [round(v, 2) for v in bbox_l],
                       'score': round(0.7 + 0.25 * rng.rand(), 3),
                       'category_id': 1})
        anns_r.append({'keypoints': flat_r, 'bbox': [round(v, 2) for v in bbox_r],
                       'score': round(0.7 + 0.25 * rng.rand(), 3),
                       'category_id': 1})

    with open(os.path.join(gt_dir, name + '.txt'), 'w') as f:
        f.writelines(gt_lines)
    p2 = (f"P2: {FX} 0 {CX} 0 0 {FY} {CY} 0 0 0 1 0\n")
    p3 = (f"P3: {FX} 0 {CX} {-FX * BASELINE} 0 {FY} {CY} 0 0 0 1 0\n")
    with open(os.path.join(calib_dir, name + '.txt'), 'w') as f:
        f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\nP1: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        f.write(p2)
        f.write(p3)
    Image.new('RGB', (IM_W, IM_H), (90, 90, 90)).save(
        os.path.join(im_dir, name + '.png'))
    with open(os.path.join(ann_dir, name + '.png.predictions.json'), 'w') as f:
        json.dump(anns_l, f)
    with open(os.path.join(ann_dir_r, name + '.png.predictions.json'), 'w') as f:
        json.dump(anns_r, f)
    return name


def make_dataset(root, n_train=16, n_val=8, seed=0):
    rng = np.random.RandomState(seed)
    names = []
    total = n_train + n_val
    for i in range(1, total + 1):
        n_people = rng.randint(1, 4)
        people = []
        for _ in range(n_people):
            z = rng.uniform(6, 35)
            x = rng.uniform(-0.35, 0.35) * z
            ry = rng.uniform(-math.pi * 0.9, math.pi * 0.9)
            people.append((x, z, ry))
        names.append(write_scene(root, i, people, rng))

    splits_dir = os.path.join(root, 'splits')
    os.makedirs(splits_dir, exist_ok=True)
    with open(os.path.join(splits_dir, 'kitti_train.txt'), 'w') as f:
        f.write('\n'.join(names[:n_train]) + '\n')
    with open(os.path.join(splits_dir, 'kitti_val.txt'), 'w') as f:
        f.write('\n'.join(names[n_train:]) + '\n')
    os.makedirs(os.path.join(root, 'data', 'arrays'), exist_ok=True)
    os.makedirs(os.path.join(root, 'data', 'outputs'), exist_ok=True)
    os.makedirs(os.path.join(root, 'data', 'logs'), exist_ok=True)
    return names[:n_train], names[n_train:]


if __name__ == '__main__':
    import sys
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/synthetic_kitti'
    tr, va = make_dataset(root)
    print(f"wrote {len(tr)} train + {len(va)} val scenes under {root}")
