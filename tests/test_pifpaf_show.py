"""Direct tests for the skeleton painter and drawing canvases."""

import json
import os

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _kp_sets(m=2, visible=17):
    rng = np.random.RandomState(0)
    kps = np.zeros((m, 17, 3))
    kps[:, :, 0] = rng.uniform(100, 400, (m, 17))
    kps[:, :, 1] = rng.uniform(100, 300, (m, 17))
    kps[:, :visible, 2] = 0.9
    return kps


def test_get_pifpaf_outputs_shapes():
    from monoloco_tpu.visuals.pifpaf_show import get_pifpaf_outputs
    with open(os.path.join(HERE, 'fixture_002282.pifpaf.json')) as f:
        anns = json.load(f)
    kps, boxes = get_pifpaf_outputs(anns)
    assert kps.shape == (len(anns), 17, 3)
    assert len(boxes) == len(anns) and len(boxes[0]) == 4
    empty_kps, empty_boxes = get_pifpaf_outputs([])
    assert empty_kps.shape == (0, 17, 3) and empty_boxes == []


def test_keypoint_painter_draws_skeletons():
    from monoloco_tpu.visuals.pifpaf_show import (KeypointPainter,
                                                  COCO_PERSON_SKELETON)
    fig, ax = plt.subplots()
    painter = KeypointPainter(show_box=True)
    painter.keypoints(ax, _kp_sets(2))
    # per person: every skeleton bone (all joints visible) + one marker line
    assert len(ax.lines) == 2 * (len(COCO_PERSON_SKELETON) + 1)
    assert len(ax.patches) == 2   # show_box rectangles
    plt.close(fig)


def test_keypoint_painter_skips_invisible_joints():
    from monoloco_tpu.visuals.pifpaf_show import (KeypointPainter,
                                                  COCO_PERSON_SKELETON)
    fig, ax = plt.subplots()
    kps = _kp_sets(1)
    kps[0, 10:, 2] = 0.0   # hide the lower body
    KeypointPainter().keypoints(ax, kps)
    drawn_bones = len(ax.lines) - 1
    full_bones = len(COCO_PERSON_SKELETON)
    visible_bones = sum(1 for a, b in COCO_PERSON_SKELETON
                        if a - 1 < 10 and b - 1 < 10)
    assert drawn_bones == visible_bones < full_bones
    plt.close(fig)


def test_raised_hand_highlight():
    from monoloco_tpu.visuals.pifpaf_show import KeypointPainter
    fig, ax = plt.subplots()
    KeypointPainter().keypoints(
        ax, _kp_sets(1), activities=['raise_hand'],
        dic_out={'raising_hand': ['both']})
    lime = [l for l in ax.lines if l.get_color() == 'lime']
    assert len(lime) == 4   # two segments per highlighted arm
    plt.close(fig)


def test_canvases_write_files(tmp_path):
    from monoloco_tpu.visuals.pifpaf_show import image_canvas, blurred_canvas
    image = np.full((60, 90, 3), 120, np.uint8)
    out1 = str(tmp_path / 'plain.png')
    with image_canvas(image, output_path=out1) as ax:
        ax.plot([0, 10], [0, 10])
    out2 = str(tmp_path / 'soft.png')
    with blurred_canvas(image, output_path=out2) as ax:
        ax.plot([0, 10], [0, 10])
    assert os.path.exists(out1) and os.path.exists(out2)
