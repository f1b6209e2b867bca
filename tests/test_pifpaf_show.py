"""Direct tests for the skeleton painter and drawing canvases."""

import json
import os

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import pytest

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


def test_gaussian_blur_matches_scipy():
    """The scipy-free separable blur must match the reference's
    ndimage.gaussian_filter(image, sigma=(2.5, 2.5, 0)) (reference
    visuals/pifpaf_show.py:59) to float tolerance."""
    scipy_ndimage = pytest.importorskip('scipy.ndimage')
    from monoloco_tpu.visuals.pifpaf_show import _gaussian_blur
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    ours = _gaussian_blur(image, sigma=2.5)
    ref = scipy_ndimage.gaussian_filter(
        image.astype(np.float32), sigma=(2.5, 2.5, 0))
    assert np.max(np.abs(ours - ref)) < 1e-2


def test_blur_reduces_high_frequency_energy():
    """The social-distance canvas background must genuinely blur: the
    high-frequency (pixel-difference) energy of a noisy background drops by
    an order of magnitude, and is NOT a 50/50 mean-mix (which keeps half the
    original high-frequency energy by construction)."""
    from monoloco_tpu.visuals.pifpaf_show import _gaussian_blur
    rng = np.random.RandomState(1)
    image = rng.randint(0, 256, size=(64, 64, 3)).astype(np.float32)

    def hf_energy(arr):
        return float(np.mean(np.abs(np.diff(arr, axis=0)))
                     + np.mean(np.abs(np.diff(arr, axis=1))))

    blurred = _gaussian_blur(image, sigma=2.5)
    assert hf_energy(blurred) < 0.1 * hf_energy(image)
