"""Webcam loop, driven headlessly with stubbed cv2 + openpifpaf: two frames
stream through capture -> pose stub -> engine -> Printer, saving multi
figures (the no-interactive-backend fallback)."""

import argparse
import os
import sys
import types

import numpy as np
import pytest


class _FakeCapture:
    def __init__(self, *_):
        self.frames_left = 2

    def isOpened(self):
        return True

    def read(self):
        if self.frames_left == 0:
            return False, None
        self.frames_left -= 1
        rng = np.random.RandomState(self.frames_left)
        return True, rng.randint(0, 255, (480, 640, 3), np.uint8)


def _cv2_stub():
    cv2 = types.ModuleType('cv2')
    cv2.VideoCapture = _FakeCapture
    cv2.COLOR_BGR2RGB = 4

    def resize(img, _none, fx=1.0, fy=1.0):
        h = max(1, int(round(img.shape[0] * fy)))
        w = max(1, int(round(img.shape[1] * fx)))
        ys = (np.arange(h) / fy).astype(int).clip(0, img.shape[0] - 1)
        xs = (np.arange(w) / fx).astype(int).clip(0, img.shape[1] - 1)
        return img[ys][:, xs]

    cv2.resize = resize
    cv2.cvtColor = lambda img, code: img[..., ::-1]
    return cv2


class _FakeAnnotation:
    def __init__(self, data):
        self._data = data

    def json_data(self):
        return self._data


def _pifpaf_stub():
    openpifpaf = types.ModuleType('openpifpaf')

    class Predictor:
        def __init__(self, checkpoint=None):
            pass

        def numpy_images(self, images):
            h, w = images[0].shape[:2]
            rng = np.random.RandomState(0)
            kps = []
            for j in range(17):
                kps += [float(w * 0.5 + rng.uniform(-w * 0.1, w * 0.1)),
                        float(h * (0.2 + 0.6 * j / 16)), 0.9]
            ann = {'keypoints': kps,
                   'bbox': [w * 0.35, h * 0.15, w * 0.3, h * 0.7],
                   'score': 0.9}
            yield [_FakeAnnotation(ann)], None, None

    openpifpaf.Predictor = Predictor
    return openpifpaf


def test_webcam_loop_headless(tmp_path, monkeypatch):
    import jax
    from monoloco_tpu.models import init_loco_params
    from monoloco_tpu.models.checkpoint import save_checkpoint
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    model = str(tmp_path / 'w.pkl')
    save_checkpoint(model, params, bn, meta={'net': 'monoloco_pp'})

    saved = {k: sys.modules.get(k) for k in ('cv2', 'openpifpaf')}
    sys.modules['cv2'] = _cv2_stub()
    sys.modules['openpifpaf'] = _pifpaf_stub()
    monkeypatch.chdir(tmp_path)
    try:
        from monoloco_tpu.visuals.webcam import webcam
        args = argparse.Namespace(
            mode='mono', model=model, net=None, n_dropout=0, dropout=0.2,
            camera=0, output_types=[], z_max=100, long_edge=None,
            calibration='custom', focal_length=5.7, checkpoint=None,
            activities=['raise_hand'], hide_distance=False, no_save=False,
            show_all=True)
        webcam(args)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    made = os.listdir(tmp_path)
    # headless fallback saves each frame's multi figure
    assert any(f.startswith('out_webcam_0') and f.endswith('.png') for f in made), made
    assert any(f.startswith('out_webcam_1') for f in made), made


def test_webcam_real_cv2_video_file(tmp_path, monkeypatch):
    """Real cv2 end-to-end: encode a synthetic 3-frame video, replay it through
    the webcam loop via --camera <path> (cv2.VideoCapture file playback), with
    only the pose backbone stubbed (openpifpaf is not installable offline).
    Exercises the actual decode -> resize -> BGR2RGB -> engine -> Printer path."""
    cv2 = pytest.importorskip('cv2')

    video = str(tmp_path / 'clip.avi')
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 5.0, (320, 240))
    assert writer.isOpened()
    for i in range(3):
        frame = np.full((240, 320, 3), 40 * (i + 1), np.uint8)
        cv2.rectangle(frame, (120, 40), (200, 220), (0, 0, 255), -1)
        writer.write(frame)
    writer.release()

    import jax
    from monoloco_tpu.models import init_loco_params
    from monoloco_tpu.models.checkpoint import save_checkpoint
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    model = str(tmp_path / 'w.pkl')
    save_checkpoint(model, params, bn, meta={'net': 'monoloco_pp'})

    saved = sys.modules.get('openpifpaf')
    sys.modules['openpifpaf'] = _pifpaf_stub()
    monkeypatch.chdir(tmp_path)
    try:
        from monoloco_tpu.run import _camera_source
        from monoloco_tpu.visuals.webcam import webcam
        assert _camera_source('0') == 0
        assert _camera_source(video) == video
        args = argparse.Namespace(
            mode='mono', model=model, net=None, n_dropout=0, dropout=0.2,
            camera=_camera_source(video), output_types=[], z_max=100,
            long_edge=None, calibration='custom', focal_length=5.7,
            checkpoint=None, activities=[], hide_distance=False,
            no_save=False, show_all=True)
        webcam(args)
    finally:
        if saved is None:
            sys.modules.pop('openpifpaf', None)
        else:
            sys.modules['openpifpaf'] = saved
    made = os.listdir(tmp_path)
    for i in range(3):
        assert any(f.startswith(f'out_webcam_{i}') and f.endswith('.png')
                   for f in made), (i, made)
