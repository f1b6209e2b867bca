"""Live webcam 3D localization.

Capability parity target: /root/reference/monoloco/visuals/webcam.py:30-198 —
cv2 capture -> pose backbone -> localization net -> live matplotlib rendering.
The pose backbone (OpenPifPaf) and cv2 are optional dependencies, gated at call
time; the localization path is the engine's bucketed jitted program, so the
steady-state per-frame device cost is a single dispatch.
"""

import logging
import time

from ..network import Loco, load_calibration, preprocess_pifpaf
from .printer import Printer

LOG = logging.getLogger(__name__)


def webcam(args):
    try:
        import cv2
    except ImportError as e:
        raise ImportError("webcam mode requires opencv-python (cv2)") from e
    try:
        import openpifpaf
    except ImportError as e:
        raise ImportError("webcam mode requires openpifpaf for pose estimation") from e
    import matplotlib
    # The package defaults to the Agg backend for file rendering; live view
    # needs an interactive one. Fall back to saving frames when headless.
    interactive = True
    try:
        matplotlib.use('TkAgg', force=True)
    except Exception:
        try:
            matplotlib.use('QtAgg', force=True)
        except Exception:
            interactive = False
    import matplotlib.pyplot as plt
    from PIL import Image

    assert args.mode == 'mono', "webcam streaming supports mono mode only"
    if not args.output_types:
        args.output_types = ['multi']
    args.z_max = min(args.z_max, 10)
    long_edge = args.long_edge or 144
    if not interactive:
        LOG.warning('No interactive matplotlib backend: saving frames as '
                    'out_webcam_<n>.png instead of displaying')

    net = Loco(model=args.model, mode=args.mode, net=args.net,
               n_dropout=args.n_dropout, p_dropout=args.dropout)
    predictor = openpifpaf.Predictor(checkpoint=args.checkpoint)

    cam = cv2.VideoCapture(args.camera)
    if not cam.isOpened():
        raise ValueError(f"cannot open camera source {args.camera!r} "
                         "(device index or video file path)")
    visualizer = None
    print("Webcam started: press q in the terminal to stop")
    while True:
        start = time.time()
        ret, frame = cam.read()
        if not ret:
            break
        scale = long_edge / max(frame.shape[0], frame.shape[1])
        image = cv2.resize(frame, None, fx=scale, fy=scale)
        height, width, _ = image.shape
        image_cv = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        pil_image = Image.fromarray(image_cv)

        preds, _, _ = next(iter(predictor.numpy_images([image_cv])))
        annotations = [ann.json_data() for ann in preds]

        kk = load_calibration(args.calibration, (width, height),
                              focal_length=args.focal_length)
        boxes, keypoints = preprocess_pifpaf(annotations, (width, height))
        dic_out = net.forward(keypoints, kk)
        dic_out = net.post_process(dic_out, boxes, keypoints, kk)
        if 'social_distance' in (args.activities or []):
            dic_out = net.social_distance(dic_out, args)
        if 'raise_hand' in (args.activities or []):
            dic_out = net.raising_hand(dic_out, keypoints)

        if visualizer is None:
            if interactive:
                plt.ion()
            frame_idx = 0
        visualizer = Printer(pil_image, output_path=f'out_webcam_{frame_idx}',
                             kk=kk, args=args)
        visualizer.save = not interactive
        visualizer.close_on_draw = not interactive  # keep figures for plt.pause
        figures, axes = visualizer.factory_axes(dic_out)
        visualizer.draw(figures, axes, pil_image, dic_out, annotations=annotations)
        if interactive:
            plt.pause(0.001)
            for fig in figures:
                plt.close(fig)
        frame_idx += 1
        print(f'run-time: {(time.time() - start) * 1000:.0f} ms', end='\r')
