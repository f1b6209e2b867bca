"""Prediction pipeline: images (+ 2D poses) -> 3D localization outputs.

Mirrors the reference's predict contract (/root/reference/monoloco/predict.py:
159-288): per image, obtain COCO-17 poses, build the calibration matrix,
run the localization net, post-process (optionally against ground truth),
and emit `out_<name>.monoloco.json` and/or front/bird/multi figures.

Keypoint sources, in priority order:
 1. Precomputed pifpaf JSON next to the image (`<image>.pifpaf.json` /
    `<image>.predictions.json`) or in `--json_dir` — first-class here, since
    the pose backbone is an external CNN.
 2. OpenPifPaf, if installed (optional dependency, CPU/GPU torch) — the
    reference's default path (predict.py:174-198).

Checkpoint resolution (reference predict.py:55-96 downloads from Google
Drive): a local `--model` path is required in this zero-egress build; the
Google-Drive auto-download is attempted only if `gdown` is available.
"""

import glob
import json
import logging
import os
import time
from collections import defaultdict

import numpy as np
from PIL import Image

from .network import Loco, factory_for_gt, load_calibration, preprocess_pifpaf
from .visuals.printer import Printer
from .activity import show_activities

LOG = logging.getLogger(__name__)


def find_pifpaf_json(image_path, json_dir=None):
    """Locate a precomputed pifpaf predictions file for an image."""
    base = os.path.basename(image_path)
    stem = os.path.splitext(base)[0]
    candidates = []
    if json_dir:
        candidates += [
            os.path.join(json_dir, base + '.pifpaf.json'),
            os.path.join(json_dir, base + '.predictions.json'),
            os.path.join(json_dir, stem + '.pifpaf.json'),
            os.path.join(json_dir, stem + '.json'),
        ]
    candidates += [
        image_path + '.pifpaf.json',
        image_path + '.predictions.json',
        os.path.splitext(image_path)[0] + '.pifpaf.json',
    ]
    for cand in candidates:
        if os.path.exists(cand):
            return cand
    return None


def _pifpaf_available():
    try:
        import openpifpaf  # noqa: F401
        return True
    except ImportError:
        return False


_PIFPAF_PREDICTOR = {}


def run_pifpaf(image_paths, checkpoint=None, batch_size=1, args=None):
    """Run OpenPifPaf on images; yields (path, annotations_json) per image.

    The Predictor (a full CNN checkpoint load) is cached per checkpoint so
    multi-image runs pay the load once. Decoder flags (--seed-threshold,
    --instance-threshold, ...) forward through openpifpaf's own configure
    hooks, best-effort, like the reference (predict.py:150-152)."""
    import openpifpaf
    if args is not None:
        if not hasattr(args, 'force_complete_pose'):
            # reference predict.py:142 forces complete poses for localization
            args.force_complete_pose = True
        for mod in (getattr(openpifpaf, 'decoder', None),
                    getattr(openpifpaf, 'Predictor', None)):
            try:
                mod.configure(args)
            except Exception as exc:  # partial args namespace
                LOG.warning("openpifpaf %s.configure skipped (%s) — decoder "
                            "flags may not take effect",
                            getattr(mod, '__name__', mod), exc)
    if checkpoint not in _PIFPAF_PREDICTOR:
        _PIFPAF_PREDICTOR[checkpoint] = openpifpaf.Predictor(checkpoint=checkpoint)
    predictor = _PIFPAF_PREDICTOR[checkpoint]
    for pred, _, meta in predictor.images(image_paths, batch_size=batch_size):
        yield meta['file_name'], [ann.json_data() for ann in pred]


def load_annotations(image_path, args):
    path = find_pifpaf_json(image_path, getattr(args, 'json_dir', None))
    if path is not None:
        with open(path) as f:
            anns = json.load(f)
        # the loose '<stem>.json' candidate can hit an unrelated file; fail
        # with the filename instead of crashing later on garbage structure
        if not isinstance(anns, list) or any(
                not isinstance(a, dict) or 'keypoints' not in a for a in anns):
            raise ValueError(f"{path} does not look like pifpaf predictions "
                             "(expected a list of annotation dicts with "
                             "'keypoints')")
        return anns
    if _pifpaf_available():
        for _, anns in run_pifpaf([image_path], checkpoint=args.checkpoint,
                                  args=args):
            return anns
    raise FileNotFoundError(
        f"No pifpaf annotations for {image_path}: provide <image>.pifpaf.json "
        f"(or --json_dir), or install openpifpaf")


def factory_from_args(args):
    if args.glob:
        args.images += glob.glob(args.glob)
    if not args.images:
        raise Exception("no image files given")
    if args.path_gt is None:
        args.show_all = True
    if not args.output_types and args.mode != 'keypoints':
        # Activity rendering draws front/bird views (show_activities).
        args.output_types = ['front', 'bird'] if args.activities else ['multi']
    if args.activities and not any(x in args.output_types
                                   for x in ('front', 'bird', 'json')):
        raise SystemExit("--activities outputs render as front/bird views (or "
                         "json): pass --output_types front bird [json]")
    if args.mode == 'stereo':
        args.images = sorted(args.images)
        assert len(args.images) % 2 == 0, "Odd number of images in a stereo setting"
        assert 'social_distance' not in (args.activities or []), \
            "Social distance not supported in stereo modality"
    if 'social_distance' in (args.activities or []) and args.net == 'monoloco':
        # the legacy net predicts no orientation; F-formation checks need yaw
        # (the reference crashes on an empty angles list here)
        raise SystemExit("social_distance requires orientation output: the "
                         "legacy monoloco net does not predict yaw — use "
                         "monoloco_pp")
    if args.mode != 'keypoints':
        assert any(x in args.output_types for x in ('front', 'bird', 'multi', 'json')), \
            "No output type specified, please select one among front, bird, multi, json"
        assert args.model, "--model checkpoint path required (no model download in this build)"
    return args


def predict(args):
    assert args.mode in ('keypoints', 'mono', 'stereo')
    args = factory_from_args(args)
    if getattr(args, 'profile', None):
        # Symmetric with train --profile (SURVEY.md section 5 tracing): wrap
        # the whole run in a jax.profiler trace for the given directory.
        import jax
        with jax.profiler.trace(args.profile):
            return _predict_run(args)
    return _predict_run(args)


def _predict_run(args):

    net = None
    if args.mode in ('mono', 'stereo'):
        net = Loco(model=args.model, mode=args.mode, net=args.net,
                   n_dropout=args.n_dropout, p_dropout=args.dropout)

    if args.output_directory is not None:
        os.makedirs(args.output_directory, exist_ok=True)

    step = 2 if args.mode == 'stereo' else 1
    if (args.mode != 'keypoints' and len(args.images) // step > 2
            and net.net in ('monoloco_pp', 'monoloco_p', 'monstereo')):
        # Multi-image runs forward whole chunks as one device program (same
        # engine path the KITTI generator uses); the per-image loop below
        # stays for 1-2 images (where its per-image forward-time print is
        # the reference contract, predict.py:256-259) and for the legacy
        # monoloco net.
        return _predict_batched(args, net, step)

    timing = []
    cnt = 0
    for i in range(0, len(args.images), step):
        image_path = args.images[i]
        annotations = load_annotations(image_path, args)
        if args.json_output is not None:
            _dump_pifpaf_json(args, image_path, annotations)
        annotations_r = load_annotations(args.images[i + 1], args) if step == 2 else None

        with open(image_path, 'rb') as f:
            cpu_image = Image.open(f).convert('RGB')
        im_size = (float(cpu_image.size[0]), float(cpu_image.size[1]))
        im_name = os.path.basename(image_path)

        output_path = _output_path(args, image_path)
        print(f'{cnt} image {im_name} saved as {output_path}')

        if args.mode == 'keypoints':
            dic_out = defaultdict(list)
            kk = None
            boxes, keypoints = preprocess_pifpaf(annotations, im_size)
        else:
            if args.path_gt is not None:
                dic_gt, kk = factory_for_gt(args.path_gt, im_name)
            else:
                kk = load_calibration(args.calibration, im_size,
                                      focal_length=args.focal_length)
                dic_gt = None
            boxes, keypoints = preprocess_pifpaf(annotations, im_size, enlarge_boxes=False)

            start = time.time()
            if args.mode == 'mono':
                LOG.info("Prediction with MonoLoco++")
                dic_out = net.forward(keypoints, kk)
            else:
                LOG.info("Prediction with MonStereo")
                _, keypoints_r = preprocess_pifpaf(annotations_r, im_size)
                dic_out = net.forward(keypoints, kk, keypoints_r=keypoints_r)
            fwd_time = (time.time() - start) * 1000
            timing.append(fwd_time)
            print(f"Forward time: {fwd_time:.0f} ms")

            dic_out = net.post_process(dic_out, boxes, keypoints, kk, dic_gt)
            if 'social_distance' in (args.activities or []):
                dic_out = net.social_distance(dic_out, args)
            if 'raise_hand' in (args.activities or []):
                dic_out = net.raising_hand(dic_out, keypoints)

        factory_outputs(args, cpu_image, annotations, dic_out, output_path, kk=kk)
        print(f'Image {cnt}\n' + '-' * 120)
        cnt += 1

    if timing:
        timing_arr = np.array(timing)
        print(f'Processed {cnt * step} images with an average time of '
              f'{int(timing_arr.mean())} ms and a std of {int(timing_arr.std())} ms')


def _output_path(args, image_path):
    if args.output_directory is None:
        splits = os.path.split(image_path)
        return os.path.join(splits[0], 'out_' + splits[1])
    return os.path.join(args.output_directory, 'out_' + os.path.basename(image_path))


def _dump_pifpaf_json(args, image_path, annotations):
    json_dir = args.json_output if isinstance(args.json_output, str) \
        else (args.output_directory or os.path.dirname(image_path))
    if json_dir:
        os.makedirs(json_dir, exist_ok=True)
    json_out = os.path.join(json_dir, os.path.basename(image_path)
                            + '.predictions.json')
    with open(json_out, 'w') as f:
        json.dump(annotations, f)


def _predict_batched(args, net, step):
    """Multi-image prediction: whole 64-image chunks forward as ONE device
    program (the engine path the KITTI generator uses, incl. stereo all-vs-all
    and MC-dropout epistemic passes), two-deep async pipeline so the device
    computes while the host draws/writes the previous chunk. Per-image
    post-processing, activities, and outputs are unchanged."""
    def load_one(i):
        """Annotations + gt/calibration for image index i (and its right pair)."""
        image_path = args.images[i]
        annotations = load_annotations(image_path, args)
        if args.json_output is not None:
            _dump_pifpaf_json(args, image_path, annotations)
        with open(image_path, 'rb') as f:
            w, h = Image.open(f).size
        im_size = (float(w), float(h))
        if args.path_gt is not None:
            dic_gt, kk = factory_for_gt(args.path_gt, os.path.basename(image_path))
        else:
            kk = load_calibration(args.calibration, im_size,
                                  focal_length=args.focal_length)
            dic_gt = None
        boxes, keypoints = preprocess_pifpaf(annotations, im_size,
                                             enlarge_boxes=False)
        keypoints_r = None
        if step == 2:
            annotations_r = load_annotations(args.images[i + 1], args)
            _, keypoints_r = preprocess_pifpaf(annotations_r, im_size)
        return (image_path, annotations, boxes, keypoints, keypoints_r,
                kk, dic_gt)

    image_idxs = list(range(0, len(args.images), step))
    chunk = 64
    cnt = 0
    since = time.time()

    def launch(s):
        # Loading rides inside the pipeline: chunk s loads (pose jsons or the
        # pifpaf CNN) while the device still computes chunk s-1, and memory
        # holds at most two chunks of annotations.
        batch = [load_one(i) for i in image_idxs[s:s + chunk]]
        fin = net.forward_batch_async(
            [b[3] for b in batch], [b[5] for b in batch],
            keypoints_r_list=[b[4] for b in batch] if step == 2 else None)
        return batch, fin

    def drain(batch, fin):
        nonlocal cnt
        for (image_path, annotations, boxes, keypoints, _, kk,
             dic_gt), dic_fwd in zip(batch, fin()):
            output_path = _output_path(args, image_path)
            dic_out = net.post_process(dic_fwd, boxes, keypoints, kk, dic_gt)
            if 'social_distance' in (args.activities or []):
                dic_out = net.social_distance(dic_out, args)
            if 'raise_hand' in (args.activities or []):
                dic_out = net.raising_hand(dic_out, keypoints)
            with open(image_path, 'rb') as f:
                cpu_image = Image.open(f).convert('RGB')
            factory_outputs(args, cpu_image, annotations, dic_out, output_path,
                            kk=kk)
            print(f'{cnt} image {os.path.basename(image_path)} saved as '
                  f'{output_path}')
            cnt += 1

    pending = None
    for s in range(0, len(image_idxs), chunk):
        launched = launch(s)
        if pending is not None:
            drain(*pending)
        pending = launched
    if pending is not None:
        drain(*pending)
    wall = time.time() - since
    print(f'Processed {cnt * step} images in {wall:.2f} s '
          f'({cnt * step / max(wall, 1e-9):.1f} images/s, batched forward)')


def factory_outputs(args, cpu_image, annotations, dic_out, output_path, kk=None):
    """Write json and/or figure outputs (reference predict.py:262-288)."""
    if 'json' in args.output_types:
        with open(output_path + '.monoloco.json', 'w') as ff:
            json.dump(_jsonable(dic_out), ff)
        if len(args.output_types) == 1:
            return

    if args.mode == 'keypoints':
        from .visuals.pifpaf_show import image_canvas, KeypointPainter, get_pifpaf_outputs
        kps, _ = get_pifpaf_outputs(annotations)
        with image_canvas(cpu_image, output_path + '.keypoints.png') as ax:
            KeypointPainter().keypoints(ax, kps)
        return

    if any(x in args.output_types for x in ('front', 'bird', 'multi')):
        LOG.info(output_path)
        if args.activities:
            show_activities(args, cpu_image, output_path, annotations, dic_out)
        else:
            printer = Printer(cpu_image, output_path, kk, args)
            figures, axes = printer.factory_axes(dic_out)
            printer.draw(figures, axes, cpu_image, dic_out, annotations=annotations)


def _jsonable(obj):
    """Recursively convert numpy types for json.dump."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    return obj
