"""Run the localization nets over KITTI validation pifpaf files and write
KITTI-format txt detections for evaluation.

Behavioral parity targets: /root/reference/monoloco/eval/generate_kitti.py
(run :87-166, stereo baselines :168-199, save_txts :202-253 — including the
txt column layout `type trunc occ alpha bbox(4) hwl xyz ry conf bi epi` and the
0.035/0.033/0.05 confidence scales — and create_empty_files :256-277).

The serving loop reuses the engine's bucketed jitted programs, so generating
~3.7k images costs a handful of compiles plus steady-state dispatches.
"""

import math
import os
from collections import defaultdict

import numpy as np

from ..network import Loco
from ..network.preprocess import preprocess_pifpaf
from .geom_baseline import geometric_coordinates
from ..geometry import get_category
from ..geometry.host import np_get_keypoints, np_pixel_to_camera, np_xyz_from_distance
from ..utils import factory_basename, make_new_directory, read_and_rewrite
from ..prep import factory_file
from .stereo_baselines import baselines_association


class GenerateKitti:

    dir_gt = os.path.join('data', 'kitti', 'gt')
    dir_kk = os.path.join('data', 'kitti', 'calib')
    dir_byc = os.path.join('data', 'kitti', 'object_detection', 'left')
    monoloco_checkpoint = os.path.join('data', 'models', 'monoloco-190717-0952.pkl')
    reid_checkpoint = os.path.join('data', 'models', 'reid_model_market.pkl')

    def __init__(self, args):
        assert args.mode in ('mono', 'stereo'), "mode not recognized"
        self.mode = args.mode
        self.net = 'monstereo' if args.mode == 'stereo' else 'monoloco_pp'
        self.model = Loco(model=args.model, mode=args.mode,
                          n_dropout=args.n_dropout, p_dropout=args.dropout,
                          linear_size=args.hidden_size, n_stage=args.n_stage,
                          mesh=getattr(args, 'mesh', None))
        self.dir_ann = args.dir_ann
        self.generate_official = getattr(args, 'generate_official', False)
        assert os.listdir(self.dir_ann), "Annotation directory is empty"
        self.set_basename = factory_basename(args.dir_ann, self.dir_gt)

        self.baselines = {'mono': [], 'stereo': []}
        if getattr(args, 'baselines', False):
            self.baselines['mono'] = ['monoloco', 'geometric']
            self.monoloco = Loco(model=self.monoloco_checkpoint, mode='mono',
                                 net='monoloco', n_dropout=args.n_dropout,
                                 p_dropout=args.dropout, linear_size=256)
            if args.mode == 'stereo':
                self.baselines['stereo'] = ['pose', 'reid']
                self.cnt_disparity = defaultdict(int)
                self.cnt_no_stereo = 0
                self.dir_images = os.path.join('data', 'kitti', 'images')
                self.dir_images_r = os.path.join('data', 'kitti', 'images_r')
                from .reid_baseline import ReID
                # --reid_weights lets a user with a Market-1501 checkpoint
                # (reference reid_baseline.py:30-59) point at it directly;
                # default falls back to the conventional path, and absent
                # weights keep the loud-failure behavior in ReID.__init__.
                weights = getattr(args, 'reid_weights', None)
                if weights is None and os.path.exists(self.reid_checkpoint):
                    weights = self.reid_checkpoint
                self.reid_net = ReID(weights_path=weights, num_classes=751,
                                     height=256, width=128)

    # ------------------------------------------------------------------

    def run(self):
        cnt_ann = cnt_file = cnt_no_file = 0
        di = os.path.join('data', 'kitti', self.net)
        make_new_directory(di)
        dir_out = {self.net: di}
        for _, names in self.baselines.items():
            for name in names:
                d = os.path.join('data', 'kitti', name)
                make_new_directory(d)
                dir_out[name] = d

        # Generation without baselines: run whole image batches (mono AND
        # stereo all-vs-all, incl. MC-dropout epistemic passes) as single
        # device programs (engine.forward_batch) instead of one dispatch per
        # image — optionally sharded over a device mesh.
        # The serial per-image loop below exists solely for the baselines
        # path (self.net is always monoloco_pp or monstereo).
        if not self.baselines['mono']:
            return self._run_batched(dir_out)

        load_right = self.net == 'monstereo' or bool(self.baselines['stereo'])
        for basename in sorted(self.set_basename):
            (boxes, keypoints, kk, tt, cat, keypoints_r,
             boxes_r) = self._load_image(basename, load_right)
            if not keypoints:
                cnt_no_file += 1
                continue

            if self.net == 'monstereo':
                dic_out = self.model.forward(keypoints, kk, keypoints_r=keypoints_r)
            else:
                dic_out = self.model.forward(keypoints, kk)

            all_outputs = {self.net: [dic_out['xyzd'], dic_out['bi'], dic_out['epi'],
                                      dic_out['yaw'], dic_out['h'], dic_out['w'],
                                      dic_out['l']]}
            zzs = [float(el[2]) for el in np.asarray(dic_out['xyzd'])]

            params = [kk, tt]
            path_txt = os.path.join(dir_out[self.net], basename + '.txt')
            save_txts(path_txt, boxes, all_outputs[self.net], params,
                      net=self.net, cat=cat)
            cnt_ann += len(boxes)
            cnt_file += 1

            if self.baselines['mono']:
                dic_mono = self.monoloco.forward(keypoints, kk)
                zzs_geom, xy_centers = geometric_coordinates(keypoints, kk, average_y=0.48)
                all_outputs['monoloco'] = [dic_mono['d'], dic_mono['bi'],
                                           dic_mono['epi']] + [zzs_geom, xy_centers]
                all_outputs['geometric'] = all_outputs['monoloco']
                path_txts = {}
                for key in self.baselines['mono']:
                    path_txts[key] = os.path.join(dir_out[key], basename + '.txt')
                    save_txts(path_txts[key], boxes, all_outputs[key], params,
                              net=key, cat=cat)

                if self.baselines['stereo']:
                    dic_xyz = self._run_stereo_baselines(
                        basename, boxes, keypoints, zzs, kk, boxes_r, keypoints_r)
                    for key in dic_xyz:
                        outs = all_outputs['monoloco'].copy()
                        outs[0] = dic_xyz[key]
                        path_txts[key] = os.path.join(dir_out[key], basename + '.txt')
                        save_txts(path_txts[key], boxes, outs, params,
                                  net='baseline', cat=cat)

        print(f"\nSaved in {cnt_file} txt {cnt_ann} annotations. "
              f"Not found {cnt_no_file} images")
        if self.baselines[self.mode] and self.net == 'monstereo':
            print("STEREO:")
            for key in self.baselines['stereo']:
                ratio = self.cnt_disparity[key] / max(cnt_ann, 1) * 100
                print(f"Annotations corrected using {key} baseline: {ratio:.1f}%")
            print(f"Not found {self.cnt_no_stereo}/{cnt_file} stereo files")
            if not getattr(getattr(self, 'reid_net', None), 'pretrained', True):
                print("WARNING: the reid txts above used UNTRAINED (random) "
                      "ReID features and are not a valid baseline")
        if self.generate_official:
            create_empty_files(dir_out, self.net)

    def _run_batched(self, dir_out, chunk=64):
        """Batched generation: load all annotations, forward whole image
        chunks (mono or stereo) in one device program each — sharded over the
        mesh's data axis when one is set — then write the txts."""
        stereo = self.net == 'monstereo'
        cnt_ann = cnt_file = cnt_no_file = 0
        loaded = []
        # sorted: chunk membership must be run-to-run deterministic — the
        # MC-dropout bucket shape (and hence the epi draws) depends on which
        # images share a chunk, and set iteration order is hash-randomized.
        for basename in sorted(self.set_basename):
            (boxes, keypoints, kk, tt, cat, keypoints_r,
             _boxes_r) = self._load_image(basename, load_right=stereo)
            if not keypoints:
                cnt_no_file += 1
                continue
            loaded.append((basename, boxes, keypoints, kk, tt, cat, keypoints_r))

        # Two-deep software pipeline: chunk i+1 is dispatched (async on the
        # device) before chunk i's results are fetched and written, so device
        # compute and tunnel transfer overlap the host's txt IO.
        def launch(start):
            batch = loaded[start:start + chunk]
            fin = self.model.forward_batch_async(
                [b[2] for b in batch], [b[3] for b in batch],
                keypoints_r_list=[b[6] for b in batch] if stereo else None)
            return batch, fin

        def drain(batch, fin):
            nonlocal cnt_ann, cnt_file
            for (basename, boxes, keypoints, kk, tt, cat, _), dic_out in zip(
                    batch, fin()):
                if dic_out is None:
                    continue
                all_outputs = [dic_out['xyzd'], dic_out['bi'], dic_out['epi'],
                               dic_out['yaw'], dic_out['h'], dic_out['w'],
                               dic_out['l']]
                path_txt = os.path.join(dir_out[self.net], basename + '.txt')
                save_txts(path_txt, boxes, all_outputs, [kk, tt],
                          net=self.net, cat=cat)
                cnt_ann += len(boxes)
                cnt_file += 1

        pending = None
        for start in range(0, len(loaded), chunk):
            launched = launch(start)
            if pending is not None:
                drain(*pending)
            pending = launched
        if pending is not None:
            drain(*pending)

        print(f"\nSaved in {cnt_file} txt {cnt_ann} annotations. "
              f"Not found {cnt_no_file} images")
        if self.generate_official:
            create_empty_files(dir_out, self.net)

    def _load_image(self, basename, load_right):
        """Annotations + calibration + category for one image — the ONE place
        both generation paths (serial baselines loop and batched) load from,
        so they provably see identical inputs. Right-camera annotations are
        parsed only when the caller needs them (stereo net or baselines)."""
        path_calib = os.path.join(self.dir_kk, basename + '.txt')
        annotations, kk, tt = factory_file(path_calib, self.dir_ann, basename)
        boxes, keypoints = preprocess_pifpaf(annotations, im_size=(1242, 374))
        cat = get_category(keypoints, os.path.join(self.dir_byc, basename + '.json'))
        keypoints_r, boxes_r = None, []
        if load_right and keypoints:
            annotations_r, _, _ = factory_file(path_calib, self.dir_ann,
                                               basename, ann_type='right')
            boxes_r, keypoints_r = preprocess_pifpaf(annotations_r,
                                                     im_size=(1242, 374))
        return boxes, keypoints, kk, tt, cat, keypoints_r, boxes_r

    def _run_stereo_baselines(self, basename, boxes, keypoints, zzs, kk,
                              boxes_r, keypoints_r):
        uv_centers = np_get_keypoints(np.asarray(keypoints, np.float32), 'bottom')
        xy_centers = np_pixel_to_camera(uv_centers, kk, 1)

        if keypoints_r:
            from .reid_baseline import get_reid_features
            path_image = os.path.join(self.dir_images, basename + '.png')
            path_image_r = os.path.join(self.dir_images_r, basename + '.png')
            reid_features = get_reid_features(self.reid_net, boxes, boxes_r,
                                              path_image, path_image_r)
            dic_zzs, cnt = baselines_association(self.baselines['stereo'], zzs,
                                                 keypoints, keypoints_r, reid_features)
            for key in cnt:
                self.cnt_disparity[key] += cnt[key]
        else:
            self.cnt_no_stereo += 1
            dic_zzs = {key: zzs for key in self.baselines['stereo']}

        dic_xyz = defaultdict(list)
        for key in dic_zzs:
            for idx, zz_base in enumerate(dic_zzs[key]):
                xx = float(xy_centers[idx][0]) * zz_base
                yy = float(xy_centers[idx][1]) * zz_base
                dic_xyz[key].append([xx, yy, zz_base])
        return dic_xyz


def save_txts(path_txt, all_inputs, all_outputs, all_params, net='monoloco', cat=None):
    """Write one KITTI-format txt: per row
    `type -1 -1 alpha bbox(4) hwl xyz ry conf bi epi`."""
    assert net in ('monoloco', 'monstereo', 'geometric', 'baseline', 'monoloco_pp')

    if net in ('monstereo', 'monoloco_pp'):
        xyzd, bis, epis, yaws, hs, ws, ls = all_outputs[:]
        xyz = np.asarray(xyzd)[:, 0:3]
        tt = [0, 0, 0]
    elif net in ('monoloco', 'geometric'):
        tt = [0, 0, 0]
        dds, bis, epis, zzs_geom, xy_centers = all_outputs[:]
        xyz = np_xyz_from_distance(np.asarray(dds).reshape(-1), xy_centers)
    else:
        _, tt = all_params[:]
        xyz, bis, epis, zzs_geom, xy_centers = all_outputs[:]
    uv_boxes = all_inputs[:]
    assert len(uv_boxes) == len(list(xyz)), \
        "Number of inputs different from number of outputs"

    with open(path_txt, 'w+') as ff:
        for idx, uv_box in enumerate(uv_boxes):
            xx = float(xyz[idx][0]) - tt[0]
            yy = float(xyz[idx][1]) - tt[1]
            zz = float(xyz[idx][2]) - tt[2]
            if net == 'geometric':
                zz = zzs_geom[idx]
            cam_0 = [xx, yy, zz]
            bi = float(np.asarray(bis[idx]).reshape(-1)[0])
            epi = float(np.asarray(epis[idx]).reshape(-1)[0])
            if net in ('monstereo', 'monoloco_pp'):
                alpha = float(np.asarray(yaws[0]).reshape(-1)[idx])
                ry = float(np.asarray(yaws[1]).reshape(-1)[idx])
                hwl = [float(np.asarray(v).reshape(-1)[0]) for v in (hs[idx], ws[idx], ls[idx])]
                conf_scale = 0.035 if net == 'monoloco_pp' else 0.033
            else:
                alpha, ry, hwl = -10., -10., [0, 0, 0]
                conf_scale = 0.05
            conf = conf_scale * (uv_box[-1]) / (bi / math.sqrt(xx ** 2 + yy ** 2 + zz ** 2))

            output_list = [alpha] + uv_box[:-1] + hwl + cam_0 + [ry, conf, bi, epi]
            category = cat[idx] if cat else 0.0
            ff.write("%s " % ('Pedestrian' if category < 0.1 else 'Cyclist'))
            ff.write("%i %i " % (-1, -1))
            for el in output_list:
                ff.write("%f " % el)
            ff.write("\n")


def create_empty_files(dir_out, net):
    """Empty txt files for the official KITTI evaluation folder layout
    (reference generate_kitti.py:256-277)."""
    methods = ['pseudo-lidar', 'monopsr', '3dop', 'm3d', 'oc-stereo', 'e2e',
               'monodis', 'smoke']
    dirs = [os.path.join('data', 'kitti', m) for m in methods]
    dirs_orig = [os.path.join('data', 'kitti', m + '-orig') for m in methods]
    for di, di_orig in zip(dirs, dirs_orig):
        make_new_directory(di)
        for i in range(7481):
            name = str(i).zfill(6) + '.txt'
            read_and_rewrite(os.path.join(di_orig, name), os.path.join(di, name))
    for i in range(7481):
        name = str(i).zfill(6) + '.txt'
        with open(os.path.join(dir_out[net], name), 'a+'):
            pass
