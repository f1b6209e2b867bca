"""In-process mock of the nuscenes-devkit API surface PreprocessNuscenes uses
(reference prep/preprocess_nu.py:27-143): `NuScenes(version, dataroot,
verbose)` with .scene / .get('sample', token) / .get_sample_data(sd_token),
and `nuscenes.utils.splits.create_splits_scenes()`.

install() registers the fake modules in sys.modules so the REAL
monoloco_tpu.prep.preprocess_nu.factory() runs unmodified. The world is
deterministic: 2 scenes (one train, one val) x 2 chained samples x 6 cameras,
with 0-2 pedestrians per camera at seeded positions (plus a car and an animal
that category filtering must drop), so IoU matching, spherical labels and
clustering all operate on geometrically coherent data.
"""

import math
import sys
import types

import numpy as np

KK = np.array([[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]])
CAMERAS = ('CAM_FRONT', 'CAM_FRONT_LEFT', 'CAM_FRONT_RIGHT',
           'CAM_BACK', 'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')


class Quaternion:
    """pyquaternion stand-in: rotation by yaw about the camera y axis."""

    def __init__(self, yaw=0.0):
        c, s = math.cos(yaw), math.sin(yaw)
        self.rotation_matrix = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


class Box:
    def __init__(self, name, center, wlh, yaw=0.0):
        self.name = name
        self.center = list(center)
        self.wlh = list(wlh)
        self.orientation = Quaternion(yaw)


def boxes_for(sd_token):
    """Deterministic gt boxes for one sample-data token."""
    seed = abs(hash(sd_token)) % (2 ** 31)
    rng = np.random.RandomState(seed)
    n_ped = int(rng.randint(0, 3))
    boxes = []
    for _ in range(n_ped):
        z = float(rng.uniform(6.0, 35.0))
        x = float(rng.uniform(-0.3, 0.3)) * z
        y = 1.5
        yaw = float(rng.uniform(-math.pi, math.pi))
        boxes.append(Box('human.pedestrian.adult', (x, y, z),
                         (0.7, 0.8, 1.8), yaw))
    if rng.rand() < 0.5:  # category filter must drop these
        boxes.append(Box('vehicle.car', (2.0, 1.2, 18.0), (2.0, 4.5, 1.6)))
    if rng.rand() < 0.3:
        boxes.append(Box('animal', (0.5, 1.6, 8.0), (0.3, 0.6, 0.4)))
    return boxes


def image_name(sd_token):
    return f'n008-{sd_token}.jpg'


def pifpaf_annotation(box):
    """A pifpaf-style detection whose keypoints span the projected gt box."""
    from monoloco_tpu.geometry import project_3d
    u1, v1, u2, v2 = project_3d(box, KK)
    xs = np.linspace(u1 + 0.1 * (u2 - u1), u2 - 0.1 * (u2 - u1), 17)
    ys = np.linspace(v1 + 0.05 * (v2 - v1), v2 - 0.02 * (v2 - v1), 17)
    kps = []
    for x, y in zip(xs, ys):
        kps += [float(x), float(y), 0.9]
    return {'keypoints': kps,
            'bbox': [float(u1), float(v1), float(u2 - u1), float(v2 - v1)],
            'score': 0.9}


class NuScenes:
    SCENES = ({'name': 'scene-0001', 'token': 'tok1',
               'first_sample_token': 's1a'},
              {'name': 'scene-0002', 'token': 'tok2',
               'first_sample_token': 's2a'})
    CHAIN = {'s1a': 's1b', 's1b': '', 's2a': 's2b', 's2b': ''}

    def __init__(self, version, dataroot, verbose=False):
        self.version = version
        self.dataroot = dataroot
        self.scene = list(self.SCENES)

    def get(self, table, token):
        assert table == 'sample'
        return {'token': token,
                'data': {cam: f'{token}_{cam}' for cam in CAMERAS},
                'next': self.CHAIN[token]}

    def get_sample_data(self, sd_token, box_vis_level=1):
        return (f'/fake/samples/{image_name(sd_token)}', boxes_for(sd_token),
                KK.copy())


def all_sd_tokens():
    toks = []
    for scene in NuScenes.SCENES:
        t = scene['first_sample_token']
        while t:
            toks += [f'{t}_{cam}' for cam in CAMERAS]
            t = NuScenes.CHAIN[t]
    return toks


def create_splits_scenes():
    return {'train': ['scene-0001'], 'val': ['scene-0002']}


def install():
    """Register the fake devkit modules; returns a dict of what was added so
    callers (fixtures) can remove them again."""
    pkg = types.ModuleType('nuscenes')
    nusc_mod = types.ModuleType('nuscenes.nuscenes')
    nusc_mod.NuScenes = NuScenes
    utils_mod = types.ModuleType('nuscenes.utils')
    splits_mod = types.ModuleType('nuscenes.utils.splits')
    splits_mod.create_splits_scenes = create_splits_scenes
    utils_mod.splits = splits_mod
    pkg.nuscenes = nusc_mod
    pkg.utils = utils_mod
    added = {}
    for name, mod in (('nuscenes', pkg), ('nuscenes.nuscenes', nusc_mod),
                      ('nuscenes.utils', utils_mod),
                      ('nuscenes.utils.splits', splits_mod)):
        if name not in sys.modules:
            sys.modules[name] = mod
            added[name] = mod
    return added


def uninstall(added):
    for name in added:
        sys.modules.pop(name, None)
