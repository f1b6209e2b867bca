"""nuScenes preprocessing pipeline, exercised with a mocked devkit (the real
nuscenes-devkit is an optional dependency that is absent in CI)."""

import json
import math
import os

import numpy as np
import pytest

KK = np.array([[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]])


class FakeQuaternion:
    """Stand-in for pyquaternion.Quaternion: rotation by `yaw` about y."""

    def __init__(self, yaw=0.0, about='y'):
        c, s = math.cos(yaw), math.sin(yaw)
        if about == 'y':
            self.rotation_matrix = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        else:  # about z (map/world frame)
            self.rotation_matrix = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


class FakeBox:
    def __init__(self, name, center, wlh, yaw=0.0):
        self.name = name
        self.center = list(center)
        self.wlh = list(wlh)
        self.orientation = FakeQuaternion(yaw)


PED = FakeBox('human.pedestrian.adult', (1.0, 1.5, 12.0), (0.7, 0.8, 1.8), yaw=0.3)


def test_quaternion_yaw():
    from monoloco_tpu.prep.preprocess_nu import quaternion_yaw
    assert quaternion_yaw(FakeQuaternion(0.0)) == pytest.approx(0.0)
    # Image frame: yaw about the camera y axis.
    assert quaternion_yaw(FakeQuaternion(0.7)) == pytest.approx(0.7)
    assert quaternion_yaw(FakeQuaternion(-2.0)) == pytest.approx(-2.0)
    # World frame: yaw about z.
    assert quaternion_yaw(FakeQuaternion(1.1, about='z'),
                          in_image_frame=False) == pytest.approx(1.1)


def test_extract_ground_truth_layout_and_filtering():
    from monoloco_tpu.prep.preprocess_nu import extract_ground_truth
    boxes = [PED,
             FakeBox('vehicle.car', (5.0, 1.0, 20.0), (2.0, 4.5, 1.6)),
             FakeBox('animal.cat', (0.0, 1.0, 5.0), (0.2, 0.5, 0.3))]
    boxes_gt, boxes_3d, ys = extract_ground_truth(boxes, KK)
    # 'all' categories keep pedestrians/bicycles/motorcycles; car + animal drop.
    assert len(boxes_gt) == len(ys) == len(boxes_3d) == 1
    y = ys[0]
    assert len(y) == 10  # [theta, psi, z, d, h, w, l, sin, cos, yaw]
    assert y[2] == pytest.approx(12.0)
    assert y[3] == pytest.approx(np.linalg.norm([1.0, 1.5, 12.0]))
    # hwl comes from wlh indices (2, 0, 1)
    assert y[4:7] == pytest.approx([1.8, 0.7, 0.8])
    assert y[9] == pytest.approx(0.3)        # egocentric yaw
    # correct_angle returns the allocentric sin/cos of yaw - atan2(x, z)
    assert math.hypot(y[7], y[8]) == pytest.approx(1.0)
    # 2D box from the two central corners at center depth
    b = boxes_gt[0]
    assert b[0] == pytest.approx(800 * (1.0 - 0.35) / 12 + 800)
    assert b[3] == pytest.approx(800 * (1.5 + 0.9) / 12 + 450)


def _fake_pifpaf_annotation():
    """A detection whose enlarged bbox overlaps PED's projected gt box."""
    xs = np.linspace(845, 888, 17)
    ys = np.linspace(492, 608, 17)
    kps = []
    for x, y in zip(xs, ys):
        kps += [float(x), float(y), 0.9]
    return {'keypoints': kps, 'bbox': [845.0, 492.0, 43.0, 116.0], 'score': 0.9}


class FakeNusc:
    def __init__(self, path_im):
        self.scene = [{'name': 'scene-0001', 'token': 't1',
                       'first_sample_token': 's1'}]
        self._path_im = path_im

    def get(self, table, token):
        assert table == 'sample' and token == 's1'
        cams = ('CAM_FRONT', 'CAM_FRONT_LEFT', 'CAM_FRONT_RIGHT',
                'CAM_BACK', 'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')
        return {'data': {c: f'sd_{c}' for c in cams}, 'next': ''}

    def get_sample_data(self, sd_token, box_vis_level=1):
        if sd_token == 'sd_CAM_FRONT':
            return self._path_im, [PED], KK.copy()
        return f'/nonexistent/{sd_token}.jpg', [], KK.copy()


def test_preprocess_nuscenes_run_with_mock(tmp_path, monkeypatch):
    import monoloco_tpu.prep.preprocess_nu as nu

    dir_ann = tmp_path / 'ann'
    dir_nu = tmp_path / 'nuscenes'
    dir_ann.mkdir()
    dir_nu.mkdir()
    path_im = '/fake/samples/CAM_FRONT/n008-front.jpg'
    with open(dir_ann / 'n008-front.jpg.predictions.json', 'w') as f:
        json.dump([_fake_pifpaf_annotation()], f)

    fake = FakeNusc(path_im)
    monkeypatch.setattr(nu, 'factory',
                        lambda dataset, d: (fake, fake.scene, ['scene-0001'], []))
    monkeypatch.chdir(tmp_path)

    prep = nu.PreprocessNuscenes(dir_ann=str(dir_ann), dir_nuscenes=str(dir_nu),
                                 dataset='nuscenes', iou_min=0.3)
    prep.run()

    with open(prep.path_joints) as f:
        dic_jo = json.load(f)
    assert len(dic_jo['train']['X']) == 1
    assert len(dic_jo['train']['X'][0]) == 34
    y = dic_jo['train']['Y'][0]
    assert len(y) == 10
    assert y[2] == pytest.approx(12.0)
    # hwl stored normalized: (hwl - [1.72, 0.75, 0.68]) / 0.1
    assert y[4] == pytest.approx((1.8 - 1.72) / 0.1)
    assert y[5] == pytest.approx((0.7 - 0.75) / 0.1)
    assert dic_jo['train']['K'][0] == KK.tolist()
    assert dic_jo['train']['names'][0] == 'n008-front.jpg'
    # distance cluster: d ~ 12.1 m -> bin '20'
    assert len(dic_jo['train']['clst']['20']['X']) == 1

    with open(prep.path_names) as f:
        dic_names = json.load(f)
    entry = dic_names['n008-front.jpg']
    assert len(entry['boxes']) == 1 and len(entry['ys']) == 1
    assert entry['K'] == KK.tolist()


def test_preprocess_nuscenes_with_mock_devkit(tmp_path, monkeypatch):
    """Full run through the REAL factory(): the mock devkit package is
    installed in sys.modules, so NuScenes instantiation, split resolution,
    the scene/sample/camera walk, category filtering, IoU matching and both
    train/val phases are exercised end-to-end on coherent geometry."""
    import mock_nuscenes_devkit as mock
    import monoloco_tpu.prep.preprocess_nu as nu

    added = mock.install()
    try:
        dir_ann = tmp_path / 'ann'
        dir_nu = tmp_path / 'nuscenes'
        dir_ann.mkdir()
        dir_nu.mkdir()
        n_people = 0
        for sd in mock.all_sd_tokens():
            anns = [mock.pifpaf_annotation(b) for b in mock.boxes_for(sd)
                    if b.name.startswith('human')]
            n_people += len(anns)
            with open(dir_ann / (mock.image_name(sd) + '.predictions.json'),
                      'w') as f:
                json.dump(anns, f)
        assert n_people > 4  # the seeded world is non-trivial

        monkeypatch.chdir(tmp_path)
        prep = nu.PreprocessNuscenes(dir_ann=str(dir_ann),
                                     dir_nuscenes=str(dir_nu),
                                     dataset='nuscenes', iou_min=0.3)
        prep.run()
    finally:
        mock.uninstall(added)

    with open(prep.path_joints) as f:
        dic_jo = json.load(f)
    # Both phases populated (scene-0001 -> train, scene-0002 -> val).
    assert len(dic_jo['train']['X']) > 0
    assert len(dic_jo['val']['X']) > 0
    assert len(dic_jo['train']['X']) + len(dic_jo['val']['X']) == n_people
    for phase in ('train', 'val'):
        for x, y, k in zip(dic_jo[phase]['X'], dic_jo[phase]['Y'],
                           dic_jo[phase]['K']):
            assert len(x) == 34 and len(y) == 10
            assert k == mock.KK.tolist()
        # Spherical labels: r >= z, plausible ranges, normalized hwl ~ 0
        ys = np.array(dic_jo[phase]['Y'])
        assert (ys[:, 3] >= ys[:, 2] - 1e-6).all()
        assert (ys[:, 2] > 5).all() and (ys[:, 2] < 36).all()
        assert np.abs(ys[:, 4:7]).max() < 3
    # Clusters partition the annotations by gt distance.
    n_clst = sum(len(v['X']) for v in dic_jo['train']['clst'].values())
    assert n_clst == len(dic_jo['train']['X'])

    with open(prep.path_names) as f:
        dic_names = json.load(f)
    assert len(dic_names) == len(mock.all_sd_tokens())


def test_nuscenes_teaser_split_factory(tmp_path, monkeypatch):
    """factory('nuscenes_teaser') reads the teaser scene list + split JSON
    (reference preprocess_nu.py:185-209)."""
    import mock_nuscenes_devkit as mock
    from monoloco_tpu.prep.preprocess_nu import factory

    added = mock.install()
    try:
        monkeypatch.chdir(tmp_path)
        os.makedirs('splits')
        with open('splits/nuscenes_teaser_scenes.txt', 'w') as f:
            f.write('tok1\ntok2\n')
        with open('splits/split_nuscenes_teaser.json', 'w') as f:
            json.dump({'train': ['tok1'], 'val': ['tok2']}, f)
        nusc, scenes, split_train, split_val = factory('nuscenes_teaser',
                                                       str(tmp_path))
        assert [s['token'] for s in scenes] == ['tok1', 'tok2']
        assert split_train == ['scene-0001'] and split_val == ['scene-0002']
    finally:
        mock.uninstall(added)


def test_extract_social_padding():
    from monoloco_tpu.prep.preprocess_nu import extract_social

    def person(xs, ys, foot):
        inp = list(np.zeros(34))
        inp[31] = foot - 0.1
        inp[33] = foot
        kp = [list(np.full(17, xs)), list(np.full(17, ys)), [0.9] * 17]
        return inp, kp

    inputs, keypoints = [], []
    for xs, foot in ((100.0, 0.5), (120.0, 0.8), (300.0, 0.2)):
        inp, kp = person(xs, 200.0, foot)
        inputs.append(inp)
        keypoints.append(kp)
    ys = [[0, 0, 0, 10.0], [0, 0, 0, 20.0], [0, 0, 0, 30.0]]
    matches = [(0, 0), (1, 1), (2, 2)]

    out = extract_social(inputs, ys, keypoints, 0, matches)
    assert len(out) == 38
    assert out[:34] == inputs[0]
    # nearest neighbour is person 1: relative ground foot + gt depth
    assert out[34] == pytest.approx(0.8 - 0.5)
    assert out[35] == pytest.approx(20.0)
    assert out[36] == pytest.approx(0.2 - 0.5)
    assert out[37] == pytest.approx(30.0)

    # unmatched neighbour pads zeros
    out2 = extract_social(inputs, ys, keypoints, 0, [(0, 0)])
    assert out2[34:] == [0.0, 0.0, 0.0, 0.0]
