"""ReID stereo association on synthetic identity-textured scenes.

The container has no Market-1501 checkpoint (reference
eval/reid_baseline.py:30-88), so the shipped substitute is a tiny embedding
trained on the synthetic generator's per-identity textures
(tools/train_tiny_reid.py -> tests/fixture_tiny_reid.pkl). These tests assert
the in-repo weights make the `reid` association MEANINGFUL: same-identity L/R
crops associate correctly, measurably better than random features.
"""

import os
import sys
import json
import warnings

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIXTURE = os.path.join(HERE, 'fixture_tiny_reid.pkl')

sys.path.insert(0, os.path.join(REPO, 'tools'))

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason='tiny ReID fixture missing (run tools/train_tiny_reid.py)')


PEOPLE = [
    [(-3.5, 8.0, 0.3), (0.0, 11.0, -0.5), (2.5, 15.0, 0.1),
     (-1.0, 20.0, 0.8), (4.0, 25.0, -0.2)],
    [(-2.0, 7.0, 0.0), (1.5, 9.0, 0.4), (3.0, 13.0, -0.3),
     (-4.0, 17.0, 0.6), (0.5, 22.0, -0.8)],
    [(-1.5, 6.0, 0.2), (2.0, 10.0, -0.1), (-3.0, 12.0, 0.5),
     (4.5, 18.0, -0.6), (1.0, 24.0, 0.3)],
    [(0.0, 8.5, -0.4), (-2.5, 10.5, 0.7), (3.5, 14.0, 0.0),
     (-0.5, 19.0, -0.2), (2.0, 26.0, 0.9)],
]


def _load_scene(root, name):
    with open(os.path.join(root, 'annotations',
                           name + '.png.predictions.json')) as f:
        anns_l = json.load(f)
    with open(os.path.join(root, 'annotations_right',
                           name + '.png.predictions.json')) as f:
        anns_r = json.load(f)
    return anns_l, anns_r


@pytest.fixture(scope='module')
def scenes(tmp_path_factory):
    """Four synthetic stereo scenes with rendered identity textures
    (20 associations total — enough that chance (1/5) is statistically
    excluded)."""
    from make_synthetic_kitti import write_scene
    root = str(tmp_path_factory.mktemp('reid_scenes'))
    rng = np.random.RandomState(3)
    out = []
    for idx, people in enumerate(PEOPLE):
        name = write_scene(root, idx, people, rng)
        anns_l, anns_r = _load_scene(root, name)
        out.append((name, anns_l, anns_r))
    return root, out


@pytest.fixture(scope='module')
def scene(scenes):
    root, out = scenes
    name, anns_l, anns_r = out[0]
    return root, name, anns_l, anns_r


def _boxes(anns):
    return [[a['bbox'][0], a['bbox'][1], a['bbox'][0] + a['bbox'][2],
             a['bbox'][1] + a['bbox'][3]] for a in anns]


def _kps(anns):
    from monoloco_tpu.network.preprocess import prepare_pif_kps
    return [prepare_pif_kps(a['keypoints']) for a in anns]


def test_right_images_written(scene):
    root, name, _, _ = scene
    assert os.path.exists(os.path.join(root, 'data', 'kitti', 'images',
                                       name + '.png'))
    assert os.path.exists(os.path.join(root, 'data', 'kitti', 'images_r',
                                       name + '.png'))


def test_tiny_weights_load_without_warning():
    from monoloco_tpu.eval.reid_baseline import ReID, tiny_reid_features
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        reid = ReID(weights_path=FIXTURE)
    assert reid.pretrained
    assert reid._features is tiny_reid_features
    assert (reid.height, reid.width) == (64, 32)


def test_reid_association_beats_random(scenes):
    """Nearest-neighbor L->R association with the trained tiny features over
    4 scenes x 5 people: accuracy must be >= 0.8, which excludes random
    association (chance = 1/5 per person; P(>=16/20 at chance) ~ 1e-9) — and
    must not lose to a random-weight feature extractor (which gets box-scale
    cues for free). Identity ground truth: left ann i <-> right ann i by
    construction (tools/make_synthetic_kitti.py write_scene)."""
    from monoloco_tpu.eval.reid_baseline import ReID, get_reid_features
    root, scene_list = scenes

    def association_hits(reid):
        hits = total = 0
        for name, anns_l, anns_r in scene_list:
            path_l = os.path.join(root, 'data', 'kitti', 'images',
                                  name + '.png')
            path_r = os.path.join(root, 'data', 'kitti', 'images_r',
                                  name + '.png')
            f_l, f_r = get_reid_features(reid, _boxes(anns_l), _boxes(anns_r),
                                         path_l, path_r)
            d = np.linalg.norm(np.asarray(f_l)[:, None, :]
                               - np.asarray(f_r)[None, :, :], axis=2)
            hits += int(np.sum(np.argmin(d, axis=1) == np.arange(len(anns_l))))
            total += len(anns_l)
        return hits, total

    hits, total = association_hits(ReID(weights_path=FIXTURE))
    trained_acc = hits / total
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')       # random-weights warning expected
        r_hits, _ = association_hits(ReID(weights_path=None))
    assert total >= 20
    assert trained_acc >= 0.8, (hits, total)
    assert hits >= r_hits, (hits, r_hits)


def test_reid_baseline_association_pipeline(scene):
    """Full baselines_association path with reid features: stereo depths come
    from the associated pair's disparity and land near the geometric truth."""
    from monoloco_tpu.eval.reid_baseline import ReID, get_reid_features
    from monoloco_tpu.eval.stereo_baselines import baselines_association
    root, name, anns_l, anns_r = scene
    path_l = os.path.join(root, 'data', 'kitti', 'images', name + '.png')
    path_r = os.path.join(root, 'data', 'kitti', 'images_r', name + '.png')
    kps, kps_r = _kps(anns_l), _kps(anns_r)
    reid = ReID(weights_path=FIXTURE)
    feats = get_reid_features(reid, _boxes(anns_l), _boxes(anns_r),
                              path_l, path_r)
    # Mono depth guesses deliberately off by ~15%: the stereo association
    # must still recover accurate depths from disparity.
    zz_true = [8.0, 11.0, 15.0, 20.0, 25.0]
    zz_mono = [z * 1.15 for z in zz_true]
    zzs_stereo, cnt = baselines_association(['reid'], zz_mono, kps, kps_r,
                                            feats)
    assert cnt['reid'] >= 4, cnt
    err = np.abs(np.asarray(zzs_stereo['reid']) - np.asarray(zz_true))
    # Associated rows must beat the 15%-off mono prior.
    assert np.median(err) < 0.5, (zzs_stereo['reid'], zz_true)
