"""CLI-level integration tests, mirroring the reference test strategy
(SURVEY.md section 4): exercise `python -m monoloco_tpu.run ...` as a
subprocess and validate the train -> save -> load -> predict -> file-output
contract, including output filenames."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
JOINTS_MONO = os.path.join(HERE, 'fixture_joints-kitti-mono.json')
JOINTS_STEREO = os.path.join(HERE, 'fixture_joints-kitti-stereo.json')
IMAGE = os.path.join(HERE, 'fixture_002282.png')
IMAGE_SD = os.path.join(HERE, 'fixture_frame0032.jpg')


def run_cli(*args):
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS='',    # skip remote-TPU registration
               JAX_PLATFORMS='cpu')
    cmd = [sys.executable, '-m', 'monoloco_tpu.run', *args]
    res = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                         timeout=900)
    assert res.returncode == 0, f"CLI failed:\n{res.stdout}\n{res.stderr}"
    return res


@pytest.fixture(scope='module')
def trained_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('models') / 'mono.pkl')
    run_cli('train', '--joints', JOINTS_MONO, '--epochs', '3',
            '--hidden_size', '64', '--bs', '512', '--out', path)
    assert os.path.exists(path)
    return path


class TestTrainPredictMono:
    def test_train_saves_checkpoint(self, trained_model):
        assert os.path.getsize(trained_model) > 1000

    def test_predict_json_and_multi(self, trained_model, tmp_path):
        out_dir = str(tmp_path)
        run_cli('predict', IMAGE, '--mode', 'mono', '--model', trained_model,
                '--calibration', 'kitti',
                '--output_types', 'json', 'multi', '-o', out_dir)
        json_path = os.path.join(out_dir, 'out_fixture_002282.png.monoloco.json')
        png_path = os.path.join(out_dir, 'out_fixture_002282.png.multi.png')
        assert os.path.exists(json_path)
        assert os.path.exists(png_path)
        with open(json_path) as f:
            dic = json.load(f)
        for key in ('boxes', 'dds_pred', 'stds_ale', 'xyz_pred', 'angles', 'confs'):
            assert key in dic
        assert len(dic['dds_pred']) == len(dic['boxes']) > 0

    def test_predict_batched_matches_per_image(self, trained_model, tmp_path):
        """3+ images route through the chunked batched path; the json outputs
        must carry the same predictions as the per-image loop."""
        import shutil
        ann = os.path.join(HERE, 'fixture_002282.pifpaf.json')
        batch_dir = tmp_path / 'batched'
        single_dir = tmp_path / 'single'
        imgs = []
        for d in (batch_dir, single_dir):
            d.mkdir()
            for k in range(3):
                img = str(d / f'im{k}.png')
                shutil.copy(IMAGE, img)
                shutil.copy(ann, img + '.pifpaf.json')
                if d == batch_dir:
                    imgs.append(img)
        run_cli('predict', *imgs, '--mode', 'mono', '--model', trained_model,
                '--calibration', 'kitti', '--output_types', 'json',
                '-o', str(batch_dir))
        for k in range(3):  # per-image path: one image per invocation
            run_cli('predict', str(single_dir / f'im{k}.png'), '--mode',
                    'mono', '--model', trained_model, '--calibration', 'kitti',
                    '--output_types', 'json', '-o', str(single_dir))
        for k in range(3):
            with open(batch_dir / f'out_im{k}.png.monoloco.json') as f:
                got = json.load(f)
            with open(single_dir / f'out_im{k}.png.monoloco.json') as f:
                want = json.load(f)
            assert got.keys() == want.keys()
            np.testing.assert_allclose(got['dds_pred'], want['dds_pred'],
                                       rtol=1e-4)
            np.testing.assert_allclose(got['xyz_pred'], want['xyz_pred'],
                                       rtol=1e-3, atol=1e-4)

    def test_predict_social_distance(self, trained_model, tmp_path):
        out_dir = str(tmp_path)
        # frame fixture has no pifpaf json of its own: reuse the 002282 one
        import shutil
        ann = os.path.join(HERE, 'fixture_002282.pifpaf.json')
        img = os.path.join(out_dir, 'frame0032.jpg')
        shutil.copy(IMAGE_SD, img)
        shutil.copy(ann, os.path.join(out_dir, 'frame0032.pifpaf.json'))
        run_cli('predict', img, '--mode', 'mono', '--model', trained_model,
                '--activities', 'social_distance',
                '--output_types', 'front', 'bird', '-o', out_dir)
        assert os.path.exists(os.path.join(out_dir, 'out_frame0032.jpg.front.png'))
        assert os.path.exists(os.path.join(out_dir, 'out_frame0032.jpg.bird.png'))

    def test_predict_raise_hand_and_social_distance(self, trained_model, tmp_path):
        """Reference README hand-raising journey (README.md:204-207):
        predict --activities raise_hand social_distance --output_types front."""
        out_dir = str(tmp_path)
        import shutil
        ann = os.path.join(HERE, 'fixture_002282.pifpaf.json')
        img = os.path.join(out_dir, 'raising_hand.jpg')
        shutil.copy(IMAGE_SD, img)
        shutil.copy(ann, os.path.join(out_dir, 'raising_hand.pifpaf.json'))
        run_cli('predict', img, '--mode', 'mono', '--model', trained_model,
                '--activities', 'raise_hand', 'social_distance',
                '--output_types', 'front', 'json', '-o', out_dir)
        assert os.path.exists(os.path.join(out_dir, 'out_raising_hand.jpg.front.png'))
        with open(os.path.join(out_dir, 'out_raising_hand.jpg.monoloco.json')) as f:
            dic = json.load(f)
        # the raise-hand decision list is emitted alongside social distance
        assert 'raising_hand' in dic and len(dic['raising_hand']) == len(dic['boxes'])
        assert 'social_distance' in dic


class TestTrainStereo:
    def test_train_stereo(self, tmp_path):
        path = str(tmp_path / 'stereo.pkl')
        run_cli('train', '--joints', JOINTS_STEREO, '--mode', 'stereo',
                '--epochs', '3', '--hidden_size', '64', '--out', path)
        assert os.path.exists(path)

    def test_predict_stereo_pair(self, tmp_path):
        # Train a tiny stereo model, then predict on an L/R pair.
        path = str(tmp_path / 'stereo.pkl')
        run_cli('train', '--joints', JOINTS_STEREO, '--mode', 'stereo',
                '--epochs', '2', '--hidden_size', '64', '--out', path)
        import shutil
        out_dir = str(tmp_path)
        img_l = os.path.join(out_dir, 'pair_000840.png')
        img_r = os.path.join(out_dir, 'pair_000840_right.png')
        ann = os.path.join(HERE, 'fixture_002282.pifpaf.json')
        shutil.copy(os.path.join(HERE, 'fixture_000840.png'), img_l)
        shutil.copy(os.path.join(HERE, 'fixture_000840_right.png'), img_r)
        shutil.copy(ann, img_l + '.pifpaf.json')
        shutil.copy(ann, img_r + '.pifpaf.json')
        run_cli('predict', img_l, img_r, '--mode', 'stereo', '--model', path,
                '--calibration', 'kitti',
                '--output_types', 'multi', '-o', out_dir)
        assert os.path.exists(os.path.join(out_dir, 'out_pair_000840.png.multi.png'))


def test_eval_generate_dp_devices(tmp_path):
    """CLI wiring for mesh-sharded generation: `eval --generate --dp_devices 8`
    builds the mesh in run.py and produces the same txt set as --dp_devices 1."""
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    from make_synthetic_kitti import make_dataset
    import shutil
    make_dataset(str(tmp_path), n_train=4, n_val=4, seed=23)

    import jax  # host-side only: build a random checkpoint for the eval
    from monoloco_tpu.models import init_loco_params
    from monoloco_tpu.models.checkpoint import save_checkpoint
    os.makedirs(tmp_path / 'data' / 'outputs', exist_ok=True)
    os.makedirs(tmp_path / 'data' / 'logs', exist_ok=True)
    p, bn = init_loco_params(jax.random.PRNGKey(4), 34, 9, 64, 2)
    save_checkpoint(str(tmp_path / 'data' / 'outputs' / 'g.pkl'), p, bn, meta={})

    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''))

    def gen(dp, keep_as):
        cmd = [sys.executable, '-m', 'monoloco_tpu.run', 'eval', '--generate',
               '--dataset', 'kitti', '--dir_ann', 'annotations',
               '--model', 'data/outputs/g.pkl', '--hidden_size', '64',
               '--n_stage', '2', '--dp_devices', str(dp)]
        res = subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                             text=True, timeout=900)
        assert res.returncode == 0, f"{res.stdout}\n{res.stderr}"
        shutil.copytree(tmp_path / 'data' / 'kitti' / 'monoloco_pp',
                        tmp_path / keep_as)

    gen(1, 'single')
    gen(8, 'sharded')
    singles = sorted(os.listdir(tmp_path / 'single'))
    assert singles == sorted(os.listdir(tmp_path / 'sharded')) and singles
    for name in singles:
        a = (tmp_path / 'single' / name).read_bytes()
        b = (tmp_path / 'sharded' / name).read_bytes()
        assert a == b, name
