"""Generate test fixtures for monoloco_tpu.

Derives small, schema-compatible fixtures from the reference repo's sample
data (subsampled + re-serialized, not copied): joints JSONs for mono/stereo
training smoke tests, a pifpaf prediction json for the predict test, and a
synthetic test image of matching size.

Run once: python tools/make_fixtures.py
"""

import json
import os
import random

from PIL import Image

REF = '/root/reference/tests'
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests')


def subsample_joints(src, dst, n_train, n_val, seed):
    with open(src) as f:
        dic = json.load(f)
    rng = random.Random(seed)
    out = {'version': dic.get('version', 'fixture-0.1'), 'test': dic.get('test', {})}
    for phase, keep in (('train', n_train), ('val', n_val)):
        entries = list(zip(dic[phase]['X'], dic[phase]['Y'], dic[phase]['names'], dic[phase]['kps']))
        rng.shuffle(entries)
        entries = entries[:keep]
        xs, ys, names, kps = zip(*entries)
        clst = {}
        for bin_name in dic[phase]['clst']:
            clst[bin_name] = {'X': [], 'Y': [], 'kps': []}
        for x, y, _, kp in entries:
            dd = y[3]
            if dd <= 10:
                b = '10'
            elif dd <= 20:
                b = '20'
            elif dd <= 30:
                b = '30'
            elif dd <= 40:
                b = '40'
            else:
                b = '>40'
            if b in clst:
                clst[b]['X'].append(x)
                clst[b]['Y'].append(y)
                clst[b]['kps'].append(kp)
        out[phase] = {'X': list(xs), 'Y': list(ys), 'names': list(names),
                      'kps': list(kps), 'K': dic[phase].get('K', []), 'clst': clst}
    with open(dst, 'w') as f:
        json.dump(out, f)
    print(f"wrote {dst}: train={n_train} val={n_val}")


def subsample_pifpaf(src, dst, keep_every=1):
    with open(src) as f:
        anns = json.load(f)
    anns = anns[::keep_every]
    with open(dst, 'w') as f:
        json.dump(anns, f, indent=1)
    print(f"wrote {dst}: {len(anns)} annotations")


def synthetic_image(ref_image, dst):
    with Image.open(ref_image) as im:
        size = im.size
    img = Image.new('RGB', size, (96, 96, 96))
    img.save(dst)
    print(f"wrote {dst}: {size}")


def main():
    os.makedirs(OUT, exist_ok=True)
    subsample_joints(os.path.join(REF, 'sample_joints-kitti-mono.json'),
                     os.path.join(OUT, 'fixture_joints-kitti-mono.json'),
                     n_train=260, n_val=130, seed=11)
    subsample_joints(os.path.join(REF, 'sample_joints-kitti-stereo.json'),
                     os.path.join(OUT, 'fixture_joints-kitti-stereo.json'),
                     n_train=260, n_val=130, seed=13)
    subsample_pifpaf(os.path.join(REF, '002282.png.pifpaf.json'),
                     os.path.join(OUT, 'fixture_002282.pifpaf.json'))
    synthetic_image('/root/reference/docs/002282.png', os.path.join(OUT, 'fixture_002282.png'))
    synthetic_image('/root/reference/docs/frame0032.jpg', os.path.join(OUT, 'fixture_frame0032.jpg'))
    synthetic_image('/root/reference/docs/000840.png', os.path.join(OUT, 'fixture_000840.png'))
    synthetic_image('/root/reference/docs/000840_right.png', os.path.join(OUT, 'fixture_000840_right.png'))


if __name__ == '__main__':
    main()
