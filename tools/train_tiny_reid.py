"""Train the tiny synthetic-texture ReID embedding and ship it as a fixture.

The zero-egress container cannot obtain the reference's Market-1501 ResNet-50
checkpoint (reference eval/reid_baseline.py:30-88), so the stereo `reid`
association baseline would otherwise run on random features. This trains the
~25k-param tiny embedding (monoloco_tpu/eval/reid_baseline.py
tiny_reid_features) on crops drawn with the SAME per-identity texture
generator the synthetic KITTI scenes use (tools/make_synthetic_kitti.py
identity_texture), making the baseline meaningful on synthetic stereo scenes:
same-identity L/R crops embed close, different identities far.

Objective: softmax identity classification (head discarded after training);
features are L2-normalized, so the association cost (stereo_baselines.py:81,
raw L2) is a monotone function of cosine similarity.

Usage: python tools/train_tiny_reid.py [out.pkl]   (default: the test fixture)
"""

import os
import pickle
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_synthetic_kitti import identity_texture                  # noqa: E402
from monoloco_tpu.eval.reid_baseline import (                      # noqa: E402
    TINY_HEIGHT, TINY_WIDTH, init_tiny_reid, tiny_reid_features)
from monoloco_tpu.network.preprocess import (                      # noqa: E402
    _IMAGENET_MEAN, _IMAGENET_STD)

N_IDENTITIES = 64
CROPS_PER_ID = 8
STEPS = int(os.environ.get('TINY_REID_STEPS', '240'))
BATCH = 128
LR = 3e-3


def make_crop(identity, rng):
    """One augmented crop of an identity: texture rendered at a jittered
    size, pasted with offset into the fixed crop frame, pixel noise — the
    same variation a real box crop sees between the L and R cameras."""
    h = rng.randint(int(TINY_HEIGHT * 0.7), TINY_HEIGHT * 2)
    w = rng.randint(int(TINY_WIDTH * 0.7), TINY_WIDTH * 2)
    tex = identity_texture(identity, h, w, noise_rng=rng).astype(np.float32)
    # Resize to the embedding input frame (nearest neighbor is plenty here).
    ys = (np.arange(TINY_HEIGHT) * h / TINY_HEIGHT).astype(int)
    xs = (np.arange(TINY_WIDTH) * w / TINY_WIDTH).astype(int)
    crop = tex[ys][:, xs]
    crop += rng.randn(*crop.shape) * 8.0
    crop = np.clip(crop, 0, 255) / 255.0
    return (crop - _IMAGENET_MEAN) / _IMAGENET_STD


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'tests', 'fixture_tiny_reid.pkl')
    rng = np.random.RandomState(0)
    xs = np.stack([make_crop(i, rng)
                   for i in range(N_IDENTITIES) for _ in range(CROPS_PER_ID)])
    ys = np.repeat(np.arange(N_IDENTITIES), CROPS_PER_ID)
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys)

    key = jax.random.PRNGKey(0)
    params = init_tiny_reid(key)
    head = (jax.random.normal(jax.random.PRNGKey(7), (64, N_IDENTITIES))
            * 0.1).astype(jnp.float32)
    trainable = {'net': params, 'head': head}
    opt = optax.adam(LR)
    opt_state = opt.init(trainable)

    def loss_fn(trainable, x, y):
        feats = tiny_reid_features(trainable['net'], x)
        logits = feats @ trainable['head'] * 10.0     # normalized feats: scale
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def step(trainable, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, x, y)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    t0 = time.time()
    order_rng = np.random.RandomState(2)
    for i in range(STEPS):
        idx = order_rng.randint(0, xs.shape[0], size=BATCH)
        trainable, opt_state, loss = step(trainable, opt_state, xs[idx],
                                          ys[idx])
        if i % 20 == 0 or i == STEPS - 1:
            print(f'step {i}: loss {float(loss):.4f} '
                  f'[{time.time() - t0:.0f}s]', flush=True)

    # Holdout check: unseen crops of seen + UNSEEN identities must associate
    # by nearest neighbor (the actual downstream use).
    rng_h = np.random.RandomState(1)
    test_ids = list(range(N_IDENTITIES)) + list(range(5000, 5032))
    a = jnp.asarray(np.stack([make_crop(i, rng_h) for i in test_ids]))
    b = jnp.asarray(np.stack([make_crop(i, rng_h) for i in test_ids]))
    fa = np.asarray(tiny_reid_features(trainable['net'], a))
    fb = np.asarray(tiny_reid_features(trainable['net'], b))
    d = np.linalg.norm(fa[:, None, :] - fb[None, :, :], axis=2)
    acc = float(np.mean(np.argmin(d, axis=1) == np.arange(len(test_ids))))
    print(f'holdout nearest-neighbor accuracy: {acc:.3f} '
          f'({len(test_ids)} identities, 32 unseen) '
          f'[{time.time() - t0:.0f}s]')
    assert acc > 0.8, 'tiny ReID failed to learn the texture space'

    blob = {
        'format': 'tiny_reid-v1',
        'params': jax.tree_util.tree_map(np.asarray, trainable['net']),
        'height': TINY_HEIGHT, 'width': TINY_WIDTH,
        'meta': {'identities': N_IDENTITIES, 'steps': STEPS,
                 'holdout_nn_acc': acc},
    }
    with open(out_path, 'wb') as f:
        pickle.dump(blob, f)
    print(f'saved {out_path}')


if __name__ == '__main__':
    main()
