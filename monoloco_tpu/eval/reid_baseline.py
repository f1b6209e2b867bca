"""Person re-identification feature extractor (ResNet-50) for the stereo
association baseline — TPU-native JAX implementation.

Capability parity target: /root/reference/monoloco/eval/reid_baseline.py
(ResNet50 trunk, Market-1501 weights, 256x128 crops, 2048-d eval features).
Design differences: the network is a functional JAX pytree executed as ONE
jitted NHWC program on the accelerator; inference-mode BatchNorm is folded into
the convolutions at load time, and torch/torchvision checkpoints (the
reference's weight format) convert via `convert_torch_resnet50`.
"""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ..geometry.camera import open_image
from ..network.preprocess import _IMAGENET_MEAN, _IMAGENET_STD

BLOCKS = (3, 4, 6, 3)
EXPANSION = 4


def _conv(x, w, stride=1, padding='SAME'):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _bottleneck(params, x, stride):
    out = jax.nn.relu(_conv(x, params['conv1']['w'], 1) + params['conv1']['b'])
    out = jax.nn.relu(_conv(out, params['conv2']['w'], stride) + params['conv2']['b'])
    out = _conv(out, params['conv3']['w'], 1) + params['conv3']['b']
    if 'down' in params:
        x = _conv(x, params['down']['w'], stride) + params['down']['b']
    return jax.nn.relu(out + x)


def resnet50_features(params, x):
    """NHWC float input -> (n, 2048) pooled features. BN pre-folded into convs."""
    x = jax.nn.relu(_conv(x, params['conv1']['w'], 2) + params['conv1']['b'])
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), 'SAME')
    for li, n_blocks in enumerate(BLOCKS):
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and li > 0) else 1
            x = _bottleneck(params[f'layer{li + 1}'][bi], x, stride)
    return x.mean(axis=(1, 2))


def _fold_conv_bn(conv_w, bn):
    """Fold eval BN into a conv: returns (w_folded HWIO, bias)."""
    scale = bn['weight'] / np.sqrt(bn['running_var'] + 1e-5)
    w = np.transpose(conv_w, (2, 3, 1, 0)) * scale[None, None, None, :]
    b = bn['bias'] - bn['running_mean'] * scale
    return {'w': jnp.asarray(w, jnp.float32), 'b': jnp.asarray(b, jnp.float32)}


def convert_torch_resnet50(state_dict):
    """torchvision-style resnet50 state_dict (numpy values; optionally with a
    'base.' prefix as in the reference's Market-1501 checkpoint) -> folded
    params pytree."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace('base.', '')
        sd[k] = np.asarray(v)

    def bn(prefix):
        return {s: sd[f'{prefix}.{s}'] for s in
                ('weight', 'bias', 'running_mean', 'running_var')}

    # The reference checkpoint indexes children of nn.Sequential(resnet.children()):
    # 0=conv1, 1=bn1, 4..7=layer1..4 — support both namings.
    def get(name, alt):
        return name if any(k.startswith(name) for k in sd) else alt

    conv1_key = get('conv1', '0')
    bn1_key = get('bn1', '1')
    params = {'conv1': _fold_conv_bn(sd[f'{conv1_key}.weight'], bn(bn1_key))}
    layer_keys = {f'layer{i}': get(f'layer{i}', str(3 + i)) for i in range(1, 5)}
    for li, n_blocks in enumerate(BLOCKS):
        lname = f'layer{li + 1}'
        lkey = layer_keys[lname]
        blocks = []
        for bi in range(n_blocks):
            pre = f'{lkey}.{bi}'
            blk = {
                'conv1': _fold_conv_bn(sd[f'{pre}.conv1.weight'], bn(f'{pre}.bn1')),
                'conv2': _fold_conv_bn(sd[f'{pre}.conv2.weight'], bn(f'{pre}.bn2')),
                'conv3': _fold_conv_bn(sd[f'{pre}.conv3.weight'], bn(f'{pre}.bn3')),
            }
            if f'{pre}.downsample.0.weight' in sd:
                blk['down'] = _fold_conv_bn(sd[f'{pre}.downsample.0.weight'],
                                            bn(f'{pre}.downsample.1'))
            blocks.append(blk)
        params[lname] = blocks
    return params


# ---------------------------------------------------------------------------
# Tiny trainable embedding (in-container substitute for Market-1501 weights)
#
# This zero-egress container cannot download the reference's Market-1501
# checkpoint, so the resnet50 path cannot reproduce reference associations.
# The tiny net (3 strided convs + linear, ~25k params, L2-normalized 64-d
# features) is trained on synthetic identity textures
# (tools/train_tiny_reid.py on tools/make_synthetic_kitti.py crops) and
# shipped as tests/fixture_tiny_reid.pkl — it makes `eval --baselines`'s reid
# association MEANINGFUL on synthetic stereo scenes (measurably better than
# chance, tests/test_reid_synthetic.py). It is NOT a Market-1501 substitute
# for real images; pointing --reid_weights at a torch checkpoint still takes
# the converted-resnet50 path.
# ---------------------------------------------------------------------------

TINY_HEIGHT, TINY_WIDTH = 64, 32


def tiny_reid_features(params, x):
    """(n, 64, 32, 3) NHWC float input -> L2-normalized (n, 64) features."""
    for name in ('c1', 'c2', 'c3'):
        x = jax.nn.relu(_conv(x, params[name]['w'], stride=2)
                        + params[name]['b'])
    f = x.mean(axis=(1, 2))
    f = f @ params['fc']['w'] + params['fc']['b']
    return f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-8)


def init_tiny_reid(key, feat_dim=64):
    ks = jax.random.split(key, 4)

    def conv(k, cin, cout, ksize=3):
        w = jax.random.normal(k, (ksize, ksize, cin, cout)) \
            * np.sqrt(2.0 / (ksize * ksize * cin))
        return {'w': w.astype(jnp.float32), 'b': jnp.zeros((cout,), jnp.float32)}

    return {
        'c1': conv(ks[0], 3, 16),
        'c2': conv(ks[1], 16, 32),
        'c3': conv(ks[2], 32, 64),
        'fc': {'w': (jax.random.normal(ks[3], (64, feat_dim))
                     * np.sqrt(1.0 / 64)).astype(jnp.float32),
               'b': jnp.zeros((feat_dim,), jnp.float32)},
    }


def init_resnet50(key):
    """Random init (for tests / when no pretrained weights are available)."""
    params = {}
    k = iter(jax.random.split(key, 64))

    def conv(cin, cout, ksize):
        w = jax.random.normal(next(k), (ksize, ksize, cin, cout)) * np.sqrt(2.0 / (ksize * ksize * cin))
        return {'w': w.astype(jnp.float32), 'b': jnp.zeros((cout,), jnp.float32)}

    params['conv1'] = conv(3, 64, 7)
    cin = 64
    for li, n_blocks in enumerate(BLOCKS):
        width = 64 * (2 ** li)
        blocks = []
        for bi in range(n_blocks):
            blk = {'conv1': conv(cin, width, 1), 'conv2': conv(width, width, 3),
                   'conv3': conv(width, width * EXPANSION, 1)}
            if bi == 0:
                blk['down'] = conv(cin, width * EXPANSION, 1)
            blocks.append(blk)
            cin = width * EXPANSION
        params[f'layer{li + 1}'] = blocks
    return params


class ReID:
    """Crop-and-embed person images with a jitted ResNet-50."""

    def __init__(self, weights_path=None, device=None, num_classes=751,
                 height=256, width=128):
        self.height, self.width = height, width
        self._features = resnet50_features
        if weights_path and self._try_load_tiny(weights_path):
            pass
        elif weights_path:
            import torch
            checkpoint = torch.load(weights_path, map_location='cpu')
            if hasattr(checkpoint, 'state_dict'):
                checkpoint = checkpoint.state_dict()
            sd = {k: v.numpy() for k, v in checkpoint.items()
                  if hasattr(v, 'numpy')}
            self.params = convert_torch_resnet50(sd)
            self.pretrained = True
            print(f"Loaded pretrained ReID weights from '{weights_path}'")
        else:
            import warnings
            self.params = init_resnet50(jax.random.PRNGKey(1))
            self.pretrained = False
            # Never run this baseline silently untrained: without Market-1501
            # weights (reference reid_baseline.py:30-88) the features are
            # random and the stereo associations meaningless.
            warnings.warn(
                "ReID baseline is running with RANDOMLY INITIALIZED weights — "
                "no Market-1501 checkpoint was provided; its stereo "
                "associations are meaningless. Place converted weights at "
                "data/models/reid_model_market.pkl to fix.",
                RuntimeWarning, stacklevel=2)
            print("!" * 79)
            print("! WARNING: ReID running UNTRAINED (random features) — "
                  "reid txts are invalid !")
            print("!" * 79)
        self._forward = jax.jit(self._features)

    def _try_load_tiny(self, weights_path):
        """Load a tiny-embedding checkpoint (format 'tiny_reid-v1', written by
        tools/train_tiny_reid.py). Returns False for any other file so the
        torch/Market-1501 path handles it."""
        import pickle
        try:
            with open(weights_path, 'rb') as f:
                blob = pickle.load(f)
        except Exception:  # noqa: BLE001 — torch pickles need torch.load
            return False
        if not (isinstance(blob, dict) and blob.get('format') == 'tiny_reid-v1'):
            return False
        self.params = jax.tree_util.tree_map(jnp.asarray, blob['params'])
        self.height = int(blob.get('height', TINY_HEIGHT))
        self.width = int(blob.get('width', TINY_WIDTH))
        self._features = tiny_reid_features
        self.pretrained = True
        print(f"Loaded tiny synthetic-texture ReID weights from "
              f"'{weights_path}' (NOT Market-1501 — meaningful on synthetic "
              f"scenes only)")
        return True

    def _preprocess(self, images):
        batch = []
        for im in images:
            im = im.resize((self.width, self.height), Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
            arr = (arr - _IMAGENET_MEAN) / _IMAGENET_STD
            batch.append(arr)
        return jnp.asarray(np.stack(batch))

    def forward(self, images):
        x = self._preprocess(images)
        return np.asarray(self._forward(self.params, x))


def get_reid_features(reid_net, boxes, boxes_r, path_image, path_image_r):
    """Crop detections from both images and embed them
    (reference reid_baseline.py:13-27)."""
    pil_image = open_image(path_image)
    pil_image_r = open_image(path_image_r)
    assert boxes and boxes_r
    crops = [pil_image.crop((b[0], b[1], b[2], b[3])) for b in boxes]
    crops_r = [pil_image_r.crop((b[0], b[1], b[2], b[3])) for b in boxes_r]
    return reid_net.forward(crops), reid_net.forward(crops_r)
