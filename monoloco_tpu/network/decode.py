"""Output decoding: raw network channels -> physical quantities.

Channel layout (MonoLoco++/MonStereo raw outputs, (m, 9|10)):
  0 theta (spherical azimuth-like), 1 psi, 2 d mean, 3 log-spread, 4-6 h/w/l,
  7-8 sin/cos of allocentric yaw, 9 stereo-aux logit.
Label layout ((m, 10|11)): 0 theta, 1 psi, 2 z, 3 d, 4-6 h/w/l, 7-8 sin/cos,
  9 yaw, 10 stereo-match flag.
Parity targets: /root/reference/monoloco/network/process.py:231-360.

All functions are jit-friendly jnp ops over full batches.
"""

import jax
import jax.numpy as jnp

from ..geometry import to_cartesian, back_correct_angles


def unnormalize_bi(loc):
    """(m, 2) [mu, log-spread] -> absolute Laplace spread b = exp(b_hat) * mu
    (process.py:125-133)."""
    return jnp.exp(loc[:, 1:2]) * loc[:, 0:1]


def laplace_sampling(outputs, n_samples, seed=1):
    """Sample (n_samples, m) from Laplace(mu=outputs[:,0], b=|outputs[:,1]|).

    The reference reseeds torch with seed 1 on every call (process.py:101-122);
    we mirror that determinism with a fixed PRNGKey.
    """
    outputs = jnp.asarray(outputs, dtype=jnp.float32)
    mu = outputs[:, 0]
    bi = jnp.abs(outputs[:, 1])
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (n_samples, mu.shape[0]), minval=-0.5 + 1e-7, maxval=0.5)
    return mu - bi * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))


_TASK_SLICES = {
    'x': (0, 1), 'y': (1, 2), 'd': (2, 4), 'h': (4, 5), 'w': (5, 6),
    'l': (6, 7), 'ori': (7, 9), 'aux': (9, 10),
}
_LABEL_SLICES = {
    'x': (0, 1), 'y': (1, 2), 'z': (2, 3), 'd': (3, 4), 'h': (4, 5),
    'w': (5, 6), 'l': (6, 7), 'ori': (7, 9), 'aux': (10, 11),
}


def extract_outputs(outputs, tasks=()):
    """Split raw outputs per task, or fully decode into physical quantities.

    With `tasks`, returns the ordered list of raw channel slices (training).
    Without, returns a dict with xyzd, d, bi, yaw (alpha, ry), h/w/l, ori, aux
    (sigmoid) — the prediction-time decoding of process.py:231-278.
    """
    outputs = jnp.asarray(outputs, dtype=jnp.float32)
    if len(tasks) >= 1:
        assert isinstance(tasks, tuple), "tasks need to be a tuple"
        return [outputs[:, slice(*_TASK_SLICES[t])] for t in tasks]

    dic_out = {k: outputs[:, slice(*s)] for k, s in _TASK_SLICES.items()
               if k != 'aux' or outputs.shape[1] == 10}
    bi = unnormalize_bi(dic_out['d'])

    x = to_cartesian(outputs[:, 0:3], mode='x')
    y = to_cartesian(outputs[:, 0:3], mode='y')
    d = dic_out['d'][:, 0:1]
    z = jnp.sqrt(jnp.maximum(d ** 2 - x ** 2 - y ** 2, 0.0))
    xyzd = jnp.concatenate([x, y, z, d], axis=1)

    yaw_pred = jnp.arctan2(dic_out['ori'][:, 0:1], dic_out['ori'][:, 1:2])
    yaw_orig = back_correct_angles(yaw_pred, xyzd[:, 0:3])

    out = {
        'xyzd': xyzd, 'd': d, 'bi': bi,
        'h': dic_out['h'], 'w': dic_out['w'], 'l': dic_out['l'],
        'ori': dic_out['ori'], 'yaw': (yaw_pred, yaw_orig),
    }
    if outputs.shape[1] == 10:
        out['aux'] = jax.nn.sigmoid(dic_out['aux'])
    return out


def extract_outputs_mono(outputs, tasks=None):
    """Decoding for the monoloco_p variant: direct xyz + [z, log-spread]
    channels (process.py:330-360)."""
    outputs = jnp.asarray(outputs, dtype=jnp.float32)
    raw = {'xyz': outputs[:, 0:3], 'zb': outputs[:, 2:4],
           'h': outputs[:, 4:5], 'w': outputs[:, 5:6], 'l': outputs[:, 6:7],
           'ori': outputs[:, 7:9]}
    if tasks is not None:
        assert isinstance(tasks, tuple), "tasks need to be a tuple"
        return [raw[t] for t in tasks]

    bi = unnormalize_bi(raw['zb'])
    dd = jnp.linalg.norm(raw['xyz'], axis=1, keepdims=True)
    xyzd = jnp.concatenate([raw['xyz'], dd], axis=1)
    yaw_pred = jnp.arctan2(raw['ori'][:, 0:1], raw['ori'][:, 1:2])
    yaw_orig = back_correct_angles(yaw_pred, xyzd[:, 0:3])
    return {**raw, 'xyzd': xyzd, 'd': dd, 'bi': bi, 'yaw': (yaw_pred, yaw_orig)}


def extract_labels(labels, tasks=None):
    """Slice label channels per task (process.py:293-304)."""
    labels = jnp.asarray(labels, dtype=jnp.float32)
    dic = {k: labels[:, slice(*s)] for k, s in _LABEL_SLICES.items()
           if s[1] <= labels.shape[1]}
    if tasks is not None:
        assert isinstance(tasks, tuple), "tasks need to be a tuple"
        return [dic[t] for t in tasks]
    return dic


def extract_labels_aux(labels, tasks=None):
    """Aux-only label view (process.py:281-290)."""
    labels = jnp.asarray(labels, dtype=jnp.float32)
    dic = {'aux': labels[:, 0:1]}
    if tasks is not None:
        assert isinstance(tasks, tuple), "tasks need to be a tuple"
        return [dic[t] for t in tasks]
    return dic


def cluster_outputs(outputs, clusters):
    """Reshape flat all-vs-all stereo outputs (m*r, c) -> (m, r, c)
    (process.py:307-316)."""
    outputs = jnp.asarray(outputs)
    if clusters == 0:
        clusters = max(1, round(outputs.shape[0] / 2))
    assert outputs.shape[0] % clusters == 0, "Unexpected number of inputs"
    return outputs.reshape(-1, clusters, outputs.shape[1])


def filter_outputs(outputs):
    """Keep, per left pose, the right-pairing with max auxiliary score
    (process.py:319-327). Returns ((m, c) best rows, (m, r) bool mask)."""
    val = outputs[:, :, -1]
    best = jnp.argmax(val, axis=1)
    mask = val >= val.max(axis=1, keepdims=True)
    selected = jnp.take_along_axis(outputs, best[:, None, None], axis=1)[:, 0, :]
    return selected, mask
