"""Checkpoint save/load with reference-checkpoint interop.

Native format: a pickle holding numpy pytrees (params + BN state + metadata) —
loadable with no framework dependencies. The loader also accepts a PyTorch
``state_dict`` pickle produced by the reference implementation
(/root/reference/monoloco/train/trainer.py:240-242 saves `model.state_dict()`),
converting torch (out, in) Linear layout into our (in, out) layout and
re-stacking the per-stage blocks along the scan axis. This allows published
reference checkpoints to be served by the TPU inference path directly.
"""

import json
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from .loco import _stack

FORMAT_TAG = 'monoloco_tpu-v1'


def _is_orbax_path(path):
    return str(path).endswith('.orbax')


def save_checkpoint(path, params, bn_state, meta=None):
    """Save (params, bn_state, meta). A path ending in `.orbax` writes an
    orbax-checkpoint directory (the JAX ecosystem's async/multi-host format,
    per SURVEY.md section 5) instead of the default pickle blob."""
    blob = {
        'format': FORMAT_TAG,
        'params': jax.tree_util.tree_map(np.asarray, params),
        'bn_state': jax.tree_util.tree_map(np.asarray, bn_state),
        'meta': meta or {},
    }
    if _is_orbax_path(path):
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            # orbax stores arrays; JSON-encode the (small) metadata dict
            blob['meta'] = json.dumps(blob['meta'])
            ckptr.save(os.path.abspath(path), blob, force=True)
        return
    with open(path, 'wb') as f:
        pickle.dump(blob, f)


def save_train_state(path, blob):
    """Persist the FULL training blob: serving weights (best-val 'params' /
    'bn_state'), resume state ('opt_state', 'final_params', 'final_bn_state',
    'log_sigmas'), and 'meta' (epoch, mode, ...). Pickle paths store the blob
    verbatim; `.orbax` paths write everything into the orbax directory so
    --resume round-trips from it (SURVEY.md section 5 checkpoint/resume).

    Orbax encodings: 'meta' is JSON (strings aren't arrays); 'log_sigmas' is
    flag-prefixed ([0.] when absent, [1., *values] when auto-tune) because
    orbax rejects zero-size arrays and the pytree structure must match the
    restore template regardless of the auto-tune setting.
    """
    if not _is_orbax_path(path):
        with open(path, 'wb') as f:
            pickle.dump(blob, f)
        return
    import orbax.checkpoint as ocp
    b = {k: v for k, v in blob.items()
         if k not in ('format', 'meta', 'log_sigmas')}
    b['meta'] = json.dumps(blob.get('meta', {}))
    ls = blob.get('log_sigmas')
    b['log_sigmas'] = (
        np.concatenate([np.ones(1, np.float32), np.asarray(ls, np.float32)])
        if ls is not None else np.zeros(1, np.float32))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), b, force=True)


def load_train_state(path, params_template, bn_template, opt_state_template):
    """Load a full training blob saved by save_train_state (pickle or .orbax).

    Orbax restores are template-free (params/BN trees are plain nested dicts
    that round-trip as-is); the optimizer state is re-hung on the resuming
    Trainer's `opt_state_template` treedef, restoring optax's nested
    namedtuples. When the leaf counts disagree — the checkpoint was trained
    with the opposite auto_tune_mtl setting, which changes the trainable
    tree — 'opt_state' is omitted so the caller's flag check reports the real
    mismatch instead of an orbax structure error. Returns a dict in the
    pickle-blob layout ('log_sigmas' is None or an array, 'meta' a dict).
    """
    if not _is_orbax_path(path):
        with open(path, 'rb') as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp
    _ = (params_template, bn_template)
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    ls = np.asarray(raw['log_sigmas'])
    blob = {
        'format': FORMAT_TAG,
        'params': raw['params'],
        'bn_state': raw['bn_state'],
        'final_params': raw['final_params'],
        'final_bn_state': raw['final_bn_state'],
        'log_sigmas': ls[1:] if ls[0] > 0.5 else None,
        'meta': json.loads(raw['meta'] or '{}'),
    }
    treedef = jax.tree_util.tree_structure(opt_state_template)
    leaves = jax.tree_util.tree_leaves(raw['opt_state'])
    if len(leaves) == treedef.num_leaves:
        # Leaf order matches: orbax serializes namedtuples by field order and
        # dicts by sorted key, exactly how jax flattens the template.
        blob['opt_state'] = jax.tree_util.tree_unflatten(treedef, leaves)
    return blob


def load_checkpoint(path, arch='loco'):
    """Load a native (pickle or .orbax directory) or reference (torch
    state_dict) checkpoint. Returns (params, bn_state, meta) as jnp pytrees.
    """
    if _is_orbax_path(path) and os.path.isdir(path):
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            blob = ckptr.restore(os.path.abspath(path))
        to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        return (to_jnp(blob['params']), to_jnp(blob['bn_state']),
                json.loads(blob.get('meta', '{}')))
    try:
        with open(path, 'rb') as f:
            blob = pickle.load(f)
        if isinstance(blob, dict) and blob.get('format') == FORMAT_TAG:
            to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
            return to_jnp(blob['params']), to_jnp(blob['bn_state']), blob.get('meta', {})
    except (pickle.UnpicklingError, ModuleNotFoundError, AttributeError, EOFError):
        pass

    # Fall back to a torch state_dict pickle.
    import torch  # local import: torch is only needed for reference checkpoints
    state = torch.load(path, map_location='cpu')
    if hasattr(state, 'state_dict'):
        state = state.state_dict()
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()
                if 'num_batches_tracked' not in k}
    # The two reference architectures differ by the post-stage layers; correct
    # a mismatched arch hint from the key set ('w3' exists only in LocoModel)
    # so callers without prior knowledge (e.g. tools/export_torch.py) still
    # load legacy MonoLoco state_dicts.
    if arch == 'loco' and 'w3.weight' not in np_state:
        arch = 'monoloco'
    elif arch == 'monoloco' and 'w3.weight' in np_state:
        arch = 'loco'
    params, bn_state = convert_torch_state_dict(np_state, arch=arch)
    net = 'monoloco' if arch == 'monoloco' else None
    return params, bn_state, {'source': 'torch', 'net': net}


def _linear(sd, prefix):
    return {'w': jnp.asarray(sd[prefix + '.weight'].T), 'b': jnp.asarray(sd[prefix + '.bias'])}


def _bn(sd, prefix):
    return (
        {'scale': jnp.asarray(sd[prefix + '.weight']), 'bias': jnp.asarray(sd[prefix + '.bias'])},
        {'mean': jnp.asarray(sd[prefix + '.running_mean']), 'var': jnp.asarray(sd[prefix + '.running_var'])},
    )


def _unstack(tree):
    """Inverse of loco._stack: split the scan-stacked stage pytree back into a
    list of per-stage pytrees."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    n = leaves[0].shape[0]
    return [jax.tree_util.tree_unflatten(treedef, [np.asarray(l[i]) for l in leaves])
            for i in range(n)]


def export_torch_state_dict(params, bn_state, arch='loco'):
    """Inverse of convert_torch_state_dict: (params, bn_state) -> a dict keyed
    exactly like the reference model's ``state_dict()`` (torch Linear layout:
    weight (out, in); BN running stats + num_batches_tracked), so checkpoints
    trained here load into the reference architectures with
    ``load_state_dict(strict=True)`` (reference network/architectures.py:6-176).

    Values are numpy arrays; pass through ``torch.save({k: torch.tensor(v)...})``
    for a reference-consumable .pkl (tools/export_torch.py does this).
    """
    sd = {}

    def put_linear(prefix, lin):
        sd[prefix + '.weight'] = np.ascontiguousarray(np.asarray(lin['w']).T)
        sd[prefix + '.bias'] = np.asarray(lin['b'])

    def put_bn(prefix, bn_p, bn_s):
        sd[prefix + '.weight'] = np.asarray(bn_p['scale'])
        sd[prefix + '.bias'] = np.asarray(bn_p['bias'])
        sd[prefix + '.running_mean'] = np.asarray(bn_s['mean'])
        sd[prefix + '.running_var'] = np.asarray(bn_s['var'])
        sd[prefix + '.num_batches_tracked'] = np.zeros((), np.int64)

    put_linear('w1', params['w1'])
    put_bn('batch_norm1', params['bn1'], bn_state['bn1'])
    for i, (sp, ss) in enumerate(zip(_unstack(params['stages']),
                                     _unstack(bn_state['stages']))):
        pre = f'linear_stages.{i}'
        put_linear(f'{pre}.w1', sp['w1'])
        put_bn(f'{pre}.batch_norm1', sp['bn1'], ss['bn1'])
        put_linear(f'{pre}.w2', sp['w2'])
        put_bn(f'{pre}.batch_norm2', sp['bn2'], ss['bn2'])
    if arch == 'loco':
        put_linear('w2', params['w2'])
        put_linear('w3', params['w3'])
        put_bn('batch_norm3', params['bn3'], bn_state['bn3'])
        put_linear('w_aux', params['w_aux'])
        put_linear('w_fin', params['w_fin'])
    elif arch == 'monoloco':
        put_linear('w2', params['w2'])
    else:
        raise ValueError(arch)
    return sd


def convert_torch_state_dict(sd, arch='loco'):
    """Convert a reference state_dict (numpy values) into (params, bn_state)."""
    num_stage = len({k.split('.')[1] for k in sd if k.startswith('linear_stages.')})
    stage_p, stage_s = [], []
    for i in range(num_stage):
        pre = f'linear_stages.{i}'
        b1p, b1s = _bn(sd, f'{pre}.batch_norm1')
        b2p, b2s = _bn(sd, f'{pre}.batch_norm2')
        stage_p.append({'w1': _linear(sd, f'{pre}.w1'), 'bn1': b1p,
                        'w2': _linear(sd, f'{pre}.w2'), 'bn2': b2p})
        stage_s.append({'bn1': b1s, 'bn2': b2s})

    bn1p, bn1s = _bn(sd, 'batch_norm1')
    if arch == 'loco':
        bn3p, bn3s = _bn(sd, 'batch_norm3')
        params = {
            'w1': _linear(sd, 'w1'), 'bn1': bn1p,
            'w2': _linear(sd, 'w2'), 'w3': _linear(sd, 'w3'), 'bn3': bn3p,
            'w_aux': _linear(sd, 'w_aux'), 'w_fin': _linear(sd, 'w_fin'),
            'stages': _stack(stage_p),
        }
        bn_state = {'bn1': bn1s, 'bn3': bn3s, 'stages': _stack(stage_s)}
    elif arch == 'monoloco':
        params = {
            'w1': _linear(sd, 'w1'), 'bn1': bn1p,
            'w2': _linear(sd, 'w2'),
            'stages': _stack(stage_p),
        }
        bn_state = {'bn1': bn1s, 'stages': _stack(stage_s)}
    else:
        raise ValueError(arch)
    return params, bn_state
