"""Residual-MLP localization models as pure functional JAX.

Two architectures with the same capabilities as the reference's
/root/reference/monoloco/network/architectures.py (studied for behavior only):

 - Loco (MonoLoco++ / MonStereo): Linear(in->h) + BN + ReLU + Dropout, then
   `num_stage` residual blocks, then a split head: a plain Linear h->h feeding
   both a 1-dim auxiliary head and a Linear+BN+ReLU+Dropout+Linear final head
   of (out-1) dims, concatenated to `out` dims (architectures.py:6-102).
 - Monoloco (legacy, 3d-pose-baseline style): Linear+BN+ReLU+Dropout, residual
   blocks, single output Linear (architectures.py:105-176).

TPU-first design decisions:
 - Parameters are plain pytrees; the residual stages are *stacked* along a
   leading axis and executed with `lax.scan`, so the trace stays O(1) in depth
   and XLA sees one fused block regardless of num_stage.
 - BatchNorm is functional and masked: training statistics can exclude padded
   rows, which lets the whole ragged-batch pipeline run with static shapes.
 - BatchNorm follows torch conventions (eps 1e-5, momentum 0.1, unbiased
   running variance) so reference-trained checkpoints evaluate identically.
 - `fold_eval_params` folds inference-mode BN into the preceding Linear,
   reducing the eval path to a chain of affine+ReLU ops — the shape consumed
   by the fused Pallas inference kernel in ops/fused_mlp.py.

Weights use (in, out) layout so forward matmuls are `x @ W` (MXU-friendly,
no transposes in the hot path).
"""

import functools
import math

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# Initialization (torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
# ---------------------------------------------------------------------------

def _init_linear(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        'w': jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        'b': jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _init_bn(size):
    return {'scale': jnp.ones((size,), jnp.float32), 'bias': jnp.zeros((size,), jnp.float32)}


def _init_bn_state(size):
    return {'mean': jnp.zeros((size,), jnp.float32), 'var': jnp.ones((size,), jnp.float32)}


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def init_loco_params(key, input_size, output_size, linear_size=1024, num_stage=3):
    """Initialize the Loco (MonoLoco++/MonStereo) model. Returns (params, bn_state)."""
    keys = jax.random.split(key, 6 + 2 * num_stage)
    params = {
        'w1': _init_linear(keys[0], input_size, linear_size),
        'bn1': _init_bn(linear_size),
        'w2': _init_linear(keys[1], linear_size, linear_size),
        'w3': _init_linear(keys[2], linear_size, linear_size),
        'bn3': _init_bn(linear_size),
        'w_aux': _init_linear(keys[3], linear_size, 1),
        'w_fin': _init_linear(keys[4], linear_size, output_size - 1),
        'stages': _stack([
            {
                'w1': _init_linear(keys[5 + 2 * i], linear_size, linear_size),
                'bn1': _init_bn(linear_size),
                'w2': _init_linear(keys[6 + 2 * i], linear_size, linear_size),
                'bn2': _init_bn(linear_size),
            }
            for i in range(num_stage)
        ]),
    }
    bn_state = {
        'bn1': _init_bn_state(linear_size),
        'bn3': _init_bn_state(linear_size),
        'stages': _stack([
            {'bn1': _init_bn_state(linear_size), 'bn2': _init_bn_state(linear_size)}
            for _ in range(num_stage)
        ]),
    }
    return params, bn_state


def init_monoloco_params(key, input_size, output_size, linear_size=256, num_stage=3):
    """Initialize the legacy Monoloco model. Returns (params, bn_state)."""
    keys = jax.random.split(key, 2 + 2 * num_stage)
    params = {
        'w1': _init_linear(keys[0], input_size, linear_size),
        'bn1': _init_bn(linear_size),
        'w2': _init_linear(keys[1], linear_size, output_size),
        'stages': _stack([
            {
                'w1': _init_linear(keys[2 + 2 * i], linear_size, linear_size),
                'bn1': _init_bn(linear_size),
                'w2': _init_linear(keys[3 + 2 * i], linear_size, linear_size),
                'bn2': _init_bn(linear_size),
            }
            for i in range(num_stage)
        ]),
    }
    bn_state = {
        'bn1': _init_bn_state(linear_size),
        'stages': _stack([
            {'bn1': _init_bn_state(linear_size), 'bn2': _init_bn_state(linear_size)}
            for _ in range(num_stage)
        ]),
    }
    return params, bn_state


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------

def _dense(p, x):
    return x @ p['w'] + p['b']


def _batch_norm(p, state, x, train, row_mask):
    """Masked functional BatchNorm1d with torch running-stat semantics.

    row_mask (m,) of {0,1} excludes padded rows from the batch statistics so a
    statically-padded partial batch trains exactly like a ragged one.
    Returns (y, new_state).
    """
    if train:
        if row_mask is None:
            n = x.shape[0]
            mean = x.mean(axis=0)
            var = ((x - mean) ** 2).mean(axis=0)
        else:
            w = row_mask[:, None]
            n = row_mask.sum()
            mean = (x * w).sum(axis=0) / n
            var = (((x - mean) ** 2) * w).sum(axis=0) / n
        y = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            'mean': (1 - BN_MOMENTUM) * state['mean'] + BN_MOMENTUM * mean,
            'var': (1 - BN_MOMENTUM) * state['var'] + BN_MOMENTUM * unbiased,
        }
    else:
        y = (x - state['mean']) * jax.lax.rsqrt(state['var'] + BN_EPS)
        new_state = state
    return y * p['scale'] + p['bias'], new_state


def _dropout(x, rng, p, train):
    if not train or p == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def _stage_block(stage_p, stage_s, y, bn_train, drop_on, drop_p, rngs, row_mask):
    h, s1 = _batch_norm(stage_p['bn1'], stage_s['bn1'], _dense(stage_p['w1'], y), bn_train, row_mask)
    h = _dropout(jax.nn.relu(h), rngs[0], drop_p, drop_on)
    h, s2 = _batch_norm(stage_p['bn2'], stage_s['bn2'], _dense(stage_p['w2'], h), bn_train, row_mask)
    h = _dropout(jax.nn.relu(h), rngs[1], drop_p, drop_on)
    return y + h, {'bn1': s1, 'bn2': s2}


def _run_stages(params, bn_state, y, bn_train, drop_on, drop_p, rng, row_mask):
    num_stage = jax.tree_util.tree_leaves(params['stages'])[0].shape[0]
    stage_rngs = (
        jax.random.split(rng, 2 * num_stage).reshape(num_stage, 2, 2)
        if rng is not None else jnp.zeros((num_stage, 2, 2), jnp.uint32)
    )

    def body(carry, xs):
        stage_p, stage_s, rngs = xs
        r = (rngs[0], rngs[1]) if rng is not None else (None, None)
        out, new_s = _stage_block(stage_p, stage_s, carry, bn_train, drop_on, drop_p, r, row_mask)
        return out, new_s

    y, new_stage_state = jax.lax.scan(body, y, (params['stages'], bn_state['stages'], stage_rngs))
    return y, new_stage_state


def loco_forward(params, bn_state, x, *, train=False, rng=None, p_dropout=0.2,
                 row_mask=None, mc_dropout=False):
    """Loco model forward. Returns (outputs (m, out), new_bn_state).

    mc_dropout=True keeps BN in eval mode but applies dropout — the MC-dropout
    epistemic-uncertainty regime of the reference (net.py:135-161, which
    re-enables only `model.dropout` at eval time; that flag gates every dropout
    call site since torch shares one module instance).
    """
    drop_on = train or mc_dropout
    if drop_on and rng is None:
        raise ValueError("rng required when dropout is active")
    r = jax.random.split(rng, 4) if drop_on else (None,) * 4

    y, s1 = _batch_norm(params['bn1'], bn_state['bn1'], _dense(params['w1'], x), train, row_mask)
    y = _dropout(jax.nn.relu(y), r[0], p_dropout, drop_on)

    y, stage_state = _run_stages(params, bn_state, y, train, drop_on, p_dropout,
                                 r[1] if drop_on else None, row_mask)

    y2 = _dense(params['w2'], y)
    aux = _dense(params['w_aux'], y2)
    y3, s3 = _batch_norm(params['bn3'], bn_state['bn3'], _dense(params['w3'], y2), train, row_mask)
    y3 = _dropout(jax.nn.relu(y3), r[2], p_dropout, drop_on)
    fin = _dense(params['w_fin'], y3)

    out = jnp.concatenate([fin, aux], axis=1)
    new_state = {'bn1': s1, 'bn3': s3, 'stages': stage_state}
    return out, new_state


def monoloco_forward(params, bn_state, x, *, train=False, rng=None, p_dropout=0.2,
                     row_mask=None, mc_dropout=False):
    """Legacy Monoloco model forward. Returns (outputs (m, out), new_bn_state)."""
    drop_on = train or mc_dropout
    if drop_on and rng is None:
        raise ValueError("rng required when dropout is active")
    r = jax.random.split(rng, 2) if drop_on else (None,) * 2

    y, s1 = _batch_norm(params['bn1'], bn_state['bn1'], _dense(params['w1'], x), train, row_mask)
    y = _dropout(jax.nn.relu(y), r[0], p_dropout, drop_on)
    y, stage_state = _run_stages(params, bn_state, y, train, drop_on, p_dropout,
                                 r[1] if drop_on else None, row_mask)
    out = _dense(params['w2'], y)
    return out, {'bn1': s1, 'stages': stage_state}


# ---------------------------------------------------------------------------
# BN folding for the fused inference path
# ---------------------------------------------------------------------------

def _fold(linear, bn, bn_state):
    """Fold eval-mode BN into the preceding linear: y = BN(xW + b).

    Works for single layers (w: (in, out)) and stacked stage layers
    (w: (S, in, out)) alike — the scale broadcasts over the last axis.
    """
    scale = bn['scale'] / jnp.sqrt(bn_state['var'] + BN_EPS)
    return {
        'w': linear['w'] * scale[..., None, :],
        'b': (linear['b'] - bn_state['mean']) * scale + bn['bias'],
    }


@functools.lru_cache(maxsize=None)
def _fold_program(arch):
    """Jitted BN-fold: one dispatch instead of ~25 eager ops (each eager op
    costs a compile + round trip through a remote backend at engine init)."""
    return jax.jit(functools.partial(_fold_eval_params_eager, arch=arch))


def fold_eval_params(params, bn_state, arch='loco'):
    return _fold_program(arch)(params, bn_state)


def _fold_eval_params_eager(params, bn_state, arch='loco'):
    """Collapse BN into affine layers for inference.

    Loco eval forward becomes:
      y = relu(x @ W0 + b0)
      for each stage: y += relu(relu(y @ Wa + ba) @ Wb + bb)
      y2 = y @ W2 + b2;  aux = y2 @ Waux + baux
      fin = relu(y2 @ W3f + b3f) @ Wfin + bfin
      out = [fin, aux]
    """
    if arch == 'loco':
        return {
            'l0': _fold(params['w1'], params['bn1'], bn_state['bn1']),
            'stages': {
                'a': _fold(params['stages']['w1'], params['stages']['bn1'], bn_state['stages']['bn1']),
                'b': _fold(params['stages']['w2'], params['stages']['bn2'], bn_state['stages']['bn2']),
            },
            'w2': dict(params['w2']),
            'w_aux': dict(params['w_aux']),
            'w3f': _fold(params['w3'], params['bn3'], bn_state['bn3']),
            'w_fin': dict(params['w_fin']),
        }
    if arch == 'monoloco':
        return {
            'l0': _fold(params['w1'], params['bn1'], bn_state['bn1']),
            'stages': {
                'a': _fold(params['stages']['w1'], params['stages']['bn1'], bn_state['stages']['bn1']),
                'b': _fold(params['stages']['w2'], params['stages']['bn2'], bn_state['stages']['bn2']),
            },
            'w2': dict(params['w2']),
        }
    raise ValueError(arch)


def folded_forward(folded, x, arch='loco'):
    """Reference (non-Pallas) implementation of the folded eval forward."""
    y = jax.nn.relu(_dense(folded['l0'], x))

    def body(carry, stage):
        h = jax.nn.relu(carry @ stage['a']['w'] + stage['a']['b'])
        h = jax.nn.relu(h @ stage['b']['w'] + stage['b']['b'])
        return carry + h, None

    y, _ = jax.lax.scan(body, y, folded['stages'])

    if arch == 'monoloco':
        return _dense(folded['w2'], y)
    y2 = _dense(folded['w2'], y)
    aux = _dense(folded['w_aux'], y2)
    fin = _dense(folded['w_fin'], jax.nn.relu(_dense(folded['w3f'], y2)))
    return jnp.concatenate([fin, aux], axis=1)


def count_params(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
