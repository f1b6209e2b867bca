"""Numerical parity against the reference PyTorch implementation.

Marked slow (torch import takes minutes on this box); run explicitly with
  python -m pytest tests/test_parity_torch.py -m slow -q
or directly: python tools/parity_check.py
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir('/root/reference/monoloco'),
                    reason='reference checkout not available')
def test_reference_parity():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    res = subprocess.run([sys.executable, os.path.join(REPO, 'tools', 'parity_check.py')],
                         env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'PARITY: PASS' in res.stdout


@pytest.mark.slow
def test_export_tool_roundtrip(tmp_path):
    """tools/export_torch.py end-to-end (no reference checkout needed): save a
    native checkpoint, export it to a torch state_dict pickle, load the export
    back through our torch-format loader, and compare eval forwards exactly."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    src, dst = str(tmp_path / 'native.pkl'), str(tmp_path / 'torch.pkl')
    prog = f"""
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from monoloco_tpu.models import init_loco_params, loco_forward
from monoloco_tpu.models.checkpoint import save_checkpoint, load_checkpoint
params, bn = init_loco_params(jax.random.PRNGKey(3), 34, 9, 64, 2)
save_checkpoint({src!r}, params, bn, meta={{'net': 'monoloco_pp'}})
import subprocess, sys
r = subprocess.run([sys.executable, 'tools/export_torch.py', {src!r}, {dst!r}])
assert r.returncode == 0
p2, bn2, meta = load_checkpoint({dst!r})  # torch-format fallback loader
assert meta.get('source') == 'torch'
x = jax.numpy.asarray(np.random.RandomState(0).randn(8, 34).astype('float32'))
a, _ = loco_forward(params, bn, x)
b, _ = loco_forward(p2, bn2, x)
np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print('EXPORT ROUNDTRIP OK')
"""
    res = subprocess.run([sys.executable, '-c', prog], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'EXPORT ROUNDTRIP OK' in res.stdout


@pytest.mark.slow
def test_legacy_torch_arch_autodetect(tmp_path):
    """A legacy MonoLoco torch state_dict (no 'w3') loads through the torch
    fallback even with the default arch hint: the key set corrects the arch
    and meta carries net='monoloco' for tools/export_torch.py."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    path = str(tmp_path / 'legacy.pkl')
    prog = f"""
import jax; jax.config.update('jax_platforms', 'cpu')
import collections, numpy as np, torch
from monoloco_tpu.models import init_monoloco_params, monoloco_forward
from monoloco_tpu.models.checkpoint import export_torch_state_dict, load_checkpoint
p, bn = init_monoloco_params(jax.random.PRNGKey(2), 34, 2, 64, 2)
sd = export_torch_state_dict(p, bn, arch='monoloco')
torch.save(collections.OrderedDict((k, torch.tensor(v)) for k, v in sd.items()), {path!r})
p2, bn2, meta = load_checkpoint({path!r})
assert meta == {{'source': 'torch', 'net': 'monoloco'}}, meta
x = jax.numpy.asarray(np.random.RandomState(0).randn(4, 34).astype('float32'))
a, _ = monoloco_forward(p, bn, x); b, _ = monoloco_forward(p2, bn2, x)
np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print('LEGACY AUTODETECT OK')
"""
    res = subprocess.run([sys.executable, '-c', prog], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'LEGACY AUTODETECT OK' in res.stdout
