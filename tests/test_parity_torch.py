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
def test_reference_parity():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    res = subprocess.run([sys.executable, os.path.join(REPO, 'tools', 'parity_check.py')],
                         env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'PARITY: PASS' in res.stdout
