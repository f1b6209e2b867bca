"""Persistent XLA compilation cache (utils/compile_cache.py).

The cache is the production answer to the one-time remote-compile cost of the
fused training program (PARITY.md "Training wall"): compiled executables are
serialized to disk and reloaded by later processes. Verified here on the CPU
backend: enabling populates the directory, a fresh process gets a cache hit,
and the env-var controls (custom dir / disable) behave.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from monoloco_tpu.utils import enable_compilation_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _restore_session_cache_dir():
    """These tests repoint jax_compilation_cache_dir at tmp dirs; restore the
    session-wide cache (enabled in conftest.py) so later tests don't write
    compiled executables into a deleted tmp_path."""
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update('jax_compilation_cache_dir', before)


def test_enable_creates_dir_and_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv('MONOLOCO_TPU_COMPILE_CACHE', raising=False)
    target = tmp_path / 'xla_cache'
    got = enable_compilation_cache(str(target))
    assert got == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_env_var_selects_directory(tmp_path, monkeypatch):
    target = tmp_path / 'from_env'
    monkeypatch.setenv('MONOLOCO_TPU_COMPILE_CACHE', str(target))
    assert enable_compilation_cache() == str(target)
    assert target.is_dir()


@pytest.mark.parametrize('value', ['0', 'off', 'FALSE', ' no '])
def test_env_var_disables(value, monkeypatch):
    monkeypatch.setenv('MONOLOCO_TPU_COMPILE_CACHE', value)
    assert enable_compilation_cache() is None


def test_unwritable_path_degrades_to_uncached(monkeypatch):
    monkeypatch.delenv('MONOLOCO_TPU_COMPILE_CACHE', raising=False)
    assert enable_compilation_cache('/proc/definitely/not/writable') is None


def test_cache_populates_and_hits_across_processes(tmp_path):
    """Two fresh interpreters compile the same program; the second must load
    it from the persistent cache (observed via JAX's cache-hit logger)."""
    cache = str(tmp_path / 'xc')
    snippet = (
        "import logging, sys\n"
        "logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from monoloco_tpu.utils import enable_compilation_cache\n"
        f"enable_compilation_cache({cache!r}, min_compile_seconds=0.0)\n"
        "from monoloco_tpu.models import init_loco_params, loco_forward\n"
        "params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)\n"
        "x = jnp.ones((8, 34))\n"
        "out = jax.jit(lambda p, b, x: loco_forward(p, b, x, train=False)[0])"
        "(params, bn, x)\n"
        "print('OK', float(out.sum()))\n"
    )
    env = dict(os.environ)
    env.pop('MONOLOCO_TPU_COMPILE_CACHE', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    env['JAX_PLATFORMS'] = 'cpu'
    env['PALLAS_AXON_POOL_IPS'] = ''

    first = subprocess.run([sys.executable, '-c', snippet], env=env,
                           capture_output=True, text=True, cwd=REPO)
    assert first.returncode == 0, first.stderr
    entries = os.listdir(cache)
    assert entries, "first process stored nothing in the compilation cache"

    second = subprocess.run([sys.executable, '-c', snippet], env=env,
                            capture_output=True, text=True, cwd=REPO)
    assert second.returncode == 0, second.stderr
    assert first.stdout.strip() == second.stdout.strip()
    assert 'Persistent compilation cache hit' in second.stderr, (
        "second process did not hit the persistent cache:\n" + second.stderr[-2000:])
