"""Persistent XLA compilation cache.

Every jitted program in this framework (the bucketed serving programs, the
chunked multi-epoch training scan, the mesh-sharded generation step) is traced
once per process and compiled by XLA. On this container's tunneled TPU backend
a cold compile of the fused 500-epoch training program costs minutes; JAX's
persistent compilation cache makes that a once-ever cost per (program, shapes,
jax version, backend) by serializing compiled executables to disk.

The reference has no counterpart — torch eager recompiles nothing but also
fuses nothing. For this framework the cache is the production answer to the
compile-latency trade-off documented in PARITY.md ("Training wall").

Enabled by the CLI entry point (run.py) and bench.py. Control via env:
  MONOLOCO_TPU_COMPILE_CACHE=<dir>  cache directory (default
                                    ~/.cache/monoloco_tpu/xla)
  MONOLOCO_TPU_COMPILE_CACHE=0      disable (also: "", "off", "false")
"""

import os

_DISABLE_VALUES = ('0', 'off', 'false', 'no')
_DEFAULT_DIR = os.path.join('~', '.cache', 'monoloco_tpu', 'xla')


def enable_compilation_cache(path=None, min_compile_seconds=None):
    """Point JAX's persistent compilation cache at a writable directory.

    Returns the cache directory, or None when disabled. Safe to call more
    than once and before or after backend initialization (the config flags
    are read at compile time, not at import). `min_compile_seconds` lowers
    the store threshold (jax's default 1s skips trivial programs).
    """
    env = os.environ.get('MONOLOCO_TPU_COMPILE_CACHE')
    if path is None:
        if env is not None and env.strip().lower() in _DISABLE_VALUES:
            return None
        path = env or _DEFAULT_DIR
    path = os.path.expanduser(path)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None  # unwritable location: run uncached rather than crash
    import jax
    jax.config.update('jax_compilation_cache_dir', path)
    # Compiles through the tunneled backend are never cheap; cache any entry
    # size, and programs from 1s of compile time up (jax's own default).
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    if min_compile_seconds is not None:
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          float(min_compile_seconds))
    return path
