"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers a remote 'axon' TPU backend at
interpreter startup and pins JAX_PLATFORMS to it; tests must run locally on
CPU (with a virtual 8-device mesh for sharding tests), so we override the
platform through jax.config before any backend is initialized.
"""

import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax

jax.config.update('jax_platforms', 'cpu')
try:
    jax.config.update('jax_num_cpu_devices', 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older versions
