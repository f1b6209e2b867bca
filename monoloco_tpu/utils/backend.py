"""Backend-liveness probe.

The serving backend here is typically a remote TPU reached through a tunnel.
When that tunnel is down, ``jax.devices()`` does not raise — it blocks
forever inside PJRT client initialization, which turns every CLI command,
bench, and driver check into a silent hang. This module time-boxes the first
backend touch so callers can convert "tunnel dead" into a prompt, explicit
failure (observed live 2026-08-17 when the relay's host side dropped).

The probe runs ``jax.devices()`` in a daemon thread. On timeout the thread is
abandoned: it holds no lock a caller needs afterwards as long as the caller
either exits or continues on a *different* backend in a subprocess (the
multichip dry run's virtual-CPU re-exec does exactly that).
"""

import os
import sys
import threading


def probe_timeout_s():
    """The configured probe timeout: MONOLOCO_TPU_BACKEND_PROBE_S env var
    (seconds, default 300 — comfortably beyond the observed cold-init tail of
    ~20-40 s). 0 disables the time-box (block until init returns)."""
    return float(os.environ.get('MONOLOCO_TPU_BACKEND_PROBE_S', '300'))


def probe_devices(timeout_s=None):
    """Return ``jax.devices()``, or None if backend init hangs past
    ``timeout_s`` (default: :func:`probe_timeout_s`; 0 = wait forever) or
    raises.

    A hung probe prints a one-line diagnosis to stderr; an exception is
    swallowed (both mean "unavailable" to the caller).
    """
    if timeout_s is None:
        timeout_s = probe_timeout_s()
    import jax
    result = []

    def _probe():
        try:
            result.append(jax.devices())
        except Exception as exc:    # init failed outright -> unavailable
            result.append(exc)

    probe = threading.Thread(target=_probe, daemon=True)
    probe.start()
    probe.join(timeout_s if timeout_s else None)
    if probe.is_alive():
        print(f"backend probe still blocked after {timeout_s:.0f}s "
              "(tunnel down?) — treating the backend as unavailable",
              file=sys.stderr)
        return None
    if result and isinstance(result[0], Exception):
        print(f"backend init failed: {result[0]!r}", file=sys.stderr)
        return None
    return result[0] if result else None


def require_live_backend(timeout_s=None, context=''):
    """Exit(1) with a clear message unless the backend answers in time.

    ``timeout_s`` defaults to :func:`probe_timeout_s` (env-tunable); 0
    disables the probe entirely (callers that know their backend is local, or
    want the legacy block-forever behavior).
    """
    if timeout_s is None:
        timeout_s = probe_timeout_s()
    if not timeout_s:
        return
    if probe_devices(timeout_s) is None:
        where = f" ({context})" if context else ""
        print(f"no live JAX backend{where}: init did not complete within "
              f"{timeout_s:.0f}s — is the TPU tunnel up? "
              "(MONOLOCO_TPU_BACKEND_PROBE_S=0 disables this check)",
              file=sys.stderr)
        sys.exit(1)
