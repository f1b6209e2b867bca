"""bench.py backend-liveness probe: a dead TPU tunnel makes jax.devices()
block forever in PJRT init (it does not raise), so the bench must convert a
hung or failing backend into a prompt explicit exit instead of hanging the
invoking harness."""

import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_probe_hung_backend_exits_nonzero(monkeypatch, capsys):
    monkeypatch.setattr(bench.jax, 'devices',
                        lambda: threading.Event().wait())
    with pytest.raises(SystemExit) as exc:
        bench._require_live_backend(0.2)
    assert exc.value.code == 1
    assert 'blocked' in capsys.readouterr().err


def test_probe_raising_backend_exits_nonzero(monkeypatch, capsys):
    def boom():
        raise RuntimeError('no backend')
    monkeypatch.setattr(bench.jax, 'devices', boom)
    with pytest.raises(SystemExit) as exc:
        bench._require_live_backend(5.0)
    assert exc.value.code == 1
    assert 'failed' in capsys.readouterr().err


def test_probe_live_backend_passes():
    bench._require_live_backend(60.0)  # conftest forces the CPU backend


def test_cli_needs_device_gating():
    """Device-touching commands get the liveness probe; host-only numpy paths
    (prep, geometric/variance baselines, plain EvalKitti scoring) must not."""
    from argparse import Namespace
    from monoloco_tpu.run import _needs_device

    def ev(**kw):
        base = dict(command='eval', geometric=False, variance=False,
                    generate=False, activity=False, dataset='kitti')
        base.update(kw)
        return Namespace(**base)

    def pred(**kw):
        base = dict(command='predict', webcam=False, mode='mono')
        base.update(kw)
        return Namespace(**base)

    assert _needs_device(pred())
    assert _needs_device(pred(mode='stereo'))
    assert _needs_device(pred(mode='keypoints', webcam=True))  # webcam builds Loco
    # pifpaf-only path: no Loco, no device arrays (predict.py:167) — a dead
    # tunnel must not break it.
    assert not _needs_device(pred(mode='keypoints'))
    assert _needs_device(Namespace(command='train'))
    assert not _needs_device(Namespace(command='prep'))
    assert not _needs_device(ev())                        # plain txt scoring
    assert not _needs_device(ev(geometric=True))
    assert not _needs_device(ev(variance=True))
    assert _needs_device(ev(generate=True))
    assert _needs_device(ev(activity=True))
    assert _needs_device(ev(dataset='nuscenes'))
    # Dispatch checks --activity FIRST (ActivityEvaluator always builds a
    # Loco), so activity+geometric/variance still needs the probe.
    assert _needs_device(ev(activity=True, geometric=True))
    assert _needs_device(ev(activity=True, variance=True))


def test_probe_timeout_env_knob(monkeypatch):
    """MONOLOCO_TPU_BACKEND_PROBE_S tunes every probe default — including
    __graft_entry__._available_devices (it previously hardcoded 90 s, so a
    live-but-slow backend was spuriously declared dead with no way to tune)."""
    from monoloco_tpu.utils import backend

    monkeypatch.delenv('MONOLOCO_TPU_BACKEND_PROBE_S', raising=False)
    assert backend.probe_timeout_s() == 300.0
    monkeypatch.setenv('MONOLOCO_TPU_BACKEND_PROBE_S', '0.2')
    assert backend.probe_timeout_s() == 0.2
    # A hung backend + env-resolved default timeout -> None promptly.
    import jax
    real = jax.devices
    try:
        jax.devices = lambda: threading.Event().wait()
        assert backend.probe_devices() is None
    finally:
        jax.devices = real
