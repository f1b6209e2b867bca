"""Serving endpoint (monoloco_tpu/serve.py): micro-batching HTTP server.

Drives a real ThreadingHTTPServer on an ephemeral port with an in-memory toy
net; concurrent clients must be coalesced into shared device dispatches."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from monoloco_tpu.models import init_loco_params
from monoloco_tpu.network import Loco
from monoloco_tpu.serve import Server

KK = [[718.0, 0.0, 600.0], [0.0, 718.0, 180.0], [0.0, 0.0, 1.0]]


def _post(port, payload, timeout=30):
    req = urllib.request.Request(
        f'http://127.0.0.1:{port}/v1/predict',
        data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _get(port, path):
    with urllib.request.urlopen(f'http://127.0.0.1:{port}{path}',
                                timeout=30) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope='module')
def server():
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    net = Loco((params, bn), mode='mono', linear_size=64, n_stage=2)
    # Generous window so the coalescing test can't race; port 0 = ephemeral.
    srv = Server(net, port=0, window_ms=300.0, max_batch=64)
    srv.warmup()
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _keypoints(m, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(m, 3, 17) * 300).tolist()


def test_healthz(server):
    h = _get(server.port, '/healthz')
    assert h['status'] == 'ok'
    assert h['net'] == 'monoloco_pp' and h['hidden'] == 64


def test_predict_single(server):
    out = _post(server.port, {'keypoints': _keypoints(3), 'kk': KK})
    o = out['outputs']
    assert len(o['xyzd']) == 3 and len(o['xyzd'][0]) == 4
    assert len(o['bi']) == 3
    assert len(o['yaw']) == 2 and len(o['yaw'][0]) == 3
    assert all(np.isfinite(o['bi']))


def test_predict_with_post_process(server):
    m = 2
    boxes = [[10.0, 10.0, 100.0, 200.0, 0.9], [200.0, 20.0, 280.0, 190.0, 0.8]]
    out = _post(server.port, {'keypoints': _keypoints(m), 'kk': KK,
                              'boxes': boxes})
    pp = out['post_process']
    assert len(pp['dds_pred']) == m
    assert len(pp['xyz_pred']) == m
    assert len(pp['boxes']) == m


def test_concurrent_requests_coalesce(server):
    """8 concurrent clients inside one 300 ms window must land in shared
    batches (the whole point: one device dispatch, not 8)."""
    before = server.batcher.n_batches
    results, errs = [], []

    def call(i):
        try:
            results.append(_post(server.port,
                                 {'keypoints': _keypoints(2, seed=i),
                                  'kk': KK}))
        except Exception as exc:  # noqa: BLE001 — collected for the assert
            errs.append(exc)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs and len(results) == 8
    assert all(len(r['outputs']['xyzd']) == 2 for r in results)
    made = server.batcher.n_batches - before
    assert made < 8, f'8 requests used {made} batches — no coalescing happened'
    m = _get(server.port, '/metrics')
    assert m['max_batch'] >= 2
    assert m['latency_ms'] is None or m['latency_ms']['p50'] > 0


def test_malformed_requests(server):
    for payload, msg in (
            ({'kk': KK}, 'missing keypoints'),
            ({'keypoints': [[1.0, 2.0]], 'kk': KK}, 'bad shape'),
            ({'keypoints': _keypoints(1), 'kk': [[1.0]]}, 'bad kk'),
            ({'keypoints': _keypoints(1), 'kk': KK,
              'keypoints_r': [[1.0, 2.0]]}, 'bad keypoints_r shape')):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server.port, payload)
        assert exc.value.code == 400, msg


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server.port, '/nope')
    assert exc.value.code == 404


def test_stop_drains_pending_requests():
    """Requests still queued at shutdown must fail immediately, not leave
    their handler threads waiting out the 60 s timeout."""
    from monoloco_tpu.serve import Batcher
    batcher = Batcher(net=None)          # net is only touched at dispatch
    batcher._stop.set()
    batcher._thread.join(timeout=5)
    req = batcher.submit(np.zeros((1, 3, 17), np.float32),
                         np.eye(3, dtype=np.float32))
    batcher.stop()
    assert req.event.is_set()
    assert req.error == 'server shutting down'


def test_stereo_server():
    """monstereo serving: keypoints_r present and absent (left duplicated, as
    Loco.forward does)."""
    params, bn = init_loco_params(jax.random.PRNGKey(1), 68, 10, 64, 2)
    net = Loco((params, bn), mode='stereo', linear_size=64, n_stage=2)
    srv = Server(net, port=0, window_ms=50.0, max_batch=16)
    srv.warmup()
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        out = _post(srv.port, {'keypoints': _keypoints(2), 'kk': KK,
                               'keypoints_r': _keypoints(3, seed=5)})
        assert len(out['outputs']['xyzd']) == 2
        out2 = _post(srv.port, {'keypoints': _keypoints(2), 'kk': KK})
        assert len(out2['outputs']['xyzd']) == 2
        h = _get(srv.port, '/healthz')
        assert h['net'] == 'monstereo'
    finally:
        srv.shutdown()
