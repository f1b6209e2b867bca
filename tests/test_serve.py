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
    # Serving-precision observability: default process => no int8 kernel.
    assert h['precision'] == 'default' and h['int8_kernel'] is False


def test_healthz_reports_packed_kernel_flavor():
    """With the dyn8 kernel packed, /healthz reports dormant-vs-active status
    and WHICH flavor the auto selector would serve (vmem-resident within the
    16 MB stack budget)."""
    from monoloco_tpu.ops import pack_folded_weights_w8
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 128, 2)
    net = Loco((params, bn), mode='mono', linear_size=128, n_stage=2)
    net.mlp_weights['packed_int8'] = pack_folded_weights_w8(net.folded)
    srv = Server(net, port=0, window_ms=5.0, max_batch=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        h = _get(srv.port, '/healthz')
        assert h['int8_kernel'] is True
        assert h['int8']['status'].startswith('packed-dormant')
        assert h['int8']['flavor'] == 'vmem-resident'   # 128^2 x 6 << 16 MB
        assert h['int8']['min_rows'] >= 1
    finally:
        srv.shutdown()


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


def test_mesh_sharded_server_matches_unsharded():
    """--dp_devices serving: the coalesced batch shards its image axis over
    the mesh's 'data' axis (same SPMD path as sharded generation) and must
    return the same outputs as single-device serving."""
    from monoloco_tpu.parallel import make_mesh
    params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 64, 2)
    rng = np.random.RandomState(3)
    payload = {'keypoints': (rng.rand(4, 3, 17) * 200).tolist(), 'kk': KK}
    outs = []
    for mesh in (None, make_mesh(jax.devices()[:8])):
        net = Loco((params, bn), mode='mono', linear_size=64, n_stage=2,
                   mesh=mesh)
        srv = Server(net, port=0, window_ms=1.0, max_batch=8)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            outs.append(_post(srv.port, payload, timeout=120))
        finally:
            srv.shutdown()
    single, sharded = outs
    np.testing.assert_allclose(np.asarray(sharded['outputs']['xyzd']),
                               np.asarray(single['outputs']['xyzd']),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded['outputs']['bi']),
                               np.asarray(single['outputs']['bi']),
                               rtol=1e-6, atol=1e-6)


def test_serve_cli_dp_devices_flag():
    """main() builds the mesh from --dp_devices and refuses impossible
    device counts with a clear error."""
    from monoloco_tpu import serve as serve_mod
    with pytest.raises(SystemExit, match='devices are available'):
        serve_mod.main(['--model', 'unused.pkl', '--dp_devices', '4096'])


def test_non_positive_max_queue_rejected():
    """queue.Queue(maxsize<=0) silently means UNBOUNDED — the exact failure
    mode backpressure exists to prevent — so the Batcher must refuse it."""
    from monoloco_tpu.serve import Batcher
    for bad in (0, -1):
        with pytest.raises(ValueError, match='max_queue'):
            Batcher(net=None, max_queue=bad)


def test_shed_counter_is_thread_safe():
    """Concurrent queue-full submits must not lose shed increments (the
    counter is a locked read-modify-write, not a bare +=)."""
    from monoloco_tpu.serve import Batcher
    batcher = Batcher(net=None, max_queue=1)
    batcher._stop.set()                  # collator idle: queue stays full
    batcher._thread.join(timeout=5)
    batcher._queue.put_nowait(object())  # pre-fill so every submit sheds
    n_threads, per_thread = 8, 50
    kps = np.zeros((1, 3, 17), np.float32)
    kk = np.eye(3, dtype=np.float32)

    def shed_many():
        for _ in range(per_thread):
            assert batcher.submit(kps, kk) is None

    threads = [threading.Thread(target=shed_many) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert batcher.n_shed == n_threads * per_thread


class _SlowNet:
    """Dispatch-compatible stub whose forward takes `delay_s` per batch —
    lets the overload test saturate the server without a slow real model."""
    net = 'monoloco_pp'
    mode = 'mono'
    linear_size = 64
    n_stage = 2

    def __init__(self, delay_s=0.2):
        self.delay_s = delay_s

    def forward_batch_async(self, kps_list, kk_list, kps_r_list=None):
        import time

        def finalize():
            time.sleep(self.delay_s)
            return [{'d': np.zeros((len(k), 1), np.float32)}
                    for k in kps_list]

        return finalize


def test_overload_sheds_with_503():
    """Offered load beyond chip throughput must shed with 503 + Retry-After
    and a bounded queue, not queue without bound (VERDICT r3 weak #3)."""
    srv = Server(_SlowNet(delay_s=0.3), port=0, window_ms=1.0, max_batch=1,
                 max_queue=2)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    codes, lock = [], threading.Lock()

    def call(i):
        try:
            _post(srv.port, {'keypoints': _keypoints(1, seed=i), 'kk': KK})
            code = 200
        except urllib.error.HTTPError as exc:
            code = exc.code
        with lock:
            codes.append(code)

    try:
        threads = [threading.Thread(target=call, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert len(codes) == 12
        # max_batch=1, 0.3 s per batch, queue depth 2: most of the 12
        # near-simultaneous requests must be shed, and the accepted ones
        # must all succeed.
        assert codes.count(503) >= 1, codes
        assert set(codes) <= {200, 503}, codes
        assert codes.count(200) >= 1, codes
        m = _get(srv.port, '/metrics')
        assert m['shed'] == codes.count(503)
        assert m['queue_depth'] <= m['max_queue'] == 2
    finally:
        srv.shutdown()


def test_overload_503_carries_retry_after():
    srv = Server(_SlowNet(delay_s=10.0), port=0, window_ms=1.0, max_batch=1,
                 max_queue=1)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        # First request occupies the collator (10 s forward); the next fills
        # the depth-1 queue; the third must shed.
        fire = [threading.Thread(target=lambda i=i: call_quietly(srv.port, i))
                for i in range(2)]
        for t in fire:
            t.start()
        import time
        # Wait until the server is PROVABLY saturated: one request in
        # dispatch (10 s forward) AND one holding the depth-1 queue slot.
        # Two flake paths guarded here (both observed on this 1-core host):
        #  - depth 1 read while the queued request was merely awaiting the
        #    collator (nothing in dispatch) — the slot frees 0.1 s later and
        #    the probe lands in it (200 instead of 503). Guard: require
        #    depth >= 1 across TWO reads 0.3 s apart (the collator polls
        #    every 0.1 s, so a free collator would have drained it).
        #  - one saturator shed at submit before the other entered dispatch
        #    (depth never reaches 1). Guard: top the queue back up.
        m = {}
        stable = False
        deadline = time.time() + 30
        while time.time() < deadline and not stable:
            m = _get(srv.port, '/metrics')
            if m.get('queue_depth', 0) >= 1:
                time.sleep(0.3)
                m = _get(srv.port, '/metrics')
                stable = m.get('queue_depth', 0) >= 1
                continue
            if m.get('shed', 0) > 0:
                threading.Thread(target=lambda: call_quietly(srv.port, 99),
                                 daemon=True).start()
                time.sleep(0.1)
            time.sleep(0.05)
        if not stable:
            raise AssertionError(f'saturation never stabilized: {m}')
        # Generous socket timeout: the shed itself is instant once the
        # handler runs, but on a contended 1-core host the accept/handler
        # thread can be starved for seconds (observed as a flaky
        # TimeoutError at timeout=5).
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv.port, {'keypoints': _keypoints(1, seed=9), 'kk': KK},
                  timeout=30)
        assert exc.value.code == 503
        assert exc.value.headers.get('Retry-After') == '1'
    finally:
        srv.shutdown()


def call_quietly(port, i):
    try:
        _post(port, {'keypoints': _keypoints(1, seed=i), 'kk': KK}, timeout=3)
    except Exception:  # noqa: BLE001 — these requests exist only to saturate
        pass


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


def test_keepalive_connection_reuse(server):
    """The server speaks HTTP/1.1 keep-alive: several requests ride ONE TCP
    connection (production clients hold persistent connections; per-request
    handshakes were the round-4 HTTP-layer ceiling — PARITY.md)."""
    import http.client
    conn = http.client.HTTPConnection('127.0.0.1', server.port, timeout=30)
    try:
        for i in range(3):
            body = json.dumps({'keypoints': _keypoints(2, seed=i),
                               'kk': KK}).encode()
            conn.request('POST', '/v1/predict', body=body,
                         headers={'Content-Type': 'application/json'})
            resp = conn.getresponse()
            assert resp.version == 11
            assert resp.status == 200
            out = json.loads(resp.read())
            assert len(out['outputs']['xyzd']) == 2
            # keep-alive: the server must not have asked to close
            assert (resp.getheader('Connection') or '').lower() != 'close'
        # And a GET on the SAME connection still works after the POSTs.
        conn.request('GET', '/healthz')
        resp = conn.getresponse()
        assert resp.status == 200 and json.loads(resp.read())['status'] == 'ok'
    finally:
        conn.close()


def test_keepalive_early_replies_close_the_connection(server):
    """Replies sent WITHOUT reading the request body (404 wrong path, 411
    chunked, 413 too large) must carry Connection: close — under HTTP/1.1
    keep-alive an unread body would otherwise desynchronize the stream and
    the next request on the connection would parse body bytes as a request
    line."""
    import http.client
    body = json.dumps({'keypoints': _keypoints(2), 'kk': KK}).encode()

    # Wrong path, with a body the handler never reads.
    conn = http.client.HTTPConnection('127.0.0.1', server.port, timeout=30)
    try:
        conn.request('POST', '/nope', body=body,
                     headers={'Content-Type': 'application/json'})
        resp = conn.getresponse()
        assert resp.status == 404
        assert (resp.getheader('Connection') or '').lower() == 'close'
        resp.read()
    finally:
        conn.close()

    # Oversized Content-Length: same contract, no body bytes even sent.
    conn = http.client.HTTPConnection('127.0.0.1', server.port, timeout=30)
    try:
        conn.putrequest('POST', '/v1/predict')
        conn.putheader('Content-Type', 'application/json')
        conn.putheader('Content-Length', str(65 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert (resp.getheader('Connection') or '').lower() == 'close'
        resp.read()
    finally:
        conn.close()

    # Chunked transfer encoding is refused up front (the stdlib handler
    # does not decode it, so the stream could never be resynchronized).
    conn = http.client.HTTPConnection('127.0.0.1', server.port, timeout=30)
    try:
        conn.putrequest('POST', '/v1/predict')
        conn.putheader('Content-Type', 'application/json')
        conn.putheader('Transfer-Encoding', 'chunked')
        conn.endheaders()
        conn.send(b'0\r\n\r\n')
        resp = conn.getresponse()
        assert resp.status == 411
        assert (resp.getheader('Connection') or '').lower() == 'close'
        resp.read()
    finally:
        conn.close()

    # The server itself is unharmed: a fresh keep-alive request succeeds.
    conn = http.client.HTTPConnection('127.0.0.1', server.port, timeout=30)
    try:
        conn.request('POST', '/v1/predict', body=body,
                     headers={'Content-Type': 'application/json'})
        resp = conn.getresponse()
        assert resp.status == 200
        json.loads(resp.read())
    finally:
        conn.close()
