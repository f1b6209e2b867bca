"""Load-test the micro-batching serving endpoint (monoloco_tpu/serve.py).

Starts an in-process Server (in-memory or checkpoint weights), fires
--clients concurrent closed-loop clients each issuing --requests POSTs of an
--dets-detection image, and reports requests/sec, latency percentiles, and
the achieved batch coalescing (mean/max batch per dispatch) from /metrics.

The point being measured: with coalescing, N concurrent clients cost ~one
device dispatch per window instead of N — server throughput scales with the
batch bucket, not the request count.

Usage:
  python tools/bench_serve.py --model data/outputs/v_r3.pkl \
      --clients 32 --requests 20 [--window-ms 2] [--dets 4]
CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_serve.py ...
"""

import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KK = [[718.3351, 0.0, 600.3891], [0.0, 718.3351, 181.5122], [0.0, 0.0, 1.0]]


def run_sweep(args, port, body):
    """Open-loop offered-load sweep: fire requests at a fixed arrival rate
    (independent of completions) for --duration seconds per level. Below
    capacity, latency stays near the batch window; past capacity the bounded
    queue sheds with 503 and the p99 of ACCEPTED requests stays bounded —
    the load curve recorded in PARITY.md (VERDICT r3 item 3).

    Requests ride a keep-alive connection pool (the server speaks HTTP/1.1):
    a fresh TCP connect per request measures the handshake, not the server —
    production clients hold persistent connections. Any fully-read response
    (including a 503 shed, whose body the server always sends) returns its
    connection to the pool; only transport errors drop the connection, so
    shed requests do NOT pay a reconnect in the measured latency."""
    import http.client

    pool, pool_lock = [], threading.Lock()

    def post_once(results, lock):
        t1 = time.perf_counter()
        code = 200
        with pool_lock:
            conn = pool.pop() if pool else None
        if conn is None:
            conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)
        try:
            conn.request('POST', '/v1/predict', body=body,
                         headers={'Content-Type': 'application/json'})
            resp = conn.getresponse()
            code = resp.status
            json.loads(resp.read())
            with pool_lock:
                pool.append(conn)
        except Exception:  # noqa: BLE001 — count transport errors as 599
            code = 599
            conn.close()
        with lock:
            results.append((code, time.perf_counter() - t1))

    MAX_FIRED = 3000          # bounds thread count at high offered rates
    for rps in (float(x) for x in args.sweep.split(',')):
        results, lock = [], threading.Lock()
        threads = []
        interval = 1.0 / rps
        t0 = time.perf_counter()
        n_fired = 0
        while (time.perf_counter() - t0 < args.duration
               and n_fired < MAX_FIRED):
            target = t0 + n_fired * interval
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            th = threading.Thread(target=post_once, args=(results, lock))
            th.start()
            threads.append(th)
            n_fired += 1
        for th in threads:
            th.join(timeout=180)
        ok = sorted(dt for code, dt in results if code == 200)
        shed = sum(1 for code, _ in results if code == 503)
        other = sum(1 for code, _ in results if code not in (200, 503))
        wall = time.perf_counter() - t0
        rec = {
            'offered_rps': rps,
            'achieved_rps': round(len(ok) / wall, 1),
            'fired': n_fired, 'ok': len(ok), 'shed_503': shed,
            'other_errors': other,
        }
        if ok:
            n = len(ok)
            rec['latency_ms'] = {
                'p50': round(ok[n // 2] * 1e3, 2),
                'p90': round(ok[int(0.9 * (n - 1))] * 1e3, 2),
                'p99': round(ok[int(0.99 * (n - 1))] * 1e3, 2)}
        print(json.dumps(rec), flush=True)


def run_direct_sweep(args, net, Batcher):
    """Open-loop offered-load sweep CALLING Batcher.submit() directly — no
    HTTP, no per-request handler threads. The stdlib HTTP layer saturates at
    ~120 req/s on a 1-core host (PARITY.md), which kept the 503 backpressure
    path from engaging at production shapes; this mode characterizes the
    device queue itself: a single pacing thread offers requests at a fixed
    rate, the bounded queue + collator + device dispatch do the rest, and
    shed counts come straight from submit() returning None (VERDICT r4
    item 7). Latency percentiles come from the batcher's own enqueue->done
    clock; device_ms is the per-dispatch device round trip."""
    rng = np.random.RandomState(0)
    kps = np.asarray(rng.rand(args.dets, 3, 17) * 300, np.float32)
    kk = np.asarray(KK, np.float32)

    batcher = Batcher(net, window_ms=args.window_ms, max_batch=args.max_batch,
                      max_queue=args.max_queue)
    for rps in (float(x) for x in args.sweep.split(',')):
        batcher.latencies_s.clear()
        batcher.device_s.clear()
        batcher.batch_sizes.clear()
        shed = accepted = 0
        pending = []
        interval = 1.0 / rps
        t0 = time.perf_counter()
        n_fired = 0
        while time.perf_counter() - t0 < args.duration:
            target = t0 + n_fired * interval
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            r = batcher.submit(kps, kk)
            n_fired += 1
            if r is None:
                shed += 1
            else:
                accepted += 1
                pending.append(r)
        for r in pending:
            r.event.wait(timeout=120)
        wall = time.perf_counter() - t0
        lat = sorted(batcher.latencies_s)
        dev = sorted(batcher.device_s)
        sizes = list(batcher.batch_sizes)
        rec = {
            'offered_rps': rps, 'fired': n_fired, 'ok': accepted,
            'shed': shed, 'achieved_rps': round(accepted / wall, 1),
            'mean_batch': round(sum(sizes) / max(1, len(sizes)), 2),
            'max_batch': max(sizes, default=0),
        }
        if lat:
            n = len(lat)
            rec['latency_ms'] = {
                'p50': round(lat[n // 2] * 1e3, 2),
                'p99': round(lat[int(0.99 * (n - 1))] * 1e3, 2)}
        if dev:
            n = len(dev)
            rec['device_ms'] = {
                'p50': round(dev[n // 2] * 1e3, 2),
                'p99': round(dev[int(0.99 * (n - 1))] * 1e3, 2)}
        print(json.dumps(rec), flush=True)
    batcher.stop()
    print(json.dumps({
        'int8_dispatches': net.n_dispatches_int8,
        'dispatches': net.n_dispatches,
        'int8_kernel_packed': 'packed_int8' in net.mlp_weights}), flush=True)


def warm_batch_buckets(net, max_batch, dets):
    """Pre-compile every power-of-two batch bucket a sweep can hit (plus the
    engine's rounded-up bucket for a non-power-of-two max_batch) — a lazy
    bucket compile mid-level costs seconds through the remote-compile tunnel
    and poisons that level's latency numbers. One definition shared by the
    --direct and --sweep branches so a bucket-policy change cannot leave one
    mode warming the wrong shapes."""
    kps1 = np.zeros((dets, 3, 17), np.float32)
    kk = np.asarray(KK, np.float32)
    b = 1
    while b <= max_batch:
        net.forward_batch([kps1] * b, [kk] * b)
        b *= 2
    if b // 2 != max_batch:
        net.forward_batch([kps1] * max_batch, [kk] * max_batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default=None,
                    help='checkpoint path (default: random-init hidden 1024)')
    ap.add_argument('--clients', type=int, default=32)
    ap.add_argument('--requests', type=int, default=20)
    ap.add_argument('--dets', type=int, default=4,
                    help='detections per request image')
    ap.add_argument('--window-ms', type=float, default=2.0)
    ap.add_argument('--max-batch', type=int, default=64)
    ap.add_argument('--max-queue', type=int, default=None,
                    help='bounded queue depth (default 8 * max_batch)')
    ap.add_argument('--sweep', default=None,
                    help='comma list of offered req/s: run an OPEN-LOOP '
                         'load sweep (fixed arrival rate, not closed-loop) '
                         'and report p50/p99 + shed (503) counts per level — '
                         'the backpressure curve for PARITY.md')
    ap.add_argument('--duration', type=float, default=10.0,
                    help='seconds per sweep level')
    ap.add_argument('--direct', action='store_true',
                    help='with --sweep: offer load to the Batcher directly '
                         '(no HTTP), characterizing the device queue and the '
                         'shed path without the thread-per-connection HTTP '
                         'ceiling')
    ap.add_argument('--expect-int8', action='store_true',
                    help='exit nonzero unless the fused int8 kernel actually '
                         'routed at least one dispatch (guards against '
                         'measuring bf16 while labeling the run int8)')
    args = ap.parse_args()

    from monoloco_tpu.utils import enable_compilation_cache
    from monoloco_tpu.utils.backend import require_live_backend
    require_live_backend(context='bench_serve')
    enable_compilation_cache()
    import jax
    from monoloco_tpu.models import init_loco_params
    from monoloco_tpu.network import Loco
    from monoloco_tpu.serve import Server

    if args.model:
        net = Loco(model=args.model, mode='mono')
    else:
        params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, 1024, 3)
        net = Loco((params, bn), mode='mono')

    def check_int8_engagement():
        print(f'int8: packed={"packed_int8" in net.mlp_weights} '
              f'dispatches_int8={net.n_dispatches_int8}/{net.n_dispatches}',
              flush=True)
        if args.expect_int8 and net.n_dispatches_int8 == 0:
            raise SystemExit('--expect-int8: the fused int8 kernel never '
                             'routed (dispatch rows stayed below the '
                             'crossover floor, or the kernel is not packed)')

    if args.direct:
        assert args.sweep, '--direct requires --sweep rates'
        from monoloco_tpu.serve import Batcher
        # Pre-compile every bucket the sweep can hit (as the HTTP sweep does).
        print('warming all batch buckets...', flush=True)
        warm_batch_buckets(net, args.max_batch, args.dets)
        net.n_dispatches = net.n_dispatches_int8 = 0   # exclude warmup
        run_direct_sweep(args, net, Batcher)
        check_int8_engagement()
        return

    server = Server(net, port=0, window_ms=args.window_ms,
                    max_batch=args.max_batch, max_queue=args.max_queue)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.port

    rng = np.random.RandomState(0)
    kps = (rng.rand(args.dets, 3, 17) * 300).tolist()
    body = json.dumps({'keypoints': kps, 'kk': KK}).encode()

    import http.client
    _tls = threading.local()

    def post():
        # One persistent keep-alive connection per client thread (the server
        # speaks HTTP/1.1): measures the serving path, not TCP handshakes.
        conn = getattr(_tls, 'conn', None)
        if conn is None:
            conn = _tls.conn = http.client.HTTPConnection(
                '127.0.0.1', port, timeout=600)
        try:
            conn.request('POST', '/v1/predict', body=body,
                         headers={'Content-Type': 'application/json'})
            json.loads(conn.getresponse().read())
        except Exception:
            conn.close()
            _tls.conn = None
            raise

    if args.sweep:
        # (The closed-loop HTTP warmup below is skipped: at small
        # --max-queue it would itself be shed with 503s.)
        print('warming all batch buckets...', flush=True)
        warm_batch_buckets(net, args.max_batch, args.dets)
        # Exclude warmup from the engagement counters: a full-bucket warmup
        # dispatch can route int8 and would satisfy --expect-int8 even if no
        # measured request ever does.
        net.n_dispatches = net.n_dispatches_int8 = 0
        run_sweep(args, port, body)
        server.shutdown()
        check_int8_engagement()
        return

    # Warm every batch bucket the load can hit (1..max_batch caps at the
    # bucket granularity; one full-batch warmup covers the largest).
    print('warming up (compiling serve buckets)...', flush=True)
    t0 = time.time()
    warm = [threading.Thread(target=post) for _ in range(args.clients)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    post()
    print(f'warmup done in {time.time() - t0:.1f}s', flush=True)
    net.n_dispatches = net.n_dispatches_int8 = 0   # exclude warmup

    lat = []
    lock = threading.Lock()

    def client():
        for _ in range(args.requests):
            t1 = time.perf_counter()
            post()
            dt = time.perf_counter() - t1
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    with urllib.request.urlopen(f'http://127.0.0.1:{port}/metrics',
                                timeout=30) as resp:
        metrics = json.loads(resp.read())
    server.shutdown()

    lat.sort()
    n = len(lat)
    print(json.dumps({
        'metric': 'serve_requests_per_sec',
        'value': round(n / wall, 1),
        'clients': args.clients,
        'dets_per_request': args.dets,
        'window_ms': args.window_ms,
        'latency_ms': {
            'p50': round(statistics.median(lat) * 1e3, 2),
            'p90': round(lat[int(0.9 * (n - 1))] * 1e3, 2),
            'p99': round(lat[int(0.99 * (n - 1))] * 1e3, 2)},
        'mean_batch': round(metrics['mean_batch'], 2),
        'max_batch': metrics['max_batch'],
        'device_ms': metrics.get('device_ms'),
        'inferences_per_sec': round(n * args.dets / wall, 1)}))
    check_int8_engagement()


if __name__ == '__main__':
    main()
