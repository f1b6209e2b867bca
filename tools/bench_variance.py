"""Run bench.py N times in fresh processes and report median +- spread.

Pins the run-to-run variance of the single-chip throughput number so that
cross-round drift (BENCH_r01 9.284M vs BENCH_r02 9.091M, -2.1%) can be told
apart from tunnel noise. Usage:

    python tools/bench_variance.py [N]          # default 7

Prints every per-run value plus a summary JSON line:
    {"metric": "bench_variance", "median": ..., "mean": ..., "min": ...,
     "max": ..., "rel_spread_pct": ...}
"""

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    values = []
    # bench.py's dual-measure mode (MONOLOCO_TPU_PRECISION unset) labels both
    # serving paths in the same JSON line; track each path's band separately
    # so the headline's variance is attributable.
    per_path = {'bf16_inferences_per_sec': [], 'int8_dyn_inferences_per_sec': []}
    for i in range(n):
        proc = subprocess.run([sys.executable, os.path.join(REPO, 'bench.py')],
                              capture_output=True, text=True, cwd=REPO)
        line = [l for l in proc.stdout.splitlines() if l.startswith('{')]
        if proc.returncode != 0 or not line:
            print(f'run {i}: FAILED rc={proc.returncode}\n{proc.stdout[-500:]}'
                  f'\n{proc.stderr[-500:]}', flush=True)
            continue
        record = json.loads(line[-1])
        values.append(record['value'])
        for key, bucket in per_path.items():
            if key in record:
                bucket.append(record[key])
        extras = ' '.join(f'{k.split("_inferences")[0]}={record[k]:,.0f}'
                          for k in per_path if k in record)
        print(f'run {i}: {record["value"]:,.0f} inferences/sec  {extras}',
              flush=True)
    if len(values) < 2:
        sys.exit('not enough successful runs')
    med = statistics.median(values)
    spread = (max(values) - min(values)) / med * 100.0
    summary = {
        'metric': 'bench_variance', 'n': len(values),
        'median': round(med, 1), 'mean': round(statistics.mean(values), 1),
        'stdev': round(statistics.stdev(values), 1),
        'min': round(min(values), 1), 'max': round(max(values), 1),
        'rel_spread_pct': round(spread, 2),
    }
    for key, bucket in per_path.items():
        if len(bucket) >= 2:
            summary[key.replace('_inferences_per_sec', '_median')] = round(
                statistics.median(bucket), 1)
            summary[key.replace('_inferences_per_sec', '_spread_pct')] = round(
                (max(bucket) - min(bucket)) / statistics.median(bucket) * 100, 2)
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
