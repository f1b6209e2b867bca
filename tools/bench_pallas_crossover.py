"""XLA-vs-Pallas serving crossover study on the real chip.

For each (hidden, batch) shape, times the BN-folded Loco MLP forward
(bf16 weights, f32 accumulation) through
  - the XLA path (models.folded_forward), and
  - the fused Pallas kernel (ops.fused_mlp.fused_loco_forward),
each inside a lax.scan chained through the data (bench.py methodology: the
host fetches a checksum, so dispatch pipelining cannot flatter the number).
Reports per-dispatch wall and inferences/sec; appends one JSON line per
measurement to the output file.

The fused kernel double-buffers HxH weight tiles through VMEM, which bounds
hidden <= 1024 at 16 MB VMEM (2 x 2 MB weight slots + activations); hidden
2048 would need 2 x 8 MB slots plus activations and is measured on the XLA
path only — recorded as a kernel limitation, not skipped silently.

Usage: python tools/bench_pallas_crossover.py [out.jsonl]
"""

import json
import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HIDDENS = (256, 1024, 2048)
BATCHES = (256, 4096, 65536, 131072)
PALLAS_MAX_HIDDEN = 1024


def time_fn(fn, *args, reps=7):
    float(fn(*args))                      # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = float(fn(*args))
        walls.append(time.perf_counter() - t0)
    assert checksum == checksum
    return statistics.median(walls)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/pallas_crossover.jsonl'
    from monoloco_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from monoloco_tpu.models import init_loco_params, fold_eval_params, folded_forward
    from monoloco_tpu.ops.fused_mlp import pack_folded_weights, fused_loco_forward

    records = []
    open(out_path, 'w').close()

    def emit(rec):
        # append per measurement so a mid-run tunnel drop keeps the
        # completed points (this study is ~20 slow remote TPU compiles)
        print(json.dumps(rec), flush=True)
        records.append(rec)
        with open(out_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    for hidden in HIDDENS:
        params, bn = init_loco_params(jax.random.PRNGKey(0), 34, 9, hidden, 3)
        folded = fold_eval_params(params, bn, arch='loco')
        folded_bf16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), folded)
        packed = pack_folded_weights(folded, dtype=jnp.bfloat16)

        for batch in BATCHES:
            # scan length scaled so each timed call is >= ~10 ms of device
            # work even at small batches (one dispatch is ~20 ms of tunnel
            # RTT here; the scan amortizes it out of the per-iteration cost).
            length = max(4, min(256, (1 << 22) // batch))
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.randn(batch, 34), jnp.float32)

            def make_scan(fwd):
                @jax.jit
                def run(x):
                    def body(carry, _):
                        out = fwd(x + carry * 1e-9)
                        return out[0, 0].astype(jnp.float32), out.sum()
                    carry, sums = jax.lax.scan(
                        body, jnp.float32(0.0), None, length=length)
                    return carry + sums.sum().astype(jnp.float32)
                return run

            def xla_fwd(xx):
                return folded_forward(folded_bf16, xx.astype(jnp.bfloat16),
                                      arch='loco').astype(jnp.float32)

            wall = time_fn(make_scan(xla_fwd), x)
            emit(dict(path='xla', hidden=hidden, batch=batch, scan=length,
                      wall_per_dispatch_ms=round(wall * 1e3, 3),
                      inf_per_sec=round(batch * length / wall, 1)))

            if hidden <= PALLAS_MAX_HIDDEN:
                tile = min(512, batch)

                def pallas_fwd(xx):
                    return fused_loco_forward(folded, xx, packed=packed,
                                              tile=tile)

                wall = time_fn(make_scan(pallas_fwd), x)
                rec = dict(path='pallas', hidden=hidden, batch=batch,
                           scan=length,
                           wall_per_dispatch_ms=round(wall * 1e3, 3),
                           inf_per_sec=round(batch * length / wall, 1))
            else:
                rec = dict(path='pallas', hidden=hidden, batch=batch,
                           skipped='hidden > 1024 exceeds the kernel VMEM '
                                   'double-buffer budget')
            emit(rec)

    # winner table
    print('\nhidden  batch    xla Minf/s  pallas Minf/s  pallas/xla')
    by_key = {}
    for rec in records:
        if 'inf_per_sec' in rec:
            by_key[(rec['hidden'], rec['batch'], rec['path'])] = rec['inf_per_sec']
    for hidden in HIDDENS:
        for batch in BATCHES:
            xv = by_key.get((hidden, batch, 'xla'))
            pv = by_key.get((hidden, batch, 'pallas'))
            ratio = f'{pv / xv:.3f}' if (xv and pv) else '-'
            print(f'{hidden:6d} {batch:7d} {xv / 1e6 if xv else 0:10.2f} '
                  f'{pv / 1e6 if pv else 0:12.2f}  {ratio}')


if __name__ == '__main__':
    main()
