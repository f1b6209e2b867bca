"""Virtual-mesh scaling-shape regression: sharding must not serialize.

Runs tools/bench_mesh_scaling.py children at a compute-dominated batch and
asserts the dp8/dp1 fixed-total-batch step-wall ratio stays near 1 (PARITY.md
round-3 numbers: train 1.02, serve 1.23). Marked slow: each dp width pays a
fresh-process XLA CPU compile.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


@pytest.mark.slow
def test_dp_sharding_adds_no_serialization():
    from bench_mesh_scaling import run_child

    def ratio_once():
        walls = {dp: run_child(dp, batch=4096, hidden=256, reps=3,
                               what='train')['median_ms']
                 for dp in (1, 8)}
        return walls[8] / walls[1]

    # 1.02 measured; 1.6 leaves room for CI-runner noise while still
    # catching a sharding that serializes (which would land near 8x the
    # per-shard fixed overhead, >2x in practice). A single re-measure
    # absorbs transient host contention (dp8 spreads over 8 virtual devices
    # on however many cores exist, so a busy co-tenant inflates it far more
    # than dp1 — observed 1.7x on a 1-core box running a background
    # pipeline); a real serialization bug fails BOTH measurements.
    ratio = ratio_once()
    if ratio > 1.6:
        ratio = ratio_once()
    assert ratio <= 1.6, f'dp8/dp1 step-wall ratio {ratio:.2f}'
