"""Cross-validation of the C++ KITTI evaluator against the reference devkit.

Two layers:
 - test_golden_stats_match: rebuilds the deterministic synthetic gt/detections
   tree from tools/crossval_kitti_eval.py, runs OUR binary, and compares every
   stats_pedestrian_* file against goldens produced by the UNMODIFIED
   reference binary (reference kitti-eval/evaluate_object.cpp compiled with
   the boost shim in tools/boost_compat). Runs everywhere the binary is built
   — the goldens are committed, so CI pins the reference AP/RALP/AOS/MPPE
   semantics without a reference checkout.
 - test_live_crossval_vs_reference_binary: compiles and runs the actual
   reference source head-to-head (container-gated on /root/reference).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import ensure_kitti_eval_binary

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = ensure_kitti_eval_binary()
GOLDEN_DIR = os.path.join(REPO, 'tests', 'goldens', 'kitti_eval_crossval')
REF_CPP = '/root/reference/kitti-eval/evaluate_object.cpp'

sys.path.insert(0, os.path.join(REPO, 'tools'))

pytestmark = pytest.mark.skipif(BINARY is None,
                                reason="evaluate_object build failed")


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR), reason="goldens missing")
def test_golden_stats_match(tmp_path):
    from crossval_kitti_eval import gen_tree, run_eval, read_stats
    root = str(tmp_path)
    gen_tree(root)
    our_res = run_eval(BINARY, root, 'ours')

    golden_files = sorted(f for f in os.listdir(GOLDEN_DIR)
                          if f.startswith('stats_'))
    assert len(golden_files) == 20
    our_files = sorted(f for f in os.listdir(our_res) if f.startswith('stats_'))
    assert our_files == golden_files
    for name in golden_files:
        g = read_stats(os.path.join(GOLDEN_DIR, name))
        o = read_stats(os.path.join(our_res, name))
        assert len(g) == len(o), name
        for i, (a, b) in enumerate(zip(g, o)):
            np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-9,
                                       err_msg=f'{name} row {i}')


@pytest.mark.skipif(not os.path.exists(REF_CPP),
                    reason="reference checkout not present")
def test_live_crossval_vs_reference_binary(tmp_path):
    from crossval_kitti_eval import (gen_tree, run_eval, read_stats, compare)
    root = str(tmp_path)
    gen_tree(root, seed=321)  # different seed than the goldens on purpose
    ref_bin = os.path.join(root, 'ref_bin')
    subprocess.run(
        ['g++', '-O2', '-std=c++11', '-I',
         os.path.join(REPO, 'tools', 'boost_compat'), '-o', ref_bin, REF_CPP],
        check=True)
    ref_res = run_eval(ref_bin, root, 'ref')
    our_res = run_eval(BINARY, root, 'ours')
    ref_files, failures = compare(ref_res, our_res)
    assert not failures, failures
    assert len(ref_files) == 20
