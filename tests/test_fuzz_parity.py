"""Randomized configuration sweep against the reference-semantics oracle.

The targeted tests pin individual behaviours; this sweep samples the
configuration space (n, dim, trees, depth, min_leaf, query count) and
checks the full contract on each draw: completeness, leaf-content parity,
and full-budget kNN agreement with the numpy re-execution of the
reference algorithm.  Seeded, so failures reproduce.
"""

import numpy as np
import pytest

import rptree_tpu as rt
from rptree_tpu.reference import leaf_spans, ref_forest_batch, ref_knn


@pytest.mark.parametrize("case", range(6))
def test_random_config_parity(case):
    rng = np.random.default_rng(1000 + case)
    n = int(rng.integers(50, 900))
    dim = int(rng.integers(2, 24))
    n_trees = int(rng.integers(1, 5))
    max_depth = int(rng.integers(1, 8))
    min_leaf = int(rng.integers(1, 20))
    seed = int(rng.integers(0, 2**31))
    x = rng.normal(size=(n, dim)).astype(np.float32)

    f = rt.forest_batch(seed, max_depth, min_leaf, n_trees, 1.0, x)
    # completeness: every point in exactly one leaf per tree
    for t in range(n_trees):
        ids = sorted(i for leaf in f.leaves(t) for i in leaf)
        assert ids == list(range(n)), (case, t)

    ref = ref_forest_batch(x.astype(np.float64),
                           np.asarray(f.arrays.r, np.float64),
                           max_depth, min_leaf)
    # leaf contents match the oracle (float64 oracle vs float32 engine can
    # flip ulp-tie assignments; require near-total agreement)
    for t in range(n_trees):
        ours = [sorted(leaf) for leaf in f.leaves(t)]
        theirs = [sorted(ids.tolist()) for ids in leaf_spans(ref[t])]
        mismatched = sum(a != b for a, b in zip(ours, theirs))
        assert mismatched <= max(1, len(ours) // 20), (case, t, mismatched)

    # full-budget kNN agrees with the oracle on most queries
    k = int(min(5, n))
    qs = x[rng.integers(0, n, size=4)] + 0.01 * rng.normal(size=(4, dim)
                                                           ).astype(np.float32)
    _, ids = map(np.asarray, f.knn(qs, k, budget=f.plan.n_leaves))
    agree = 0
    for b in range(4):
        _, oid = ref_knn(ref, x.astype(np.float64),
                         qs[b].astype(np.float64), k, dedup=True)
        agree += set(ids[b][ids[b] >= 0].tolist()) == set(oid.tolist())
    assert agree >= 3, (case, agree)
