"""Degenerate-input stress: duplicate-heavy data (projection ties exercise
every stable-split path), tiny dimensions, k >= n, and tie-parity between
the single-device and data-parallel builders."""

import numpy as np
import pytest

import rptree_tpu as rt
from rptree_tpu.parallel.data_parallel import (
    data_mesh,
    forest_batch_data_parallel,
)
from rptree_tpu.reference import leaf_spans, ref_forest_batch


def test_all_identical_points():
    """Every projection ties: splits fall back to stable order; queries
    still return k valid ids."""
    x = np.ones((256, 4), np.float32)
    f = rt.forest_batch(1, 4, 8, 2, 1.0, x)
    assert f.tree_size() == 256
    d, i = map(np.asarray, f.knn(np.ones(4, np.float32), 5))
    assert (i[0] >= 0).all() and np.allclose(d[0], 0.0)


def test_two_value_dataset_matches_oracle():
    """Half the points tie at each value: the stable split must match the
    reference's take-nh-of-stable-sort exactly (no float noise possible --
    projections are bit-identical within groups)."""
    x = np.zeros((200, 3), np.float32)
    x[100:] = 1.0
    f = rt.forest_batch(7, 4, 10, 3, 1.0, x)
    ref = ref_forest_batch(x.astype(np.float64),
                           np.asarray(f.arrays.r, np.float64), 4, 10)
    for t in range(3):
        ours = [sorted(leaf) for leaf in f.leaves(t)]
        theirs = [sorted(ids.tolist()) for ids in leaf_spans(ref[t])]
        assert ours == theirs, t


def test_tie_heavy_data_parallel_matches_single():
    """Quantized (tie-heavy) data: the distributed equal-split quota logic
    must reproduce the single-device stable assignment bit-for-bit."""
    rng = np.random.default_rng(5)
    x = np.round(rng.normal(size=(1600, 6)) * 2) / 2  # heavy ties
    x = x.astype(np.float32)
    f1 = rt.forest_batch(9, 5, 12, 2, 1.0, x)
    f2 = forest_batch_data_parallel(9, 5, 12, 2, 1.0, x, mesh=data_mesh(8))
    for t in range(2):
        l1 = [set(b) for b in f1.leaves(t)]
        l2 = [set(b) for b in f2.leaves(t)]
        assert sum(a != b for a, b in zip(l1, l2)) == 0, t


def test_one_dimensional_data():
    x = np.sort(np.random.default_rng(0).normal(size=(300, 1)
                                                ).astype(np.float32), axis=0)
    f = rt.forest_batch(2, 5, 8, 2, 1.0, x)
    q = np.asarray([[0.0]], np.float32)
    d, i = map(np.asarray, f.knn(q, 3))
    exact = np.argsort(np.abs(x[:, 0]))[:3]
    assert set(i[0].tolist()) == set(exact.tolist())


def test_k_exceeds_candidates_and_n():
    x = np.random.default_rng(1).normal(size=(40, 5)).astype(np.float32)
    f = rt.forest_batch(1, 3, 4, 2, 1.0, x)
    d, i = map(np.asarray, f.knn(x[0], 100))
    valid = i[0] >= 0
    assert valid.sum() >= 1
    assert np.isinf(d[0][~valid]).all()
    # packed path too
    f.pack_leaves()
    d2, i2 = map(np.asarray, f.knn(x[0], 100))
    assert set(i2[0][i2[0] >= 0].tolist()) == set(i[0][valid].tolist())


def test_negative_zero_projections():
    """-0.0 vs +0.0 keys must not corrupt the distributed selection."""
    x = np.zeros((160, 2), np.float32)
    x[80:, 0] = -0.0
    x[:80, 0] = 0.0
    x[:, 1] = np.arange(160)
    f1 = rt.forest_batch(3, 3, 10, 1, 1.0, x)
    f2 = forest_batch_data_parallel(3, 3, 10, 1, 1.0, x, mesh=data_mesh(8))
    assert f1.tree_size() == f2.tree_size() == 160
    d1, i1 = map(np.asarray, f1.knn(x[:3], 4))
    d2, i2 = map(np.asarray, f2.knn(x[:3], 4))
    np.testing.assert_allclose(np.sort(d1), np.sort(d2), atol=1e-5)
