"""Serialisation round-trips (reference serialiseRPForest /
deserialiseRPForest, Internal.hs:185-196)."""

import numpy as np
import pytest

import rptree_tpu as rp
from rptree_tpu.utils import gen as rgen


def _forest(payloads=False, sparse=False):
    n, dim = 300, 6
    if sparse:
        svs = []
        for i in range(n):
            a, b = i % dim, (i + 3) % dim
            pairs = sorted({a: float(i + 1), b: 0.5}.items())[: 2 - (i % 2)]
            svs.append(rp.from_list_sv(dim, pairs))
        x = rp.ell_from_svecs(svs)
    else:
        x = np.asarray(rgen.data_batch(1, n, lambda k, m: rgen.dense(k, m, dim)),
                       np.float32)
    pl = [f"item-{i}" for i in range(n)] if payloads else None
    return rp.forest_batch(1, 4, 10, 3, 1.0, x, payloads=pl)


def _assert_equal_forests(a, b):
    np.testing.assert_array_equal(np.asarray(a.arrays.perm),
                                  np.asarray(b.arrays.perm))
    np.testing.assert_array_equal(np.asarray(a.arrays.r), np.asarray(b.arrays.r))
    for l in range(a.plan.n_levels):
        np.testing.assert_array_equal(np.asarray(a.arrays.thr[:, l]),
                                      np.asarray(b.arrays.thr[:, l]))
        np.testing.assert_array_equal(np.asarray(a.arrays.mgl[:, l]),
                                      np.asarray(b.arrays.mgl[:, l]))
        np.testing.assert_array_equal(np.asarray(a.arrays.mgh[:, l]),
                                      np.asarray(b.arrays.mgh[:, l]))
    q = np.ones(a.dim, np.float32) * 0.1
    da, ia = map(np.asarray, a.knn(q, 3))
    db, ib = map(np.asarray, b.knn(q, 3))
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db)


def test_save_load_roundtrip(tmp_path):
    f = _forest(payloads=True)
    p = str(tmp_path / "forest.npz")
    rp.save_forest(p, f)
    g = rp.load_forest(p)
    _assert_equal_forests(f, g)
    assert g.payloads[:3] == ["item-0", "item-1", "item-2"]
    assert g.config == f.config


def test_save_load_sparse(tmp_path):
    f = _forest(sparse=True)
    p = str(tmp_path / "sparse.npz")
    rp.save_forest(p, f)
    g = rp.load_forest(p)
    _assert_equal_forests(f, g)
    assert isinstance(g.x, rp.EllMatrix)


def test_per_tree_blobs_roundtrip_any_order():
    f = _forest()
    blobs = rp.serialise_rp_forest(f)
    assert len(blobs) == f.n_trees
    # restore in reversed order: trees re-keyed 0.. (order undefined)
    g = rp.deserialise_rp_forest(list(reversed(blobs)))
    assert g.n_trees == f.n_trees
    np.testing.assert_array_equal(
        np.sort(np.asarray(g.arrays.r).ravel()),
        np.sort(np.asarray(f.arrays.r).ravel()),
    )
    q = np.ones(f.dim, np.float32) * 0.1
    np.testing.assert_array_equal(np.asarray(g.knn(q, 3)[1]),
                                  np.asarray(f.knn(q, 3)[1]))


def test_deserialise_error_surface():
    with pytest.raises(ValueError):
        rp.deserialise_rp_forest([b"not a checkpoint"])
    with pytest.raises(ValueError):
        rp.deserialise_rp_forest([])
