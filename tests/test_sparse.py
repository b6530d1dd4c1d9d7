"""Sparse-dataset path (the reference's SVector datasets, configs[2]):
ELL packing, projections, and index build/query over sparse inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

import rptree_tpu as rp
from rptree_tpu.ops.sparse import ell_project, ell_sq_norms, ell_to_dense
from rptree_tpu.utils import gen as rgen


def _random_svecs(n, dim, pnz, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        mask = rng.random(dim) < pnz
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            idx = np.array([rng.integers(dim)])
        out.append(rp.SVec(dim, idx, rng.normal(size=idx.size)))
    return out


def test_ell_pack_and_densify():
    svs = _random_svecs(50, 20, 0.3)
    m = rp.ell_from_svecs(svs)
    dense = np.asarray(ell_to_dense(m))
    expect = np.stack([rp.to_dense(s) for s in svs]).astype(np.float32)
    np.testing.assert_allclose(dense, expect, rtol=1e-6)


def test_ell_project_matches_dense():
    svs = _random_svecs(30, 16, 0.4, seed=1)
    m = rp.ell_from_svecs(svs)
    r = np.asarray(rgen.sample_projections(1, 1, 3, 16, 1.0))[0]  # [3, 16]
    got = np.asarray(ell_project(m, r[0]))
    expect = np.stack([rp.to_dense(s) for s in svs]) @ r[0]
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_ell_sq_norms():
    svs = _random_svecs(10, 8, 0.5, seed=2)
    m = rp.ell_from_svecs(svs)
    got = np.asarray(ell_sq_norms(m))
    expect = np.array([np.sum(rp.to_dense(s) ** 2) for s in svs])
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_sparse_index_build_query_matches_densified():
    """Build one forest from the ELL dataset and one from its densification
    with identical projections: identical permutations and knn results."""
    svs = _random_svecs(400, 32, 0.25, seed=3)
    m = rp.ell_from_svecs(svs)
    fs = rp.forest_batch(7, 5, 10, 3, 0.5, m)
    fd = rp.forest_batch(7, 5, 10, 3, 0.5, np.asarray(ell_to_dense(m)))
    np.testing.assert_array_equal(np.asarray(fs.arrays.perm),
                                  np.asarray(fd.arrays.perm))
    q = rp.to_dense(svs[0]).astype(np.float32)
    ds, is_ = map(np.asarray, fs.knn(q, 5))
    dd, id_ = map(np.asarray, fd.knn(q, 5))
    np.testing.assert_array_equal(is_, id_)
    np.testing.assert_allclose(ds, dd, rtol=1e-4, atol=1e-5)
    # nearest neighbour of a dataset point is itself at distance ~0
    assert is_[0, 0] == 0 and ds[0, 0] < 1e-3


def test_sparse_query_against_sparse_index():
    svs = _random_svecs(200, 24, 0.3, seed=4)
    m = rp.ell_from_svecs(svs)
    f = rp.forest_batch(11, 4, 10, 2, 1.0, m)
    d, i = map(np.asarray, f.knn(svs[5], 3))
    assert i[0, 0] == 5 and d[0, 0] < 1e-3
    rec = np.asarray(f.recall_with(rp.to_dense(svs[5]), 5))
    assert 0.0 <= rec[0] <= 1.0


def test_high_dim_bag_of_words_shape():
    """Sparse high-dim config (BASELINE configs[2]): dim >> nnz."""
    svs = _random_svecs(128, 5000, 0.002, seed=5)
    m = rp.ell_from_svecs(svs)
    assert m.dim == 5000 and m.k < 40
    f = rp.forest_batch(2, 4, 8, 2, 0.05, m)
    assert f.tree_size() == 128


def test_ell_brute_force_chunked_matches_dense():
    """The ELL brute force scans row chunks (the one-shot gather form
    materializes [B, n, K]); neighbour ids must match the dense scan."""
    import numpy as np

    import rptree_tpu as rt
    from rptree_tpu.benchmarks import dense_to_ell

    rng = np.random.default_rng(0)
    dense = rng.normal(size=(700, 40)).astype(np.float32)
    dense[rng.random(dense.shape) > 0.2] = 0.0
    ell = dense_to_ell(dense)
    f = rt.forest_batch(3, 4, 16, 2, 0.5, ell)
    fd = rt.forest_batch(3, 4, 16, 2, 0.5, dense)
    q = dense[:6] + 0.01
    d1, i1 = map(np.asarray, f.brute_force_knn(q, 5))
    d2, i2 = map(np.asarray, fd.brute_force_knn(q, 5))
    np.testing.assert_allclose(d1, d2, atol=2e-3)
    for b in range(6):
        assert set(i1[b].tolist()) == set(i2[b].tolist())


def test_sparse_packed_knn_matches_unpacked():
    """ELL packed serving (EllBlocks): the probe-compacted block path must
    return the same neighbours as the unpacked sparse rerank."""
    svs = _random_svecs(400, 32, 0.25, seed=7)
    m = rp.ell_from_svecs(svs)
    q = np.random.default_rng(8).normal(size=(9, 32)).astype(np.float32)
    f1 = rp.forest_batch(5, 5, 16, 3, 1.0, m)
    d1, i1 = map(np.asarray, f1.knn(q, 5, budget=8))
    f2 = rp.forest_batch(5, 5, 16, 3, 1.0, m).pack_leaves()
    assert f2._packed is not None
    d2, i2 = map(np.asarray, f2.knn(q, 5, budget=8))
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    for b in range(9):
        assert set(i1[b].tolist()) == set(i2[b].tolist())


def test_sparse_packed_serve_only():
    """pack + drop_dataset on a sparse index: packed queries keep working,
    raw-row paths raise."""
    svs = _random_svecs(300, 24, 0.3, seed=9)
    m = rp.ell_from_svecs(svs)
    q = np.random.default_rng(10).normal(size=(4, 24)).astype(np.float32)
    f = rp.forest_batch(6, 5, 16, 2, 1.0, m).pack_leaves()
    d1, i1 = map(np.asarray, f.knn(q, 3))
    f.drop_dataset()
    d2, i2 = map(np.asarray, f.knn(q, 3))
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    with pytest.raises(ValueError):
        f.brute_force_knn(q, 3)


def test_sparse_packed_knn_h():
    svs = _random_svecs(300, 24, 0.3, seed=11)
    m = rp.ell_from_svecs(svs)
    q = np.random.default_rng(12).normal(size=(4, 24)).astype(np.float32)
    f1 = rp.forest_batch(7, 5, 16, 2, 1.0, m)
    d1, _ = map(np.asarray, f1.knn_h(q, 5, budget=8))
    f2 = rp.forest_batch(7, 5, 16, 2, 1.0, m).pack_leaves()
    d2, _ = map(np.asarray, f2.knn_h(q, 5, budget=8))
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_fold_into_ell_blocks():
    """fold() into single-device sparse (ELL) blocks: dense pending rows
    pack into K (col, val) slots; rows with more nonzeros than K stay in
    the exact pending merge."""
    import numpy as np

    import rptree_tpu as rt
    from rptree_tpu.ops.sparse import EllMatrix

    rng = np.random.default_rng(91)
    n, dim, kz = 600, 32, 6
    cols = rng.integers(1, dim, size=(n, kz)).astype(np.int32)
    vals = rng.normal(size=(n, kz)).astype(np.float32)
    ell = EllMatrix(dim, cols, vals)
    f = rt.forest_batch(17, 4, 16, 2, 1.0, ell)
    f.pack_leaves(slack=8)
    # convertible rows: <= kz nonzeros
    new = np.zeros((5, dim), np.float32)
    for j in range(5):
        idx = rng.choice(np.arange(1, dim), size=kz - 1, replace=False)
        new[j, idx] = rng.normal(size=kz - 1)
    # one dense row with too many nonzeros for the blocks' K slots
    fat = rng.normal(size=(1, dim)).astype(np.float32)
    f.add(np.concatenate([new, fat]))
    f.fold()
    assert f.n_folded == 5 and f.n_pending == 1
    q = new + 1e-5
    _, ids = map(np.asarray, f.knn(q, 1, budget=f.plan.n_leaves))
    assert (ids[:, 0] >= n).all()
    # the overflow row is still found through the exact pending merge
    _, idf = map(np.asarray, f.knn(fat + 1e-5, 1, budget=4))
    assert idf[0, 0] == n + 5
    # folded-aware oracle on the sparse dataset (merged scan)
    _, bf = map(np.asarray, f.brute_force_knn(q, 1))
    assert (bf[:, 0] >= n).all()


def test_sparse_query_batched_stays_sparse():
    """EllMatrix QUERY batches serve through knn_batched without ever
    materializing [B, dim]: each chunk densifies its own strip inside
    the one-dispatch program (the reference's innerSS regime,
    Internal.hs:100-119, at batch scale).  Results equal the dense
    facade; tombstones apply; pending inserts raise (the exact merge
    needs dense rows)."""
    import rptree_tpu as rt
    from rptree_tpu.ops.sparse import EllMatrix

    rng = np.random.default_rng(0)
    n, dim, nnz = 2000, 64, 6
    cols = np.stack([np.sort(rng.choice(dim, nnz, replace=False))
                     for _ in range(n)]).astype(np.int32)
    vals = rng.normal(size=(n, nnz)).astype(np.float32)
    x = EllMatrix(dim, jnp.asarray(cols), jnp.asarray(vals))
    f = rt.forest_batch(3, 5, 32, 4, 1.0, x).pack_leaves()
    qi = rng.integers(0, n, 33)
    qe = EllMatrix(dim, jnp.asarray(cols[qi]), jnp.asarray(vals[qi]))
    d0, i0 = map(np.asarray,
                 f.knn_batched(rt.ell_to_dense(qe), 5, chunk=8))
    d1, i1 = map(np.asarray, f.knn_batched(qe, 5, chunk=8))
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, atol=1e-6)
    f.remove([int(i0[0, 0])])
    _, i2 = map(np.asarray, f.knn_batched(qe, 5, chunk=8))
    assert int(i0[0, 0]) not in set(i2[0].tolist())
    f.add(np.zeros((2, dim), np.float32))
    with pytest.raises(ValueError, match="pending"):
        f.knn_batched(qe, 5, chunk=8)


def test_sparse_query_grouped_stays_sparse():
    """EllMatrix QUERY batches also serve through knn_grouped (the
    fastest bag-of-words path): per-chunk densify inside the
    one-dispatch grouped program; parity with the dense facade across
    the checked, default-chunk, and check=False forms."""
    import rptree_tpu as rt
    from rptree_tpu.ops.sparse import EllMatrix

    rng = np.random.default_rng(0)
    n, dim, nnz = 2000, 64, 6
    cols = np.stack([np.sort(rng.choice(dim, nnz, replace=False))
                     for _ in range(n)]).astype(np.int32)
    vals = rng.normal(size=(n, nnz)).astype(np.float32)
    x = EllMatrix(dim, jnp.asarray(cols), jnp.asarray(vals))
    f = rt.forest_batch(3, 5, 32, 4, 1.0, x).pack_leaves()
    qi = rng.integers(0, n, 33)
    qe = EllMatrix(dim, jnp.asarray(cols[qi]), jnp.asarray(vals[qi]))
    d0, i0 = map(np.asarray, f.knn_grouped(rt.ell_to_dense(qe), 5,
                                           chunk=8))
    d1, i1 = map(np.asarray, f.knn_grouped(qe, 5, chunk=8))
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, atol=1e-6)
    d2, i2 = map(np.asarray, f.knn_grouped(qe, 5))  # default chunk
    np.testing.assert_array_equal(i0, i2)
    d3, i3 = map(np.asarray, f.knn_grouped(qe, 5, chunk=8, check=False))
    np.testing.assert_array_equal(i0, i3)
    assert not f.grouped_overflow()["overflow"]
    f.add(np.zeros((2, dim), np.float32))
    with pytest.raises(ValueError, match="pending"):
        f.knn_grouped(qe, 5, chunk=8)
