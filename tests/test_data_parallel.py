"""Data-parallel build (dataset sharded over points, distributed radix
median selection) vs the single-device builder.  SURVEY.md section 7
"Cross-shard median" -- the hard part of a sharded build; exactness of the
selection and of the stable tie split is the contract."""

import numpy as np
import pytest

import rptree_tpu as rt
from rptree_tpu.parallel.data_parallel import (
    data_mesh,
    forest_batch_data_parallel,
)

N, DIM, T = 1600, 24, 3
SEED = 909


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    return rng.normal(size=(N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def single(data):
    return rt.forest_batch(SEED, 6, 12, T, 1.0, data)


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_leaf_contents_match_single_device(single, data, n_shards):
    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data,
                                   mesh=data_mesh(n_shards))
    for t in range(T):
        l1 = [set(b) for b in single.leaves(t)]
        l2 = [set(b) for b in f.leaves(t)]
        assert sum(a != b for a, b in zip(l1, l2)) == 0


def test_thresholds_margins_match_single_device(single, data):
    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data,
                                   mesh=data_mesh(8))
    t1 = np.asarray(single.arrays.thr)
    t2 = np.asarray(f.arrays.thr)
    m1 = np.asarray(single.arrays.mgl)
    m2 = np.asarray(f.arrays.mgl)
    h1 = np.asarray(single.arrays.mgh)
    h2 = np.asarray(f.arrays.mgh)
    for l, lp in enumerate(single.plan.levels):
        ns = lp.n_segs  # padded tail holds garbage in both; compare live
        np.testing.assert_allclose(t1[:, l, :ns], t2[:, l, :ns], atol=1e-6)
        np.testing.assert_allclose(m1[:, l, :ns], m2[:, l, :ns], atol=1e-6)
        np.testing.assert_allclose(h1[:, l, :ns], h2[:, l, :ns], atol=1e-6)


def test_queries_match_single_device(single, data):
    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data,
                                   mesh=data_mesh(8))
    q = data[:9] + 0.02
    d1, i1 = map(np.asarray, single.knn(q, 5))
    d2, i2 = map(np.asarray, f.knn(q, 5))
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    for b in range(9):
        assert set(i1[b].tolist()) == set(i2[b].tolist())


def test_indivisible_rows_raise(data):
    with pytest.raises(ValueError):
        forest_batch_data_parallel(SEED, 6, 12, 1, 1.0, data[:1593],
                                   mesh=data_mesh(8))


def test_single_leaf_plan(data):
    f = forest_batch_data_parallel(SEED, 0, 12, 1, 1.0, data[:800],
                                   mesh=data_mesh(8))
    assert f.tree_size() == 800
    assert f.plan.n_leaves == 1


def _addressable_max_rows(arr):
    """Largest per-device shard (rows) of a sharded array."""
    return max(s.data.shape[0] for s in arr.addressable_shards)


def test_memory_complete_end_to_end(single, data):
    """VERDICT r1 item 3: build -> pack -> serve -> recall with the
    dataset sharded throughout -- no device ever holds the full dataset
    or the full index."""
    mesh = data_mesh(8)
    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data, mesh=mesh)
    # the returned forest keeps x sharded: each device holds N/8 rows
    assert _addressable_max_rows(f.x) == N // 8
    assert _addressable_max_rows(f.sq_norms) == N // 8

    q = data[:9] + 0.02
    # sharded brute force / recall (no full materialization)
    d_bf, i_bf = map(np.asarray, f.brute_force_knn(q, 5))
    d_1, i_1 = map(np.asarray, single.brute_force_knn(q, 5))
    np.testing.assert_allclose(d_bf, d_1, atol=1e-5)
    rec = np.asarray(f.recall_with(q, 5, budget=8))
    rec1 = np.asarray(single.recall_with(q, 5, budget=8))
    np.testing.assert_allclose(rec, rec1, atol=1e-6)

    # leaf-sharded packing straight from the sharded rows: blocks are
    # sharded 1/S per device
    f.pack_leaves()
    rows, sq, ids = f._packed
    g_total = T * f.plan.n_leaves
    assert _addressable_max_rows(rows) == -(-g_total // 8)
    d2, i2 = map(np.asarray, f.knn(q, 5, budget=16))
    d1, i1 = map(np.asarray, single.knn(q, 5, budget=16))
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    for b in range(9):
        assert set(i1[b].tolist()) == set(i2[b].tolist())

    # serve-only: drop the sharded dataset, packed queries keep working
    f.drop_dataset()
    d3, i3 = map(np.asarray, f.knn(q, 5, budget=16))
    np.testing.assert_allclose(d2, d3, atol=1e-6)
    with pytest.raises(ValueError):
        f.brute_force_knn(q, 5)


def test_dp_knn_h_and_min_votes_match_single(single, data):
    mesh = data_mesh(8)
    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data, mesh=mesh)
    q = data[:9] + 0.02
    dh1, ih1 = map(np.asarray, single.knn_h(q, 5, budget=8))
    dh2, ih2 = map(np.asarray, f.knn_h(q, 5, budget=8))
    np.testing.assert_allclose(dh1, dh2, atol=1e-5)
    dv1, iv1 = map(np.asarray, single.knn(q, 5, budget=8, min_votes=2))
    dv2, iv2 = map(np.asarray, f.knn(q, 5, budget=8, min_votes=2))
    np.testing.assert_allclose(dv1, dv2, atol=1e-5)
    # min_votes on the packed leaf-sharded path too
    f.pack_leaves()
    dv3, iv3 = map(np.asarray, f.knn(q, 5, budget=8, min_votes=2))
    np.testing.assert_allclose(dv1, dv3, atol=1e-5)


def test_dp_int8_pack(single, data):
    import jax.numpy as jnp

    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data,
                                   mesh=data_mesh(8))
    f.pack_leaves(dtype=jnp.int8)
    q = data[:9] + 0.02
    d1, i1 = map(np.asarray, single.knn(q, 5, budget=16))
    d2, i2 = map(np.asarray, f.knn(q, 5, budget=16))
    overlap = np.mean([
        len(set(i1[b].tolist()) & set(i2[b].tolist())) / 5 for b in range(9)
    ])
    assert overlap >= 0.9


def test_sharded_brute_force_matches_single(data):
    from rptree_tpu.parallel import brute_force_knn_sharded

    q = data[:7] + 0.01
    d2, i2 = map(np.asarray,
                 brute_force_knn_sharded(data, q, 9, mesh=data_mesh(8)))
    import rptree_tpu as rt
    f = rt.forest_batch(1, 3, 8, 1, 1.0, data)
    d1, i1 = map(np.asarray, f.brute_force_knn(q, 9))
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    for b in range(7):
        assert set(i1[b].tolist()) == set(i2[b].tolist())


def test_dp_rebuild_stays_sharded(data):
    """rebuild() on a DataParallelForest re-runs the SHARDED build (the
    base rebuild would silently produce a single-device forest under the
    sharded query paths) and refuses indivisible sizes."""
    mesh = data_mesh(8)
    f = forest_batch_data_parallel(SEED, 6, 12, T, 1.0, data, mesh=mesh)
    f.pack_leaves()
    f.add(data[:8] + 3.0)
    with pytest.raises(NotImplementedError):
        f.fold()  # single-device only
    f.rebuild()
    assert f.tree_size() == N + 8
    # still sharded after rebuild
    assert max(sh.data.shape[0] for sh in f.x.addressable_shards) \
        == (N + 8) // 8
    d, i = map(np.asarray, f.knn(data[:1] + 3.0, 1))
    assert i[0, 0] >= 0
    f.add(data[:3])  # (N+11) % 8 != 0
    with pytest.raises(ValueError):
        f.rebuild()
