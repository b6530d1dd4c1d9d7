"""Shared-row serving layout (``pack_leaves(store="shared")``): bit-parity
with the blocked layout across every single-device query path, plus the
layout's guard surface.  The shared store serves the SAME f32/bf16 rows
the blocked pack would copy, so results must be exactly equal -- any
divergence is a fetch-indexing bug, not numerics."""

import numpy as np
import jax.numpy as jnp
import pytest

from rptree_tpu import forest_batch, rp_tree_cfg
from rptree_tpu.ops.shared import SharedRows

SEED = 20260820
K = 10


def _mk(n=2048, dim=16, trees=4, min_leaf=32, centers=24):
    rng = np.random.default_rng(SEED)
    c = rng.normal(size=(centers, dim)).astype(np.float32)
    x = (c[rng.integers(0, centers, n)]
         + 0.2 * rng.normal(size=(n, dim)).astype(np.float32))
    cfg = rp_tree_cfg(min_leaf, n, dim)
    f = forest_batch(SEED, cfg.max_depth, min_leaf, trees,
                     cfg.proj_nz_density, x)
    q = (x[rng.integers(0, n, 64)]
         + 0.1 * rng.normal(size=(64, dim)).astype(np.float32))
    return f, x, q


def _run_all(f, q):
    """One result bundle across the packed query surfaces."""
    out = {}
    out["knn"] = f.knn(q, K)
    # (dedup=False is layout-blind width logic, pinned in test_query --
    # not worth a 2-layout compile pair here; suite wall is compiles)
    out["knn_votes"] = f.knn(q, K, min_votes=2)
    out["batched"] = f.knn_batched(q, K, chunk=16)
    out["grouped"] = f.knn_grouped(q, K)
    out["knn_h"] = f.knn_h(q, K)
    out["custom"] = f.knn(
        q, K, metric=lambda rows, qq: jnp.sum(jnp.abs(rows - qq), -1))
    return {k: (np.asarray(d), np.asarray(i)) for k, (d, i) in out.items()}


def test_shared_rows_bit_parity_f32():
    f, x, q = _mk()
    f.pack_leaves()
    blocked = _run_all(f, q)
    f.pack_leaves(store="shared")
    assert isinstance(f._packed[0], SharedRows)
    shared = _run_all(f, q)
    for name in blocked:
        db, ib = blocked[name]
        ds, is_ = shared[name]
        np.testing.assert_array_equal(db, ds, err_msg=name)
        np.testing.assert_array_equal(ib, is_, err_msg=name)


def test_shared_rows_bit_parity_bf16():
    f, x, q = _mk()
    f.pack_leaves(dtype=jnp.bfloat16)
    db, ib = map(np.asarray, f.knn(q, K))
    f.pack_leaves(store="shared", dtype=jnp.bfloat16)
    assert f._packed[0].rows.dtype == jnp.bfloat16
    ds, is_ = map(np.asarray, f.knn(q, K))
    np.testing.assert_array_equal(db, ds)
    np.testing.assert_array_equal(ib, is_)


def test_shared_rows_aliases_dataset():
    # f32 shared rows ARE the dataset array: no copy, 1/T the blocked
    # layout's index memory (the mode's whole point)
    f, x, q = _mk()
    f.pack_leaves(store="shared")
    assert f._packed[0].rows is f.x
    # and the id table doubles as the selection tail's id_leaf buffer
    assert f._packed[0].ids is f._packed[2]


def test_shared_rows_idempotent_and_repack():
    f, x, q = _mk()
    f.pack_leaves(store="shared")
    first = f._packed[0]
    f.pack_leaves(store="shared")  # same layout: no-op
    assert f._packed[0] is first
    f.pack_leaves()  # different layout: repack to blocks
    assert not isinstance(f._packed[0], SharedRows)
    d1, i1 = map(np.asarray, f.knn(q, K))
    f.pack_leaves(store="shared")  # and back
    d2, i2 = map(np.asarray, f.knn(q, K))
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)


def test_shared_rows_rebuild_replays_layout():
    f, x, q = _mk()
    f.pack_leaves(store="shared")
    rng = np.random.default_rng(1)
    f.add(rng.normal(size=(8, x.shape[1])).astype(np.float32))
    f.rebuild()
    assert isinstance(f._packed[0], SharedRows)
    assert f.n_points == x.shape[0] + 8


def test_shared_rows_guards():
    f, x, q = _mk()
    with pytest.raises(ValueError, match="slack"):
        f.pack_leaves(store="shared", slack=4)
    with pytest.raises(ValueError, match="sub_block"):
        f.pack_leaves(store="shared", sub_block=2)
    with pytest.raises(ValueError, match="blocked layout"):
        f.pack_leaves(store="shared", dtype=jnp.int8)
    with pytest.raises(ValueError, match="blocked layout"):
        f.pack_leaves(store="shared", dtype=jnp.int8, centered=True)
    with pytest.raises(ValueError, match="store"):
        f.pack_leaves(store="nonsense")
    # invalid calls must not have destroyed (or created) serving state
    assert f._packed is None
    f.pack_leaves(store="shared")
    with pytest.raises(ValueError, match="single-copy"):
        f.drop_dataset()
    f.add(np.zeros((4, x.shape[1]), np.float32))
    with pytest.raises(ValueError, match="shared-row"):
        f.fold()


def _mk_sharded_inputs(n=512, dim=16, trees=8, min_leaf=24):
    rng = np.random.default_rng(SEED)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    q = (x[rng.integers(0, n, 20)]
         + 0.05 * rng.normal(size=(20, dim)).astype(np.float32))
    cfg = rp_tree_cfg(min_leaf, n, dim)
    f0 = forest_batch(SEED, cfg.max_depth, min_leaf, trees,
                      cfg.proj_nz_density, x).pack_leaves()
    return x, q, cfg, f0


def test_shared_rows_tree_sharded_parity():
    """store='shared' on the tree mesh (both shard modes): equal results
    to the single-device blocked pack across knn / knn_h / grouped /
    batched (the sharded shared tables index the same rows)."""
    from rptree_tpu.parallel import forest_batch_distributed, forest_mesh

    x, q, cfg, f0 = _mk_sharded_inputs()
    d0, i0 = map(np.asarray, f0.knn(q, 5, budget=4))
    dh0, ih0 = map(np.asarray, f0.knn_h(q, 5, budget=4))
    for shard_by in ("tree", "leaf"):
        fd = forest_batch_distributed(SEED, cfg.max_depth, 24, 8,
                                      cfg.proj_nz_density, x,
                                      mesh=forest_mesh(4, 2))
        fd.pack_leaves(store="shared", shard_by=shard_by)
        assert isinstance(fd._packed[0], SharedRows)
        d, i = map(np.asarray, fd.knn(q, 5, budget=4))
        np.testing.assert_array_equal(i0, i, err_msg=shard_by)
        np.testing.assert_allclose(d0, d, atol=1e-5, err_msg=shard_by)
        dh, ih = map(np.asarray, fd.knn_h(q, 5, budget=4))
        np.testing.assert_array_equal(ih0, ih, err_msg=shard_by)
        if shard_by == "leaf":
            # grouped + one-dispatch batched forms serve the same tables
            dg, ig = map(np.asarray, fd.knn_grouped(q, 5, budget=4))
            np.testing.assert_array_equal(i0, ig)
            # grouped tiles reduce in a different order than the
            # per-pair einsum (same wobble on the blocked layout)
            np.testing.assert_allclose(d0, dg, atol=1e-4)
            db, ib = map(np.asarray,
                         fd.knn_batched(q[:12], 5, budget=4, chunk=3))
            np.testing.assert_array_equal(i0[:12], ib)
        # idempotent no-op, then repack to blocked and back
        first = fd._packed[0]
        fd.pack_leaves(store="shared", shard_by=shard_by)
        assert fd._packed[0] is first


def test_shared_rows_dp_parity():
    """The data-parallel shared-row layout (point-sharded row store +
    per-shard local member tables, all-probes serving): equal results to
    the DP blocked leaf-sharded layout and the single-device forest."""
    from rptree_tpu.parallel import (data_mesh,
                                    forest_batch_data_parallel)

    x, q, cfg, f0 = _mk_sharded_inputs()
    d0, i0 = map(np.asarray, f0.knn(q, 5, budget=4))
    fd = forest_batch_data_parallel(SEED, cfg.max_depth, 24, 8,
                                    cfg.proj_nz_density, x,
                                    mesh=data_mesh(8))
    fd.pack_leaves(store="shared")
    assert isinstance(fd._packed[0], SharedRows)
    # per-shard tables: the local occupancies of a leaf sum to its
    # global size across shards (every member owned by exactly one)
    g = fd.n_trees * fd.plan.n_leaves
    len_loc = np.asarray(fd._shared_len_loc).reshape(-1, g)
    sizes = np.tile(np.asarray(fd.plan.leaf_len), fd.n_trees)
    np.testing.assert_array_equal(len_loc.sum(axis=0), sizes)
    assert len_loc.max() <= fd._packed[0].ids.shape[-1]
    d, i = map(np.asarray, fd.knn(q, 5, budget=4))
    np.testing.assert_array_equal(i0, i)
    np.testing.assert_allclose(d0, d, atol=1e-5)
    dg, ig = map(np.asarray, fd.knn_grouped(q, 5, budget=4))
    np.testing.assert_array_equal(i0, ig)
    db, ib = map(np.asarray, fd.knn_batched(q[:12], 5, budget=4, chunk=3))
    np.testing.assert_array_equal(i0[:12], ib)
    dh0, ih0 = map(np.asarray, f0.knn_h(q, 5, budget=4))
    dh, ih = map(np.asarray, fd.knn_h(q, 5, budget=4))
    np.testing.assert_array_equal(ih0, ih)
    # vote counting is exact (all copies of an id colocate on the row's
    # owner shard; the cross-shard merge counts them globally)
    dv0, iv0 = map(np.asarray, f0.knn(q, 5, budget=4, min_votes=2))
    dv, iv = map(np.asarray, fd.knn(q, 5, budget=4, min_votes=2))
    np.testing.assert_array_equal(iv0, iv)
    # guards: the dataset IS the row store; no fold target exists
    with pytest.raises(ValueError, match="single-copy"):
        fd.drop_dataset()
    fd.add(np.zeros((8, x.shape[1]), np.float32))
    with pytest.raises(ValueError, match="shared-row"):
        fd.fold()


def test_shared_rows_dp_query_mesh():
    """DP shared rows on the (data x query) 2-D mesh: query batches
    split over the query axis, results unchanged."""
    from rptree_tpu.parallel import (data_mesh,
                                    forest_batch_data_parallel)

    x, q, cfg, f0 = _mk_sharded_inputs()
    d0, i0 = map(np.asarray, f0.knn(q, 5, budget=4))
    fq = forest_batch_data_parallel(SEED, cfg.max_depth, 24, 8,
                                    cfg.proj_nz_density, x,
                                    mesh=data_mesh(4, n_query=2))
    fq.pack_leaves(store="shared")
    d, i = map(np.asarray, fq.knn(q, 5, budget=4))
    np.testing.assert_array_equal(i0, i)
    dg, ig = map(np.asarray, fq.knn_grouped(q, 5, budget=4))
    np.testing.assert_array_equal(i0, ig)


def test_shared_rows_sharded_rebuild_replays_layout():
    """rebuild() on sharded shared-row forests replays the layout (the
    remembered pack config carries store='shared' through both sharded
    rebuild paths)."""
    from rptree_tpu.parallel import (data_mesh, forest_batch_data_parallel,
                                    forest_batch_distributed, forest_mesh)

    x, q, cfg, f0 = _mk_sharded_inputs(n=504, trees=4)
    fd = forest_batch_distributed(SEED, cfg.max_depth, 24, 4,
                                  cfg.proj_nz_density, x,
                                  mesh=forest_mesh(4, 2))
    fd.pack_leaves(store="shared", shard_by="leaf")
    fd.add(np.zeros((8, x.shape[1]), np.float32))
    fd.rebuild()
    assert isinstance(fd._packed[0], SharedRows)
    assert fd._packed_mode == "leaf" and fd.n_points == 512
    fp = forest_batch_data_parallel(SEED, cfg.max_depth, 24, 4,
                                    cfg.proj_nz_density, x,
                                    mesh=data_mesh(8))
    fp.pack_leaves(store="shared")
    fp.add(np.zeros((8, x.shape[1]), np.float32))
    fp.rebuild()
    assert isinstance(fp._packed[0], SharedRows)
    assert fp._shared_all_probes and fp._shared_len_loc is not None
    d, i = map(np.asarray, fp.knn(q, 3, budget=4))
    assert (np.asarray(i)[:, 0] >= 0).all()
