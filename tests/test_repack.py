"""pack_leaves repack semantics: same layout = idempotent no-op,
different layout = repack from the dataset (raising when folded rows
live only in the packed slack slots or the dataset was dropped).
Before this, a second pack_leaves with different arguments silently
kept the OLD layout -- the serving dtype disagreed with what the
caller asked for."""

import numpy as np
import jax.numpy as jnp
import pytest

from rptree_tpu import ell_from_svecs, forest_batch, from_list_sv, rp_tree_cfg
from rptree_tpu.parallel import (forest_batch_data_parallel,
                                 forest_batch_distributed, forest_mesh)
from rptree_tpu.parallel.data_parallel import data_mesh

SEED = 20260816
K = 5


def _mk(n=2048, dim=16, trees=4, min_leaf=32):
    rng = np.random.default_rng(SEED)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    cfg = rp_tree_cfg(min_leaf, n, dim)
    f = forest_batch(SEED, cfg.max_depth, min_leaf, trees,
                     cfg.proj_nz_density, x)
    q = (x[rng.integers(0, n, 32)]
         + 0.1 * rng.normal(size=(32, dim)).astype(np.float32))
    return f, q


def test_same_pack_is_noop():
    f, q = _mk()
    f.pack_leaves(dtype=jnp.int8)
    blocks = f._packed
    f.pack_leaves(dtype=jnp.int8)  # identical request
    assert f._packed is blocks  # untouched, no recompute


def test_repack_changes_layout_and_serves():
    f, q = _mk()
    f.pack_leaves(dtype=jnp.int8)
    assert f._packed[0].dtype == jnp.int8
    assert f._block_scale is not None
    d_ref, i_ref = map(np.asarray, f.knn(q, K))
    f.pack_leaves()  # repack to f32
    assert f._packed[0].dtype == jnp.float32
    assert f._block_scale is None
    assert f._pack_cfg["dtype"] is None
    d2, i2 = map(np.asarray, f.knn(q, K))
    # same forest, same probes: f32 blocks agree with int8 up to
    # quantization; ids overlap nearly fully on iid data
    ov = np.mean([len(set(i2[b]) & set(i_ref[b])) / K
                  for b in range(len(q))])
    assert ov >= 0.9
    # and a grouped capacity learned on the old layout is gone
    assert f._grouped_nt == {}


def test_repack_sub_block_and_back():
    f, q = _mk()
    f.pack_leaves(dtype=jnp.int8, centered=True, sub_block=2)
    assert f._sub_block == 2
    f.pack_leaves()  # back to plain f32 whole-leaf blocks
    assert f._sub_block == 1
    assert f._block_center is None
    d, i = f.knn(q, K)
    assert np.isfinite(np.asarray(d)).any()


def test_repack_refuses_after_fold():
    f, q = _mk()
    f.pack_leaves(slack=4)
    rng = np.random.default_rng(1)
    f.add(rng.normal(size=(8, 16)).astype(np.float32))
    f.fold()
    with pytest.raises(ValueError, match="rebuild"):
        f.pack_leaves(dtype=jnp.bfloat16, slack=4)
    # the SAME layout stays a no-op even with folded rows
    f.pack_leaves(slack=4)


def test_repack_refuses_serve_only():
    f, _ = _mk()
    f.pack_leaves()
    f.drop_dataset()
    with pytest.raises(ValueError, match="serve-only"):
        f.pack_leaves(dtype=jnp.bfloat16)


def test_invalid_args_never_destroy_pack():
    """Argument validation fires BEFORE the repack clears state: a bad
    call on a packed forest must leave the serving layout intact."""
    f, q = _mk()
    f.pack_leaves(dtype=jnp.int8)
    blocks = f._packed
    with pytest.raises(ValueError, match="centered"):
        f.pack_leaves(centered=True)  # centered needs int8 dtype arg
    with pytest.raises(ValueError, match="exclusive"):
        f.pack_leaves(sub_block=2, slack=4)
    with pytest.raises(ValueError, match="sub_split"):
        f.pack_leaves(sub_block=2, sub_split="nope")
    assert f._packed is blocks  # untouched by any of the failures
    d, _ = f.knn(q, K)
    assert np.isfinite(np.asarray(d)).any()


def test_rebuild_clears_grouped_capacity_cache():
    """rebuild() replaces the plan; learned grouped tile capacities are a
    function of the old block structure and would silently mask pairs
    under check=False."""
    f, q = _mk()
    f.pack_leaves()
    f.knn_grouped(q, K)
    assert f._grouped_nt
    f.add(np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32))
    f.rebuild()
    assert f._grouped_nt == {}
    d, _ = f.knn_grouped(q, K)  # re-learns cleanly on the new plan
    assert np.isfinite(np.asarray(d)).any()


def test_sub_split_irrelevant_at_sub1():
    """At sub_block=1 the sub_split mode has no effect on the layout, so
    it must not break the same-layout no-op contract (e.g. after fold,
    where a spurious repack would raise)."""
    f, _ = _mk()
    f.pack_leaves(slack=4, sub_split="proj")
    f.add(np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32))
    f.fold()
    f.pack_leaves(slack=4)  # default sub_split="kmeans": SAME layout
    assert f.n_folded > 0  # still intact


def test_repack_ell_dtype():
    rng = np.random.default_rng(SEED)
    vs = [from_list_sv(16, [(int(j), float(rng.normal()))
                            for j in sorted(rng.choice(16, size=4,
                                                       replace=False))])
          for _ in range(512)]
    x = ell_from_svecs(vs)
    f = forest_batch(SEED, 4, 16, 2, 1.0, x)
    f.pack_leaves()
    assert f._packed[0].vals.dtype == jnp.float32
    f.pack_leaves(dtype=jnp.bfloat16)
    assert f._packed[0].vals.dtype == jnp.bfloat16
    # invalid layouts raise instead of silently matching the f32 cfg
    with pytest.raises(ValueError, match="dense"):
        f.pack_leaves(dtype=jnp.int8)
    with pytest.raises(ValueError, match="dense"):
        f.pack_leaves(sub_block=2)
    assert f._packed[0].vals.dtype == jnp.bfloat16  # intact


def test_repack_distributed_mode_switch():
    f, q = _mk()
    x = np.asarray(f.x)
    fd = forest_batch_distributed(SEED, f.plan.n_levels - 1, 32, 8, 1.0,
                                  x, mesh=forest_mesh())
    fd.pack_leaves(dtype=jnp.int8, shard_by="tree")
    assert fd._packed_mode == "tree"
    fd.pack_leaves(shard_by="leaf")  # repack: new mode AND new dtype
    assert fd._packed_mode == "leaf"
    assert fd._packed[0].dtype == jnp.float32
    d, i = fd.knn(q, K)
    assert np.isfinite(np.asarray(d)).any()
    # shard_by=None (default) KEEPS the current mode on a dtype-only
    # repack -- it must not silently convert the memory-complete leaf
    # layout back to the tree layout
    fd.pack_leaves(dtype=jnp.bfloat16)
    assert fd._packed_mode == "leaf"
    assert fd._packed[0].dtype == jnp.bfloat16
    # an invalid shard mode raises BEFORE touching the serving state
    blocks = fd._packed
    with pytest.raises(ValueError, match="shard_by"):
        fd.pack_leaves(shard_by="lead")
    assert fd._packed is blocks


def test_repack_data_parallel_dtype():
    f, q = _mk()
    x = np.asarray(f.x)
    fp = forest_batch_data_parallel(SEED, f.plan.n_levels - 1, 32, 4, 1.0,
                                    x, mesh=data_mesh(8))
    fp.pack_leaves(dtype=jnp.int8)
    d1, i1 = map(np.asarray, fp.knn(q, K))
    fp.pack_leaves()  # f32
    assert fp._packed[0].dtype == jnp.float32
    d2, i2 = map(np.asarray, fp.knn(q, K))
    ov = np.mean([len(set(i2[b]) & set(i1[b])) / K
                  for b in range(len(q))])
    assert ov >= 0.9
