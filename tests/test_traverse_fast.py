"""Parity of the budget=1 superlevel fast path with the generic frontier
traversal.

The fast path (`ops/traverse.py:_traverse_b1`) must reproduce the generic
`_traverse_frontier(budget=1)` EXACTLY -- same leaf ids and same
candidatesH margin priorities, including the lexicographic (pri, enc)
fork tie-break -- across shallow plans (pure one-hot levels), deep plans
(superlevel blocks), and plans whose leaves terminate at different
levels.  Reference semantics: the 4-case margin table at
``src/Data/RPTree.hs:309-314`` and the running-minimum priority of
``candidatesH`` (RPTree.hs:317-346).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rptree_tpu.models.forest import _traverse_forest, forest_batch
from rptree_tpu.ops import traverse as tv


def _build(n, d, min_leaf, max_depth, seed=0, trees=2):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    f = forest_batch(seed, max_depth, min_leaf, trees, 1.0, x)
    return f, rng


CASES = [
    # (n, d, min_leaf, max_depth) -- shallow, deep, ragged-termination
    (40, 4, 4, 3),          # shallow: no superlevel blocks
    (1000, 8, 4, 12),       # deep: blocks present (n_segs > 64 levels)
    (3000, 6, 2, 20),       # deeper than _B1_MAX_DEPTH: multiple blocks
    (777, 5, 3, 9),         # odd n: ragged leaf termination
    (130, 3, 1, 30),        # min_leaf=1: maximal depth for its size
]


@pytest.mark.parametrize("n,d,ml,md", CASES)
def test_b1_matches_frontier(n, d, ml, md):
    f, rng = _build(n, d, ml, md, seed=n)
    plan, arrays = f.plan, f.arrays
    q = jnp.asarray(rng.normal(size=(33, d)).astype(np.float32))
    nl = plan.n_levels
    projq = jnp.einsum("bd,ld->bl", q, arrays.r[0, :nl, :])

    fast = tv.traverse_tree(plan, arrays.thr[0], arrays.mgl[0],
                            arrays.mgh[0], projq, 1)
    ref = tv._traverse_frontier(plan, arrays.thr[0], arrays.mgl[0],
                                arrays.mgh[0], projq, 1)
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(ref[1]))


@pytest.mark.parametrize("n,d,ml,md", CASES[:3])
def test_b1_prebuilt_tables(n, d, ml, md):
    """Passing prebuilt superlevel tables gives the identical result."""
    f, rng = _build(n, d, ml, md, seed=n + 1)
    plan, arrays = f.plan, f.arrays
    q = jnp.asarray(rng.normal(size=(17, d)).astype(np.float32))
    projq = jnp.einsum("bd,ld->bl", q, arrays.r[0, : plan.n_levels, :])
    tabs = tv.build_b1_tables(plan, arrays.thr[0], arrays.mgl[0],
                              arrays.mgh[0])
    a = tv.traverse_tree(plan, arrays.thr[0], arrays.mgl[0],
                         arrays.mgh[0], projq, 1, tabs=tabs)
    b = tv.traverse_tree(plan, arrays.thr[0], arrays.mgl[0],
                         arrays.mgh[0], projq, 1)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_b1_forest_vmap_parity():
    """The forest-level traversal (vmapped over trees) agrees between the
    fast path (budget=1) and the generic frontier path."""
    f, rng = _build(900, 6, 4, 11, seed=7, trees=3)
    plan, arrays = f.plan, f.arrays
    q = jnp.asarray(rng.normal(size=(25, 6)).astype(np.float32))
    fast_l, fast_p = _traverse_forest(plan, arrays, q, 1)
    nl = plan.n_levels
    projq = jnp.einsum("bd,tld->tbl", q, arrays.r[:, :nl, :],
                       precision=jax.lax.Precision.HIGHEST)
    ref_l, ref_p = jax.vmap(
        lambda th, lo, hi, pq: tv._traverse_frontier(plan, th, lo, hi, pq, 1)
    )(arrays.thr, arrays.mgl, arrays.mgh, projq)
    np.testing.assert_array_equal(np.asarray(fast_l), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(fast_p), np.asarray(ref_p))


def test_b1_fork_tiebreak():
    """Queries landing exactly on thresholds/margins still match (the
    lexicographic tie-break is exercised by equal fork priorities)."""
    f, _ = _build(512, 2, 2, 12, seed=3)
    plan, arrays = f.plan, f.arrays
    # construct projections that hit thresholds exactly at several levels
    thr0 = np.asarray(arrays.thr[0])
    b = 64
    projq = np.zeros((b, plan.n_levels), np.float32)
    rng = np.random.default_rng(0)
    for l in range(plan.n_levels):
        ns = plan.levels[l].n_segs
        projq[:, l] = rng.choice(thr0[l, :ns], size=b)
    projq = jnp.asarray(projq)
    fast = tv.traverse_tree(plan, arrays.thr[0], arrays.mgl[0],
                            arrays.mgh[0], projq, 1)
    ref = tv._traverse_frontier(plan, arrays.thr[0], arrays.mgl[0],
                                arrays.mgh[0], projq, 1)
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(ref[1]))


@pytest.mark.parametrize("budget", [2, 3, 4, 8])
@pytest.mark.parametrize("n,d,ml,md", [CASES[1], CASES[2], CASES[4]])
def test_fk_matches_frontier(n, d, ml, md, budget):
    """Small-budget superlevel traversal == generic frontier, exactly."""
    f, rng = _build(n, d, ml, md, seed=n + budget)
    plan, arrays = f.plan, f.arrays
    q = jnp.asarray(rng.normal(size=(29, d)).astype(np.float32))
    projq = jnp.einsum("bd,ld->bl", q, arrays.r[0, : plan.n_levels, :])
    fast = tv.traverse_tree(plan, arrays.thr[0], arrays.mgl[0],
                            arrays.mgh[0], projq, budget)
    ref = tv._traverse_frontier(plan, arrays.thr[0], arrays.mgl[0],
                                arrays.mgh[0], projq, budget)
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(ref[1]))


def test_fk_prebuilt_tables_and_ties():
    f, _ = _build(1500, 2, 2, 14, seed=11)
    plan, arrays = f.plan, f.arrays
    thr0 = np.asarray(arrays.thr[0])
    b = 48
    rng = np.random.default_rng(5)
    projq = np.zeros((b, plan.n_levels), np.float32)
    for l in range(plan.n_levels):
        ns = plan.levels[l].n_segs
        projq[:, l] = rng.choice(thr0[l, :ns], size=b)  # exact threshold hits
    projq = jnp.asarray(projq)
    tabs = tv.build_b1_tables(plan, arrays.thr[0], arrays.mgl[0],
                              arrays.mgh[0])
    for budget in (2, 4):
        a = tv.traverse_tree(plan, arrays.thr[0], arrays.mgl[0],
                             arrays.mgh[0], projq, budget, tabs=tabs)
        r = tv._traverse_frontier(plan, arrays.thr[0], arrays.mgl[0],
                                  arrays.mgh[0], projq, budget)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(r[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(r[1]))
