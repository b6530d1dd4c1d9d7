"""Build invariants, mirroring the reference test strategy (SURVEY.md
section 4): completeness (every point in exactly one leaf per tree),
balanced median splits, threshold/margin correctness against a direct
recomputation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rptree_tpu import forest_batch, tree_batch
from rptree_tpu.models.plan import make_plan
from rptree_tpu.ops.build import build_tree_arrays
from rptree_tpu.utils import gen as rgen


def test_tree_completeness():
    x = rgen.data_batch(42, 1000, rgen.normal2)
    f = tree_batch(42, max_depth=6, min_leaf=10, pnz=1.0, data=x)
    perm = np.asarray(f.arrays.perm[0])
    assert sorted(perm.tolist()) == list(range(1000))
    assert f.tree_size() == 1000


def test_forest_completeness_all_trees():
    # the reference's "all data points should appear in every tree"
    # (RPTreeSpec.hs:66-67)
    x = rgen.data_batch(7, 512, rgen.circle2d2)
    f = forest_batch(7, max_depth=5, min_leaf=10, n_trees=4, pnz=1.0, data=x)
    assert f.n_trees == 4
    for t in range(4):
        perm = np.asarray(f.arrays.perm[t])
        assert sorted(perm.tolist()) == list(range(512))


def test_thresholds_are_segment_medians():
    """Every threshold equals the median projection of its segment's points,
    and margins bracket it (Internal.hs:497-505)."""
    n = 257
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (n, 8))
    plan = make_plan(n, 4, 5)
    r = rgen.sample_projections(3, 1, 4, 8, 1.0)[0]
    arrays = build_tree_arrays(plan, x, r)

    xn = np.asarray(x)
    rn = np.asarray(r)
    perm_levels = _replay_perms(plan, xn, rn)
    for l, lp in enumerate(plan.levels):
        ids_sorted = perm_levels[l]
        proj = xn @ rn[l]
        p_sorted = proj[ids_sorted]
        thr = np.asarray(arrays.thr[l])
        mgl = np.asarray(arrays.mgl[l])
        mgh = np.asarray(arrays.mgh[l])
        for j in range(lp.n_segs):
            s, m = int(lp.seg_start[j]), int(lp.seg_size[j])
            seg_vals = np.sort(p_sorted[s : s + m])
            nh = m // 2
            assert thr[j] == pytest.approx(seg_vals[nh], rel=1e-5)
            if m >= 3:
                assert mgl[j] == pytest.approx(seg_vals[nh - 1], rel=1e-5)
                assert mgh[j] == pytest.approx(seg_vals[nh + 1], rel=1e-5)
            assert mgl[j] <= thr[j] <= mgh[j] or m < 3
            # median split balance: left half strictly below-or-equal thr
            left = p_sorted[s : s + nh]
            right = p_sorted[s + nh : s + m]
            assert left.max() <= thr[j] + 1e-6
            assert right.min() >= thr[j] - 1e-6


def _replay_perms(plan, xn, rn):
    """Recompute the permutation entering each level with numpy (stable
    sorts, same key structure as the XLA build)."""
    n = plan.n
    ids = np.arange(n)
    perms = []
    for l, lp in enumerate(plan.levels):
        perms.append(None)  # placeholder; fill below after sort
        proj = xn @ rn[l]
        p = proj[ids]
        order = np.lexsort((np.arange(n), p, lp.seg_key))  # stable by (key, p)
        ids = ids[order]
        perms[l] = ids.copy()
    return perms


def test_build_matches_numpy_replay():
    """The XLA 2-key sort pipeline must agree with a numpy lexsort replay
    (same stable semantics)."""
    n = 300
    x = np.asarray(rgen.data_batch(11, n, rgen.normal2), dtype=np.float32)
    plan = make_plan(n, 5, 8)
    r = rgen.sample_projections(11, 1, 5, 2, 1.0)[0]
    arrays = build_tree_arrays(plan, jnp.asarray(x), r)
    perm_levels = _replay_perms(plan, x, np.asarray(r))
    np.testing.assert_array_equal(np.asarray(arrays.perm), perm_levels[-1])


def test_single_leaf_tree():
    x = rgen.data_batch(5, 8, rgen.normal2)
    f = tree_batch(5, max_depth=4, min_leaf=20, pnz=1.0, data=x)
    assert f.plan.n_leaves == 1
    assert f.plan.n_levels == 0
    np.testing.assert_array_equal(
        np.sort(np.asarray(f.arrays.perm[0])), np.arange(8)
    )


def test_sparse_projection_density():
    r = rgen.sample_projections(0, 2, 3, 10000, 0.2)
    frac = float((np.asarray(r) != 0).mean())
    assert 0.15 < frac < 0.25
